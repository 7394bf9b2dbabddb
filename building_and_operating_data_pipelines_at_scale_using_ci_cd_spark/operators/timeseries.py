"""Time-series regularization: per-key resampling onto a fixed grid
with forward fill (LOCF) — the gap-filling pass every event/metric feed
needs before windowed features, joins against regular series, or chart
export. (The reference's shareprice pipeline consumes daily bars built
from irregular ticks — this operator is that standardization step as a
first-class config-callable, reference `example-shareprice.py:149`.)

Scale shape:
  - the grid is generated PER KEY from that key's own [min, max] slot
    extent (``sequence`` + ``explode``) — no global calendar broadcast,
    no cross join; rows out per key = gap span / step, a data-bounded
    fan-out;
  - last-observation-per-slot is one window (rank by tie columns inside
    (key, slot)); forward fill is one more window (``last(value,
    ignorenulls=True)`` over slots) — both partitioned BY KEY, so work
    distributes across keys and nothing ever sees a global sort;
  - all timestamp arithmetic is built-in (``date_trunc``/``sequence``),
    JVM-side, engine-portable (the DuckDB oracle mirrors it with
    GENERATE_SERIES + LAST_VALUE IGNORE NULLS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: grid steps the config surface accepts → (date_trunc unit, interval)
_STEPS = {
    "1 hour": ("hour", "INTERVAL 1 HOUR"),
    "1 day": ("day", "INTERVAL 1 DAY"),
    "1 minute": ("minute", "INTERVAL 1 MINUTE"),
}


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Regularize ``(key, ts, value)`` onto a per-key ``step`` grid:
    one row per key per slot between that key's first and last
    observation, carrying the last observed value forward across empty
    slots. ``tie_cols`` break last-in-slot ties deterministically (after
    ``ts`` itself); pass the row's unique id column when timestamps can
    collide.

    Output: ``(key, slot, value_ffill, is_observed)`` — ``is_observed``
    distinguishes real points from filled ones so downstream quality
    checks can bound the fill ratio."""
    if step not in _STEPS:
        raise ValueError(f"step must be one of {sorted(_STEPS)}")
    unit, _ = _STEPS[step]
    slot = F.date_trunc(unit, F.col(ts_col))
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tie_cols or [])]
    last_obs = (
        df.select(
            F.col(key_col).alias("__key"),
            slot.alias("__slot"),
            F.col(ts_col).alias(ts_col),
            F.col(value_col).alias("__val"),
            *[F.col(c) for c in (tie_cols or [])],
        )
        .withColumn("__rn", F.row_number().over(Window.partitionBy("__key", "__slot").orderBy(*order)))
        .filter(F.col("__rn") == 1)
        .select("__key", "__slot", "__val")
    )
    extent = last_obs.groupBy("__key").agg(
        F.min("__slot").alias("__lo"), F.max("__slot").alias("__hi")
    )
    grid = extent.select(
        "__key",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(_STEPS[step][1]))
        ).alias("__slot"),
    )
    joined = grid.join(last_obs, ["__key", "__slot"], "left")
    w_fill = (
        Window.partitionBy("__key")
        .orderBy("__slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("__key").alias(key_col),
        F.col("__slot").alias("slot"),
        F.last("__val", ignorenulls=True).over(w_fill).alias("value_ffill"),
        F.col("__val").isNotNull().alias("is_observed"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tie_cols: list[str] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Like :func:`resample_ffill` but gaps are LINEARLY INTERPOLATED
    between the surrounding observations instead of carried forward —
    the right fill for continuous signals (prices, sensor readings)
    where a step function distorts downstream features. Slots before
    the first / after the last observation fall back to nearest-value
    (there is nothing to interpolate toward).

    Same scale shape as the LOCF variant: per-key grids, two key-
    partitioned windows (last-before + first-after, both ignorenulls —
    no self-join). The blend ``prev + (next−prev)·Δt/T`` is ONE float
    expression over identical inputs on any engine (no accumulation).
    Rounding uses ``floor(x·10^d + 0.5)/10^d`` rather than the engine's
    ROUND: dyadic blends (e.g. k/128 from 2^k-hour gaps) sit EXACTLY on
    decimal half-boundaries, where Spark's BigDecimal HALF_UP and
    DuckDB's rounding disagree — the floor form is the same double
    arithmetic everywhere, so identical inputs give identical bits."""
    base = resample_ffill(df, key_col, ts_col, value_col, step=step, tie_cols=tie_cols)
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_val = F.when(F.col("is_observed"), F.col("value_ffill"))
    obs_slot = F.when(F.col("is_observed"), F.col("slot"))
    staged = base.select(
        key_col,
        "slot",
        "is_observed",
        F.last(obs_val, ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(obs_slot, ignorenulls=True).over(w_prev).alias("__pt"),
        F.first(obs_val, ignorenulls=True).over(w_next).alias("__nv"),
        F.first(obs_slot, ignorenulls=True).over(w_next).alias("__nt"),
    )
    span = F.unix_timestamp("__nt") - F.unix_timestamp("__pt")
    frac = (F.unix_timestamp("slot") - F.unix_timestamp("__pt")) / span
    blended = F.when(
        F.col("__pv").isNotNull() & F.col("__nv").isNotNull() & (span > 0),
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac,
    ).otherwise(F.coalesce("__pv", "__nv"))
    scale = float(10**decimals)
    rounded = F.floor(blended * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    return staged.select(
        key_col,
        "slot",
        rounded.alias("value_interp"),
        "is_observed",
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Irregular ticks → OHLCV bars per (key, time bucket): the
    aggregation that turns an event stream into the daily/hourly bars
    the reference's shareprice pipeline consumes
    (`example-shareprice.py:149` reads pre-built bars; this builds
    them).

    open/close are ``min_by``/``max_by`` over the COMPOSITE order
    ``struct(ts, tie)`` — a deterministic total order, so two ticks in
    the same microsecond can't make the bar engine-dependent (the
    DuckDB oracle reproduces the same pick with a FIRST_VALUE window
    over the identical order).  Values are quantized to integer
    hundredths (``floor(v*100 + 0.5)`` — the engine-wide HALF-UP
    contract) so high/low/sum are exact integers cross-engine.

    Scale shape: ONE hash-partitioned groupBy on (key, bucket); every
    accumulator (min_by/max_by/min/max/sum/count) has map-side partial
    merge, so a hot key costs a skewed reducer, never a global sort —
    and AQE's skew split handles that reducer.  No window, no self-join.
    """
    if step not in _STEPS:
        raise ValueError(f"unsupported step {step!r}; one of {sorted(_STEPS)}")
    unit, _ = _STEPS[step]
    v = F.floor(F.col(value_col) * F.lit(100) + F.lit(0.5)).cast("bigint")
    order = F.struct(F.col(ts_col), F.col(tie_col))
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(unit, F.col(ts_col)).alias("bar_ts"),
            F.col(ts_col),
            F.col(tie_col),
            v.alias("v_x100"),
        )
        .groupBy("key", "bar_ts")
        .agg(
            F.min_by("v_x100", order).alias("open_x100"),
            F.max("v_x100").alias("high_x100"),
            F.min("v_x100").alias("low_x100"),
            F.max_by("v_x100", order).alias("close_x100"),
            F.sum("v_x100").cast("bigint").alias("volume_x100"),
            F.count("*").cast("bigint").alias("n_ticks"),
        )
    )


def bar_returns(
    bars: DataFrame,
    key_col: str = "key",
    ts_col: str = "bar_ts",
) -> DataFrame:
    """Per-bar simple return and running drawdown over an OHLCV bar
    table (the :func:`ohlc_bars` output), in INTEGER BASIS POINTS.

    Integer-division sign trap: Spark's ``DIV`` truncates toward zero
    while other engines floor toward -inf, so a negative return divided
    naively diverges cross-engine.  Both agree on NON-NEGATIVE
    operands, so the return is computed as
    ``sign * (|close-open| * 10000 DIV open)`` — the magnitude is
    divided, the sign multiplied back.  Drawdown's numerator
    (runmax - close) is non-negative by construction.

    One window per key ordered by bar time (hash-partitioned on the
    key — no global sort); everything else is map arithmetic.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    diff = F.col("close_x100") - F.col("open_x100")
    ret_bp = (
        F.signum(diff).cast("bigint")
        * F.expr("CAST(abs(close_x100 - open_x100) * 10000 DIV open_x100 AS BIGINT)")
    ).cast("bigint")
    with_run = bars.withColumn("run_max_x100", F.max("close_x100").over(w))
    dd_bp = F.expr(
        "CAST((run_max_x100 - close_x100) * 10000 DIV run_max_x100 AS BIGINT)"
    )
    return with_run.select(
        F.col(key_col),
        F.col(ts_col),
        "open_x100",
        "close_x100",
        ret_bp.alias("ret_bp"),
        "run_max_x100",
        dd_bp.alias("drawdown_bp"),
    )
