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
