"""Event-sequence analytics: conversion funnels and cohort retention.

Parity note: the reference (aws-samples
building-and-operating-data-pipelines-at-scale-using-ci-cd) declares
generic SQL transformation steps; these are the two event-stream
reports every product pipeline builds on top of such a dialect,
promoted to first-class config-callable operators (peer of
sessionization, which round 4 established).

Scale shapes:
  - ``funnel``: stage k is an equi-join on the user key between stage
    k-1's per-user times and the (type-filtered, so pre-pruned) event
    stream — len(stages) hash joins, each keyed on the high-cardinality
    user id; the summary is a union of 1-row aggregates walked by a
    window over len(stages) rows (bounded state, the KMV-summary
    argument). No window over the event stream itself.
  - ``retention``: one groupBy for cohorts, one distinct for
    (user, day) activity, one equi-join on user, one groupBy on
    (cohort, offset) — all map-side-partial, all keyed on user/cohort.
    The cohort-size attach is an equi-join on cohort day (bounded by
    the calendar, not the corpus).
  - ``transition_matrix``: ONE lead() window partitioned by the user
    key (the event stream shuffles once, on its natural high-cardinality
    key — never a global sort) + one groupBy on the (from, to) pair;
    the row-probability attach is a window over the pair table, which
    is bounded by |event types|² regardless of corpus size.
  - ``linear_fit``: one aggregation pass (map-side partial) to per-key
    integer moments after a 1-row global-min rebase; the slope quotient
    is pure expression arithmetic over the |keys|-row aggregate.

Every output is integer (counts and ``*_pct_x10000`` basis points via
integer DIV) so results are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage k if they have a
    ``stages[k]`` event STRICTLY AFTER their stage-k-1 time (earliest
    qualifying event wins, so the per-user stage time is deterministic).
    Returns one row per stage: ``(stage_idx, stage, n_users,
    conv_pct_x10000)`` where conversion is basis points of the
    stage-0 population, integer-DIV'd."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("ty"),
    )
    cur = (
        ev.filter(F.col("ty") == stages[0])
        .groupBy("u")
        .agg(F.min("t").alias("st"))
    )
    summaries = [
        cur.groupBy().count().select(
            F.lit(0).alias("stage_idx"),
            F.lit(stages[0]).alias("stage"),
            F.col("count").cast("bigint").alias("n_users"),
        )
    ]
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            ev.filter(F.col("ty") == stage)
            .join(cur, "u")
            .filter(F.col("t") > F.col("st"))
            .groupBy("u")
            .agg(F.min("t").alias("st"))
        )
        summaries.append(
            nxt.groupBy().count().select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col("count").cast("bigint").alias("n_users"),
            )
        )
        cur = nxt
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    # len(stages)-row window: attach the stage-0 population
    w = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.select(
        "stage_idx",
        "stage",
        "n_users",
        F.expr("CAST(n_users * 10000 AS BIGINT)")
        .alias("__num"),
        F.first("n_users").over(w).alias("__base"),
    ).select(
        "stage_idx",
        "stage",
        "n_users",
        F.expr("CAST(__num DIV GREATEST(__base, 1) AS BIGINT)").alias(
            "conv_pct_x10000"
        ),
    )


def retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int = 7,
) -> DataFrame:
    """Daily cohort retention: cohort = a user's first active day;
    a user is retained at offset d if active on cohort_day + d.
    Returns ``(cohort_day, day_offset, n_active, n_cohort,
    retained_pct_x10000)`` for offsets 0..max_offset — integers only,
    basis points by integer DIV."""
    if max_offset < 0:
        raise ValueError("max_offset must be >= 0")
    ev = df.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    )
    cohorts = ev.groupBy("u").agg(F.min("d").alias("cohort_day"))
    active = ev.distinct()
    joined = active.join(cohorts, "u").select(
        "u", "cohort_day", F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset")
    )
    counts = (
        joined.filter(
            (F.col("day_offset") >= 0) & (F.col("day_offset") <= max_offset)
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    sizes = (
        cohorts.groupBy("cohort_day")
        .agg(F.count("*").cast("bigint").alias("n_cohort"))
    )
    return counts.join(sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        F.expr("CAST(n_active * 10000 DIV n_cohort AS BIGINT)").alias(
            "retained_pct_x10000"
        ),
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tie_col: str | None = None,
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: for every consecutive event pair within a user's
    timeline, count ``from_event -> to_event`` and express the row
    probability in basis points (``prob_x10000 = cnt * 10000 DIV
    from_total``, integer DIV so the matrix is bit-identical
    cross-engine — the funnel/retention contract).

    ``tie_col`` breaks same-timestamp ordering deterministically
    (defaults to the type column itself so the sequence is total even
    on tied clocks). ``min_count`` drops transitions rarer than the
    floor AFTER the row totals are computed, so probabilities still sum
    over the full row.

    Returns ``(from_event, to_event, cnt, from_total, prob_x10000)``.
    """
    tie = tie_col or type_col
    seq = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tie))
    pairs = (
        df.select(
            F.col(type_col).alias("from_event"),
            F.lead(F.col(type_col)).over(seq).alias("to_event"),
        )
        .filter(F.col("to_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # |types|²-row table: the row-total window is bounded state
    row = Window.partitionBy("from_event").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        pairs.withColumn("from_total", F.sum("cnt").over(row).cast("bigint"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
        .select(
            "from_event",
            "to_event",
            "cnt",
            "from_total",
            F.expr("CAST(cnt * 10000 DIV from_total AS BIGINT)").alias(
                "prob_x10000"
            ),
        )
    )


def linear_fit(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Per-key ordinary-least-squares TREND: the slope of y over x in
    integer ``1/scale`` units, from the closed-form normal equation

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    computed entirely in int64. Both moments are translation-invariant
    in x, so x is re-based against the GLOBAL minimum first (one 1-row
    broadcast attach) — that bounds every product far below 2^63 for
    month-scale hour offsets and cent-scale values, where raw epoch
    units would overflow. The quotient uses the two-step split
    ``q·scale + (r·scale DIV den)`` (q, r = divmod(|num|, den)) with the
    sign multiplied back — exact floor on any engine without ever
    forming num·scale (the bar_returns DIV-sign contract, extended to
    keep the intermediate in range). Keys with a degenerate x spread
    (den = 0) emit NULL.

    Inputs must already be integer units (e.g. hours and cents); one
    aggregation + one tiny groupBy — map-side partial, no window.
    Returns ``(key, n_points, slope_x{scale})``.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    x0 = base.agg(F.min("x").alias("x0"))  # 1-row scalar attach
    s = (
        base.crossJoin(F.broadcast(x0))
        .select("key", (F.col("x") - F.col("x0")).alias("xr"), "y")
        .groupBy("key")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("xr").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("xr") * F.col("xr")).cast("bigint").alias("sxx"),
            F.sum(F.col("xr") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    q = F.expr("ABS(n * sxy - sx * sy) DIV (n * sxx - sx * sx)")
    rem_scaled = F.expr(
        f"(ABS(n * sxy - sx * sy) % (n * sxx - sx * sx)) * {int(scale)} "
        f"DIV (n * sxx - sx * sx)"
    )
    slope = sgn * (q * F.lit(int(scale)) + rem_scaled)
    return s.select(
        F.col("key").alias(key_col),
        F.col("n").alias("n_points"),
        F.when(den != 0, slope).cast("bigint").alias(f"slope_x{int(scale)}"),
    )


def ab_test(
    df: DataFrame,
    arm_col: str,
    converted_col: str,
    z2_x10000: int = 38416,
    arm_a=None,
    arm_b=None,
) -> DataFrame:
    """Two-proportion A/B significance test with an EXACT decision: one
    row per arm pair — (n, x) per arm, lift in basis points, and the
    pooled two-proportion z-test decided by cross-multiplication,

        z² = (x_a·n_b − x_b·n_a)² · (n_a + n_b)
             ───────────────────────────────────────────
             n_a·n_b·(x_a + x_b)·(n_a + n_b − x_a − x_b)

        significant  ⇔  num · 10000 ≥ z2_x10000 · den

    evaluated in DECIMAL(38,0) products of int64 counts, so the boolean
    is exact on any engine — no sqrt, no float, no rounding contract
    (default threshold 3.8416 = z²₀.₀₅). Degenerate pools (all or no
    conversions) emit significant = false. ``converted_col`` is 0/1.
    Pass ``arm_a``/``arm_b`` to name the compared arms explicitly;
    by default the minimum and maximum arm values are compared (other
    arm values, if any, take no part).

    One aggregation pass to a 2-row table, then pure expression
    arithmetic — the corpus never shuffles twice.
    """
    if arm_a is not None and arm_b is not None:
        df = df.filter(F.col(arm_col).isin(arm_a, arm_b))
    arms = (
        df.groupBy(F.col(arm_col).alias("arm"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col(converted_col).cast("bigint")).cast("bigint").alias("x"),
        )
    )
    a = arms.orderBy("arm").limit(1).select(
        F.col("arm").alias("arm_a"), F.col("n").alias("n_a"), F.col("x").alias("x_a")
    )
    b = arms.orderBy(F.col("arm").desc()).limit(1).select(
        F.col("arm").alias("arm_b"), F.col("n").alias("n_b"), F.col("x").alias("x_b")
    )
    pair = a.crossJoin(F.broadcast(b))  # two 1-row sides
    dec = "CAST({} AS DECIMAL(38, 0))"
    num = (
        f"POWER_DIFF * POWER_DIFF * ({dec.format('n_a')} + {dec.format('n_b')})"
    ).replace("POWER_DIFF", f"({dec.format('x_a')} * {dec.format('n_b')} - "
                            f"{dec.format('x_b')} * {dec.format('n_a')})")
    den = (
        f"{dec.format('n_a')} * {dec.format('n_b')} * "
        f"({dec.format('x_a')} + {dec.format('x_b')}) * "
        f"({dec.format('n_a')} + {dec.format('n_b')} - "
        f"{dec.format('x_a')} - {dec.format('x_b')})"
    )
    return pair.filter(F.col("arm_a") != F.col("arm_b")).select(
        "arm_a", "n_a", "x_a", "arm_b", "n_b", "x_b",
        F.expr("CAST(x_a * 10000 DIV n_a AS BIGINT)").alias("rate_a_bp"),
        F.expr("CAST(x_b * 10000 DIV n_b AS BIGINT)").alias("rate_b_bp"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN FALSE "
            f"ELSE {num} * 10000 >= {z2_x10000} * ({den}) END"
        ).alias("significant"),
    )


def rank_sum_test(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    z2_x10000: int = 38416,
) -> DataFrame:
    """Mann–Whitney U rank-sum test between two arms of an integer
    metric, with an EXACT significance decision. The U statistic is
    computed from per-value counts (never a row-level rank window):

        U₂ = 2U = Σ_v ca_v · (2·cumB(<v) + cb_v)

    (ties contribute half each, hence the doubled units), and the
    normal approximation with the FULL tie correction is decided by
    cross-multiplication —

        z² = 3·(U₂ − n₁n₂)²·n(n−1) / (n₁n₂·(n(n²−1) − Σ(t³−t)))

        significant ⇔ 3·(U₂−n₁n₂)²·n(n−1)·10⁴ ≥ z2_x10000·n₁n₂·(…)

    — in DECIMAL(38,0) products of int64 terms (DuckDB mirrors in
    HUGEINT), so the boolean is exact: no sqrt, no float (the ab_test
    contract, extended with tie-corrected variance). Degenerate inputs
    (one arm empty, or every value tied) emit not-significant.

    Plan: one groupBy to the V-row per-value count table (V = distinct
    metric values — quantize/bucket the metric upstream so V stays
    bounded; the cumulative window then sorts V rows, not the corpus),
    one window, one 1-row aggregate. Returns ``(arm_a, n_a, arm_b,
    n_b, u2, n_values, significant)``.
    """
    per_v = (
        df.filter(F.col(arm_col).isin(arm_a, arm_b))
        .groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(
            F.sum((F.col(arm_col) == F.lit(arm_a)).cast("bigint")).alias("ca"),
            F.sum((F.col(arm_col) == F.lit(arm_b)).cast("bigint")).alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.withColumn(
        "cumb", F.coalesce(F.sum("cb").over(w), F.lit(0)).cast("bigint")
    )
    s = cum.agg(
        F.sum(F.col("ca") * (F.lit(2) * F.col("cumb") + F.col("cb")))
        .cast("bigint")
        .alias("u2"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(
            (F.col("ca") + F.col("cb")) * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        )
        .cast("bigint")
        .alias("t3"),
        F.count("*").cast("bigint").alias("n_values"),
    )
    d = "CAST({} AS DECIMAL(38, 0))"
    n = f"({d.format('n_a')} + {d.format('n_b')})"
    diff = f"({d.format('u2')} - {d.format('n_a')} * {d.format('n_b')})"
    lhs = f"3 * {diff} * {diff} * {n} * ({n} - 1) * 10000"
    tie_term = f"({n} * ({n} * {n} - 1) - {d.format('t3')})"
    rhs = f"{z2_x10000} * {d.format('n_a')} * {d.format('n_b')} * {tie_term}"
    return s.select(
        F.lit(arm_a).alias("arm_a"),
        "n_a",
        F.lit(arm_b).alias("arm_b"),
        "n_b",
        "u2",
        F.col("n_values").cast("int").alias("n_values"),
        F.expr(
            f"CASE WHEN n_a = 0 OR n_b = 0 OR {tie_term} = 0 THEN FALSE "
            f"ELSE {lhs} >= {rhs} END"
        ).alias("significant"),
    )
