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
    DECIMAL(38,0) moments after a 1-row global-min rebase; the slope
    quotient is pure expression arithmetic over the |keys|-row
    aggregate.
  - ``ab_test`` / ``rank_sum_test``: one corpus scan each to a tiny
    count table; the exact significance boolean is decided by the
    magnitude-reduced cross-multiplication in ``_cross_mult_ge`` so
    DECIMAL(38,0) covers ~4·10⁹ (A/B) / ~1.9·10⁸ (rank-sum) rows per
    comparison, with a NULL lane — never a wrong boolean — past it.

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
    # Each stage's per-user table is referenced by BOTH the next stage's
    # join and its own count — and stage k's plan contains stages
    # 0..k-1, so without materialization a 4-stage funnel scanned the
    # event table ~20× (measured plan). localCheckpoint each small
    # per-user stage table once (guide §2.4); the event scan then runs
    # exactly len(stages) times, once per stage's type-pruned filter.
    cur = (
        ev.filter(F.col("ty") == stages[0])
        .groupBy("u")
        .agg(F.min("t").alias("st"))
        .localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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

    computed in DECIMAL(38,0). Both moments are translation-invariant
    in x, so x is re-based against the GLOBAL minimum first (one 1-row
    broadcast attach) — that keeps the per-row products in int64 for
    month-scale hour offsets and cent-scale values, where raw epoch
    units would overflow — and the per-key sums and the cross products
    ``n·Σxy``, ``Σx·Σy`` are widened to DECIMAL(38,0) BEFORE
    multiplying: in int64 those grow as n² per key and would silently
    wrap (a wrong slope, not an error) once a key holds ~10⁵–10⁶ rows;
    in decimal a genuine >38-digit overflow NULLs the slope instead.
    The quotient uses the two-step split ``q·scale + (r·scale DIV
    den)`` (q, r = divmod(|num|, den)) with the sign multiplied back —
    exact floor on any engine without ever forming num·scale (the
    bar_returns DIV-sign contract, extended to keep the intermediate
    in range). Keys with a degenerate x spread (den = 0) emit NULL.

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
            F.sum(F.col("xr").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("xr") * F.col("xr")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("xr") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        )
    )
    dnum = (
        "(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy)"
    )
    dden = "(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx)"
    num = F.expr(dnum)
    den = F.expr(dden)
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    q = F.expr(f"ABS({dnum}) DIV {dden}")
    rem_scaled = F.expr(
        f"CAST((ABS({dnum}) % {dden}) * {int(scale)} DIV {dden} AS BIGINT)"
    )
    slope = sgn * (q * F.lit(int(scale)) + rem_scaled)
    return s.select(
        F.col("key").alias(key_col),
        F.col("n").alias("n_points"),
        F.when(den != 0, slope).cast("bigint").alias(f"slope_x{int(scale)}"),
    )


def _cross_mult_ge(a_sq: str, m: str, b: str, r1: str) -> str:
    """SQL boolean for ``a_sq · b  >=  m · r1`` without ever forming
    either full product — the shared magnitude-reduction lemma behind
    both exact significance tests.

    With ``q = a_sq DIV m`` and ``r = a_sq % m`` (so ``a_sq = q·m + r``,
    ``0 <= r < m``), the comparison divides both sides by ``m``:

        a_sq·b >= m·r1  ⇔  (q·b − r1)·m >= −r·b
                        ⇔  LEAST(r1 − q·b, b) · m  <=  r·b

    (if ``q·b >= r1`` the clamped factor is <= 0 and the clause is
    trivially true; if ``r1 − q·b >= b`` then the factor clamps to
    ``b`` and ``b·m > r·b`` is trivially false since r < m; in between
    the comparison is exact). The two-sided clamp — LEAST against ``b``
    above, GREATEST against ``-1`` below — bounds the multiplied factor
    in ``[-1, b]`` so every operand stays within ``max(r1, b·m, r·b)``,
    inside DECIMAL(38,0) for inputs where the naive ``a_sq·b`` product
    would need ~10⁴⁰ (without the GREATEST, a dominant ``q·b`` would
    overflow the product and NULL a decision that must be TRUE). All
    four inputs must be non-negative integer SQL expressions with
    ``m >= 1``.

    The quotient is formed as ``(a_sq − a_sq % m) / m`` in decimal —
    NOT ``DIV``, whose LongType result silently overflows past 2⁶³-1
    (and the null then VANISHES inside LEAST/GREATEST, which skip
    nulls, flipping a TRUE decision to FALSE — caught by the
    randomized lemma test). The decimal division is exact while
    ``q < 10³²`` (the (38,6) result type's integer digits); both call
    sites bound ``q <= m <= ~4·10¹⁸``, far inside.
    """
    q = f"CAST((({a_sq}) - (({a_sq}) % ({m}))) / ({m}) AS DECIMAL(38, 0))"
    r = f"({a_sq}) % ({m})"
    return (
        f"(GREATEST(LEAST(({r1}) - ({q}) * ({b}), ({b})), -1) * ({m}) "
        f"<= ({r}) * ({b}))"
    )


#: past this many total rows per comparison the DECIMAL(38,0)
#: cross-multiplication can overflow (→ NULL, not a wrong answer);
#: both tests emit NULL significance beyond it instead of guessing.
AB_TEST_MAX_N = 4_000_000_000
RANK_SUM_MAX_N = 100_000_000


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

        significant  ⇔  D² · (N·10⁴)  ≥  z2_x10000 · n_a·n_b·p·q

    with D = x_a·n_b − x_b·n_a, decided via :func:`_cross_mult_ge`
    (divide both sides by M = n_a·n_b before comparing), so every
    intermediate stays within DECIMAL(38,0) up to N = n_a + n_b ≈ 4·10⁹
    total rows — the naive product overflows (silently NULLs in
    non-ANSI Spark) past ~10⁷ rows per arm. Beyond
    :data:`AB_TEST_MAX_N` the decision is emitted as NULL (D² itself
    can overflow there), never a wrong boolean; DuckDB mirrors in
    HUGEINT. No sqrt, no float, no rounding contract (default
    threshold 3.8416 = z²₀.₀₅). Degenerate pools (all or no
    conversions) emit significant = false. ``converted_col`` is 0/1.
    Pass ``arm_a``/``arm_b`` to name the compared arms explicitly;
    by default the minimum and maximum arm values are compared (other
    arm values, if any, take no part).

    Plan: ONE scan of the input — groupBy(arm) with map-side partials
    to the tiny arm table, then a single 1-row aggregate picks both
    compared arms with min/max + min_by/max_by structs (no
    orderBy/limit twin subplans, which would each re-scan the corpus);
    the decision is pure expression arithmetic on that row.
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
    pair = arms.agg(
        F.min("arm").alias("arm_a"),
        F.min_by(F.struct("n", "x"), "arm").alias("__sa"),
        F.max("arm").alias("arm_b"),
        F.max_by(F.struct("n", "x"), "arm").alias("__sb"),
    ).select(
        "arm_a",
        F.col("__sa.n").alias("n_a"),
        F.col("__sa.x").alias("x_a"),
        "arm_b",
        F.col("__sb.n").alias("n_b"),
        F.col("__sb.x").alias("x_b"),
    )
    dec = "CAST({} AS DECIMAL(38, 0))"
    diff = (
        f"({dec.format('x_a')} * {dec.format('n_b')} - "
        f"{dec.format('x_b')} * {dec.format('n_a')})"
    )
    a_sq = f"({diff} * {diff})"
    m = f"({dec.format('n_a')} * {dec.format('n_b')})"
    b = f"(({dec.format('n_a')} + {dec.format('n_b')}) * 10000)"
    r1 = (
        f"({z2_x10000} * ({dec.format('x_a')} + {dec.format('x_b')}) * "
        f"({dec.format('n_a')} + {dec.format('n_b')} - "
        f"{dec.format('x_a')} - {dec.format('x_b')}))"
    )
    return pair.filter(F.col("arm_a") != F.col("arm_b")).select(
        "arm_a", "n_a", "x_a", "arm_b", "n_b", "x_b",
        F.expr("CAST(x_a * 10000 DIV n_a AS BIGINT)").alias("rate_a_bp"),
        F.expr("CAST(x_b * 10000 DIV n_b AS BIGINT)").alias("rate_b_bp"),
        F.expr(
            f"CASE WHEN n_a + n_b > {AB_TEST_MAX_N} THEN CAST(NULL AS BOOLEAN) "
            f"WHEN {m} * ({dec.format('x_a')} + {dec.format('x_b')}) * "
            f"({dec.format('n_a')} + {dec.format('n_b')} - "
            f"{dec.format('x_a')} - {dec.format('x_b')}) = 0 THEN FALSE "
            f"ELSE {_cross_mult_ge(a_sq, m, b, r1)} END"
        ).alias("significant"),
    )


def rank_sum_test(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
    z2_x10000: int = 38416,
    max_values: int | None = 1_000_000,
    n_buckets_bits: int | None = None,
) -> DataFrame:
    """Mann–Whitney U rank-sum test between two arms of an integer
    metric, with an EXACT significance decision. The U statistic is
    computed from per-value counts (never a row-level rank window):

        U₂ = 2U = Σ_v ca_v · (2·cumB(<v) + cb_v)

    (ties contribute half each, hence the doubled units), and the
    normal approximation with the FULL tie correction is decided by
    cross-multiplication —

        z² = 3·(U₂ − n₁n₂)²·n(n−1) / (n₁n₂·(n(n²−1) − Σ(t³−t)))

    rewritten as ``D²·B ≥ M·R1`` with D = U₂−n₁n₂, M = n₁n₂,
    B = 3·n(n−1)·10⁴, R1 = z2_x10000·tie_term and decided via
    :func:`_cross_mult_ge` (divide both sides by M before comparing).
    The tie cubes and every product run in DECIMAL(38,0) — int64 would
    silently wrap Σ(t³−t) past ~2·10⁶ rows, and the naive five-way
    product overflows past ~6·10⁵ — so the boolean is exact up to
    n ≈ 1.9·10⁸ total rows; beyond :data:`RANK_SUM_MAX_N` it is emitted
    as NULL, never a wrong answer (DuckDB mirrors in HUGEINT). No sqrt,
    no float (the ab_test contract, extended with tie-corrected
    variance). Degenerate inputs (one arm empty, or every value tied)
    emit not-significant.

    Plan: one groupBy to the V-row per-value count table, one
    cumulative window over V rows, one 1-row aggregate. The window is
    a single-partition sort of V rows, so V MUST stay bounded — and
    that contract is now enforced, two ways:

    - ``max_values`` (default 10⁶): an ``approx_count_distinct``
      pre-check (map-side-partial, one cheap extra pass, no shuffle of
      data rows) raises ``ValueError`` before planting a sort that
      would never finish on an unquantized metric. ``None`` skips the
      pass for callers that already guarantee bounded V.
    - ``n_buckets_bits``: opt-in sign-preserving log-bucket
      quantization (the ``logbucket_index`` grid, mirrored for
      negatives) applied BEFORE grouping — V drops to ≤ 2·63·2^bits+1
      regardless of the metric, the pre-check is skipped, and the test
      becomes approximate exactly to the bucket resolution (relative
      width 2^-bits), which is what a drift detector wants.

    Returns ``(arm_a, n_a, arm_b, n_b, u2, n_values, significant)``.
    """
    vals = df.filter(F.col(arm_col).isin(arm_a, arm_b)).select(
        F.col(arm_col).alias("__arm"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    if n_buckets_bits is not None:
        from ..functions.sketches import logbucket_index

        av = F.abs(F.col("v"))
        signed_bucket = (
            F.when(F.col("v") > 0, logbucket_index(av, n_buckets_bits) + F.lit(1))
            .when(F.col("v") < 0, -(logbucket_index(av, n_buckets_bits) + F.lit(1)))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        vals = vals.select("__arm", signed_bucket.alias("v"))
    elif max_values is not None:
        from .guards import construction_scalar

        approx_v = construction_scalar(
            vals.agg(F.approx_count_distinct("v").alias("adv")),
            op_name="rank_sum_test",
            purpose="metric-cardinality guard for the rank window",
        )["adv"]
        # approx_count_distinct is ±~2.3%; 1.1 head-room keeps the
        # guard from false-failing right at the limit
        if approx_v > max_values * 1.1:
            raise ValueError(
                f"rank_sum_test: ~{approx_v} distinct values of "
                f"{value_col!r} exceed max_values={max_values}; the "
                "cumulative rank window would single-task-sort that many "
                "rows. Quantize the metric (n_buckets_bits=...) or raise "
                "max_values explicitly."
            )
    per_v = vals.groupBy("v").agg(
        F.sum((F.col("__arm") == F.lit(arm_a)).cast("bigint")).alias("ca"),
        F.sum((F.col("__arm") == F.lit(arm_b)).cast("bigint")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.withColumn(
        "cumb", F.coalesce(F.sum("cb").over(w), F.lit(0)).cast("bigint")
    )
    dec38 = "CAST({} AS DECIMAL(38, 0))"
    t = f"({dec38.format('ca')} + {dec38.format('cb')})"
    s = cum.agg(
        F.sum(F.col("ca") * (F.lit(2) * F.col("cumb") + F.col("cb")))
        .cast("bigint")
        .alias("u2"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum(F.expr(f"{t} * {t} * {t} - {t}"))
        .cast("decimal(38,0)")
        .alias("t3"),
        F.count("*").cast("bigint").alias("n_values"),
    )
    d = "CAST({} AS DECIMAL(38, 0))"
    n = f"({d.format('n_a')} + {d.format('n_b')})"
    m = f"({d.format('n_a')} * {d.format('n_b')})"
    diff = f"({d.format('u2')} - {d.format('n_a')} * {d.format('n_b')})"
    a_sq = f"({diff} * {diff})"
    b = f"(3 * {n} * ({n} - 1) * 10000)"
    tie_term = f"({n} * ({n} * {n} - 1) - t3)"
    r1 = f"({z2_x10000} * {tie_term})"
    return s.select(
        F.lit(arm_a).alias("arm_a"),
        "n_a",
        F.lit(arm_b).alias("arm_b"),
        "n_b",
        "u2",
        F.col("n_values").cast("int").alias("n_values"),
        F.expr(
            f"CASE WHEN n_a + n_b > {RANK_SUM_MAX_N} THEN CAST(NULL AS BOOLEAN) "
            f"WHEN n_a = 0 OR n_b = 0 OR {tie_term} = 0 THEN FALSE "
            f"ELSE {_cross_mult_ge(a_sq, m, b, r1)} END"
        ).alias("significant"),
    )
