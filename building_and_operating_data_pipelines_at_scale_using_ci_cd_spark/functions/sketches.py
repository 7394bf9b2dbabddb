"""Mergeable frequency sketches as DataFrames (count-min).

Spark ships sketch AGGREGATES (``hll_sketch_agg`` — already used by the
HLL rollup entry — and ``count_min_sketch``), but the binary blob
``count_min_sketch`` returns is engine-private: no SQL function probes
it for an estimate, and no other engine can reproduce its bits, so it
can't carry a strict cross-engine oracle. This module materializes the
count-min sketch AS A DATAFRAME of ``(depth_row, bucket, cnt)``
counters built from portable md5 hashing instead:

  - bit-identical in any engine with md5 (a DuckDB oracle rebuilds the
    exact sketch, so estimates are strict value-hash-checkable — no
    error-bound-boolean fallback needed);
  - mergeable by construction: partial sketches union + sum into the
    whole-corpus sketch (``cms_merge``), the same partial-maintenance
    shape the HLL rollup uses — keep per-day partials at 100 TB and
    answer any coarser window without rescanning raw events;
  - bounded state: ``depth x width`` counter rows regardless of input
    cardinality, with Spark's map-side partial aggregation collapsing
    each input partition to at most that many rows before the shuffle.

Classic CMS guarantees hold row-wise (counters only over-count):
``estimate >= true`` always, and ``estimate <= true + eps*N`` with
probability ``1 - (1/2)^depth`` for ``width = ceil(e/eps)``.

Reference parity note: the reference repo (aws-samples
building-and-operating-data-pipelines-at-scale-using-ci-cd) exposes no
sketch surface — this is a north-star extension operator (SURVEY
§2.10), peer of the HLL rollup.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_bucket", "cms_build", "cms_merge", "cms_estimate", "cms_frequency"]


def cms_bucket(item: Column, row: Column, width: int) -> Column:
    """Counter index for ``item`` under depth-row ``row``: the portable
    md5 32-bit hash (``functions.text.portable_hash`` family, seeded by
    the row index) reduced mod ``width``. Pure Column expression —
    reproducible bit-for-bit by any engine with md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(item.cast("string"), F.lit("#cms"), row.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(width)).alias("bucket")


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` with one counter row per
    (depth-row, bucket) pair — at most ``depth * width`` rows total.

    The explode is ``depth`` integer rows per input row (cheap,
    map-side), and the groupBy's partial aggregation means each input
    partition ships at most ``depth * width`` pre-summed rows into the
    single bounded-size shuffle — the plan is insensitive to input
    cardinality, which is the entire point of a sketch at 100 TB."""
    row = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    exploded = df.select(row, F.col(item_col).alias("__item"), w.alias("__w"))
    return (
        exploded.select("row", cms_bucket(F.col("__item"), F.col("row"), width), "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches (same depth/width) by counter-wise sum —
    CMS addition is commutative, so partials built per shard / per day /
    per micro-batch combine in any order into exactly the sketch of the
    unioned input (asserted exactly in tests/test_sketches.py)."""
    unioned = reduce(DataFrame.unionByName, sketches)
    return unioned.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int, width: int
) -> DataFrame:
    """Point-frequency estimates for ``probes[item_col]``: hash each
    probe into its ``depth`` counters, join the sketch on (row, bucket),
    and take the row-wise MIN — the classic CMS estimator. The join's
    build side is the sketch itself (≤ depth×width rows), so Spark
    broadcasts it and the probe side never shuffles."""
    probed = probes.select(F.col(item_col).alias("__probe")).distinct()
    exploded = probed.select(
        "__probe", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    keyed = exploded.select(
        "__probe", "row", cms_bucket(F.col("__probe"), F.col("row"), width)
    )
    est = (
        keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("__probe")
        # a probe item absent from the stream can land on never-touched
        # counters: missing counter = 0, hence coalesce before the min
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    return est.withColumnRenamed("__probe", item_col)


def cms_frequency(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """One-call convenience (and the ``cmsFrequency`` config step):
    sketch ``df[item_col]`` then estimate every distinct item observed,
    returning ``(item, cms_est)``. For the split build/probe form (e.g.
    probing yesterday's sketch with today's keys) use
    :func:`cms_build` + :func:`cms_estimate` directly."""
    sketch = cms_build(df, item_col, depth=depth, width=width, weight_col=weight_col)
    return cms_estimate(sketch, df, item_col, depth=depth, width=width)


def mg_candidates(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys, ≤ ``k`` rows per
    partition. The MG invariant: any item whose count WITHIN a
    partition exceeds n_partition/(k+1) survives that partition's
    summary; since a globally-(1/(k+1))-frequent item must be locally
    frequent in at least one partition, the UNION of partition
    summaries is a superset of every global heavy hitter — the
    candidate-generation half of :func:`heavy_hitters`.

    Batches arrive vectorized (``value_counts`` per Arrow batch, one
    dict merge per batch); state per partition is bounded by k plus one
    batch's distinct count. Output is candidates only — counts from MG
    are estimates and deliberately NOT emitted (the exact pass
    recounts)."""
    import pandas as pd

    def kernel(batches):
        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # MG decrement step, batch-merged: shave the smallest
                # counts until <= k keys remain; total decrement across
                # the partition is <= n_partition/(k+1)
                for _ in range(len(counters) - k):
                    m = min(counters.values())
                    counters = {kk: v - m for kk, v in counters.items() if v > m}
                    if len(counters) <= k:
                        break
        yield pd.DataFrame({item_col: list(counters.keys())})

    return df.select(item_col).mapInPandas(
        kernel, df.select(item_col).schema
    ).distinct()


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    frac_num: int = 1,
    frac_den: int = 100,
    k: int | None = None,
) -> DataFrame:
    """EXACT φ-heavy hitters (φ = frac_num/frac_den) at bounded memory —
    the two-pass shape that replaces a full ``GROUP BY`` when the key
    space is corpus-sized but the answer is tiny:

      1. candidates: per-partition Misra-Gries summaries
         (:func:`mg_candidates`, ≤ k rows per partition — never the key
         space), unioned. MG has no false negatives for items above
         n/(k+1), so with ``k ≥ frac_den/frac_num`` every true heavy
         hitter is a candidate.
      2. verify: ONE more scan counts exactly — but only candidate rows
         survive the broadcast semi-filter into the aggregation, so the
         shuffle carries candidates×partitions rows, not the key space.

    The accept predicate is integer cross-multiplication
    (cnt·frac_den ≥ n_total·frac_num) against a 1-row broadcast total —
    no float share, no driver collect. Result is EXACTLY the plain
    ``GROUP BY … HAVING`` answer over NON-NULL items (strict
    oracle-able); memory is the thing that changed, not the semantics.

    Null items are EXCLUDED explicitly (and n_total counts non-null
    rows only): pandas ``value_counts`` drops NaN in the candidate pass
    and a null key never survives an equi-semi-join, so nulls could
    otherwise be silently missed rather than deliberately skipped — a
    null-frequency question is a null-count question, answered by
    ``profile_columns``."""
    if frac_num <= 0 or frac_den <= 0:
        raise ValueError("frac must be positive")
    df = df.filter(F.col(item_col).isNotNull())
    if k is None:
        k = max(16, 2 * ((frac_den + frac_num - 1) // frac_num))
    if k * frac_num < frac_den:
        raise ValueError(
            f"k={k} cannot guarantee completeness for frac {frac_num}/{frac_den} "
            f"(need k >= {frac_den // frac_num})"
        )
    cands = mg_candidates(df, item_col, k)
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n_total"))
    counted = (
        df.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(frac_den) >= F.col("__n_total") * F.lit(frac_num))
        .select(item_col, "cnt")
    )


def kmv_hash(value: Column) -> Column:
    """Portable 48-bit uniform hash of a value: first 12 hex chars of
    md5 over the string form. 48 bits (< 2^53) so every arithmetic step
    downstream stays exactly representable — and exactly reproducible —
    in any engine with md5, the same trick the CMS buckets and the
    weighted-sample priorities use."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 12), 16, 10
    ).cast("bigint")


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch of a column's DISTINCT
    values: the ``k`` rows with the smallest portable 48-bit hash, as a
    DataFrame of ``(pos, hv, value)``.

    Why this sketch earns its place next to HLL/CMS:

      - the bottom-k of a uniform hash is a DETERMINISTIC uniform sample
        of the distinct values — so unlike engine-private sketch blobs,
        every derived statistic (distinct estimate, sample quantiles) is
        strict-value-oracle-able: another engine computes the *same k
        rows*;
      - mergeable by construction: ``kmv_sketch`` of a union ==
        bottom-k of the unioned sketches (keep per-shard sketches at
        100 TB, merge on demand — pinned by test);
      - the classic KMV estimator: distinct ≈ (k-1) * 2^48 / h_k where
        ``h_k`` is the largest retained hash — here computed with
        INTEGER division so it is bit-identical cross-engine.

    Plan shape: distinct (one shuffle, map-side partial) → global
    TakeOrdered k on the hash (no full sort — Spark's
    ``TakeOrderedAndProject``), driver traffic bounded by ``k``.
    """
    if k < 2:
        raise ValueError("kmv needs k >= 2 (the estimator divides by h_k)")
    from pyspark.sql import Window

    return (
        df.select(F.col(col).alias("value")).distinct()
        .select(kmv_hash(F.col("value")).alias("hv"), "value")
        .orderBy("hv")
        .limit(k)
        .withColumn(
            "pos", F.row_number().over(Window.orderBy("hv")).cast("int")
        )
        .select("pos", "hv", "value")
    )


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union partial KMV sketches into the sketch of the combined input:
    distinct-union the retained (hv, value) rows and keep the k
    smallest. Exactly equals the single-pass sketch of the unioned
    data (test-pinned)."""
    from pyspark.sql import Window

    allrows = reduce(
        lambda a, b: a.unionByName(b), [s.select("hv", "value") for s in sketches]
    )
    return (
        allrows.distinct()
        .orderBy("hv")
        .limit(k)
        .withColumn("pos", F.row_number().over(Window.orderBy("hv")).cast("int"))
        .select("pos", "hv", "value")
    )


def kmv_summary(sketch: DataFrame, k: int, quantiles=(0.25, 0.5, 0.75)) -> DataFrame:
    """One-row summary of a full (size-k) KMV sketch: the integer
    distinct-count estimate ``(k-1) * 2^48 DIV h_k`` and the requested
    quantiles of the uniform distinct-value sample (positional picks
    over the value-sorted sample — floor((n-1)q)+1 — so no engine
    interpolation semantics are involved). Every output is integer /
    exact → strict cross-engine."""
    from pyspark.sql import Window

    n = sketch.count()
    if n < k:
        raise ValueError(
            f"kmv_summary needs a full sketch (k={k} rows, got {n}) — "
            "fewer distinct values than k means COUNT(DISTINCT) exactly"
        )
    by_val = sketch.withColumn(
        "vpos", F.row_number().over(Window.orderBy("value")).cast("int")
    )
    picks = {f"q{int(q * 100)}": int((k - 1) * q) + 1 for q in quantiles}
    agg = [
        F.max(F.when(F.col("pos") == k, F.col("hv"))).alias("hk"),
    ] + [
        F.max(F.when(F.col("vpos") == pos, F.col("value"))).alias(name)
        for name, pos in picks.items()
    ]
    return by_val.agg(*agg).select(
        F.lit(k).cast("int").alias("k"),
        F.col("hk").cast("bigint").alias("hk"),
        F.expr(f"CAST({k - 1} AS BIGINT) * CAST({2**48} AS BIGINT) DIV hk")
        .cast("bigint")
        .alias("est_distinct"),
        *[F.col(name) for name in picks],
    )


def kmv_intersect(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Set-overlap / join-cardinality estimate from two full size-``k``
    KMV sketches (Beyer et al., SIGMOD 2007): the bottom-``k`` of the
    UNIONED hash sets is a uniform sample of A ∪ B, so the fraction of
    those ``k`` values present in BOTH sketches estimates Jaccard, and

        |A ∩ B| ≈ jaccard · |A ∪ B|  →  n_both * union_est DIV k

    with every step integer (strict-value-oracle-able, like
    ``kmv_summary``). This is the "how big will this join be" answer
    computed from two bounded sketches — the inputs themselves never
    meet in a join; only 2k retained rows do.

    Returns one row: ``(k, n_both, union_est, jaccard_x10000,
    inter_est)``. Raises if either sketch is not full (fewer distinct
    values than ``k`` means the exact answer is already cheap).
    """
    from pyspark.sql import Window

    if sk_a.count() < k or sk_b.count() < k:
        raise ValueError(
            f"kmv_intersect needs two full size-{k} sketches — an "
            "under-full sketch means COUNT(DISTINCT) is exact already"
        )
    union_k = kmv_merge(sk_a, sk_b, k=k)
    flagged = (
        union_k.join(
            sk_a.select(F.col("hv").alias("hv_a")).distinct(),
            union_k["hv"] == F.col("hv_a"),
            "left",
        )
        .join(
            sk_b.select(F.col("hv").alias("hv_b")).distinct(),
            union_k["hv"] == F.col("hv_b"),
            "left",
        )
        .select(
            "pos",
            "hv",
            (F.col("hv_a").isNotNull() & F.col("hv_b").isNotNull())
            .cast("int")
            .alias("in_both"),
        )
    )
    return flagged.agg(
        F.max(F.when(F.col("pos") == k, F.col("hv"))).alias("hk"),
        F.sum("in_both").cast("bigint").alias("n_both"),
    ).select(
        F.lit(k).cast("int").alias("k"),
        "n_both",
        F.expr(f"CAST({k - 1} AS BIGINT) * CAST({2**48} AS BIGINT) DIV hk")
        .cast("bigint")
        .alias("union_est"),
        F.expr(f"CAST(n_both * 10000 DIV {k} AS BIGINT)").alias(
            "jaccard_x10000"
        ),
        F.expr(
            f"CAST(n_both * (CAST({k - 1} AS BIGINT) * CAST({2**48} AS BIGINT)"
            f" DIV hk) DIV {k} AS BIGINT)"
        ).alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# Log-bucket histogram sketch (DDSketch-style, deterministic)
# ---------------------------------------------------------------------------
#
# DDSketch (Masson/Rim/Lee, VLDB 2019) buckets values by
# ceil(log_gamma(x)) and answers quantiles with bounded RELATIVE error
# from counts alone.  A float log is not bit-stable across engines, so
# this variant uses the base-2 exponent plus a linear sub-bucket grid:
#
#   e = floor(log2(v))           -- EXACTLY, via the bit length of v
#   m = ((v << sub_bits) >> e) - 2^sub_bits   in [0, 2^sub_bits)
#   bucket = e * 2^sub_bits + m
#
# Every step is integer shift arithmetic, so the sketch is bit-identical
# in any engine with << / >> (DuckDB included — strict oracles, not
# error-bound contracts).  Relative error of the midpoint estimate is
# <= 1/2^(sub_bits+1) (3.1% at sub_bits=4); buckets are exactly
# mergeable by summing counts (partial sketches per shard/day at 100 TB,
# merged on demand — same maintenance shape as the HLL/CMS partials).
# State is bounded by construction: <= 63 * 2^sub_bits counter rows no
# matter the input cardinality, with map-side partial aggregation
# collapsing each partition before the one shuffle.


def logbucket_index(value: Column, sub_bits: int = 4) -> Column:
    """Bucket id of a POSITIVE bigint value (callers quantize floats to
    integer units first — cents, micros — the engine-wide strictness
    trick).  ``floor(log2(v))`` is computed exactly as
    ``length(bin(v)) - 1``; the shifts run through ``call_function`` so
    the shift distance can be a Column (the Python helpers only accept
    literals).  Values must stay below 2^(63 - sub_bits) so the left
    shift cannot overflow."""
    v = value.cast("bigint")
    e = (F.length(F.bin(v)) - F.lit(1)).cast("int")
    sub = 1 << sub_bits
    m = F.call_function(
        "shiftright", F.call_function("shiftleft", v, F.lit(sub_bits)), e
    ) - F.lit(sub)
    return (e.cast("bigint") * F.lit(sub) + m).cast("int")


def logbucket_estimate(bucket: Column, sub_bits: int = 4) -> Column:
    """Midpoint representative of a bucket, as exact integer arithmetic:
    bucket [e, m] covers [(sub+m)*2^e/sub, (sub+m+1)*2^e/sub), midpoint
    = (2*(sub+m)+1) * 2^e / 2^(sub_bits+1) — and dividing by a power of
    two is a right shift, so the whole estimate is three shifts, no
    float anywhere."""
    sub = 1 << sub_bits
    e = F.floor(bucket / F.lit(sub)).cast("int")
    m = bucket.cast("bigint") % F.lit(sub)
    num = F.call_function(
        "shiftleft", (F.lit(2) * (F.lit(sub) + m) + F.lit(1)).cast("bigint"), e
    )
    return F.call_function("shiftright", num, F.lit(sub_bits + 1)).cast("bigint")


def logbucket_sketch(df: DataFrame, col: str, sub_bits: int = 4) -> DataFrame:
    """Histogram sketch of a positive integer column: one row per
    occupied ``(bucket, cnt)``.  One groupBy; map-side partials bound
    pre-shuffle rows at 63 * 2^sub_bits per partition."""
    return (
        df.select(logbucket_index(F.col(col), sub_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def logbucket_merge(*sketches: DataFrame) -> DataFrame:
    """Sum partial sketches into the sketch of the combined input —
    exact (integer counts), pinned equal to the single-pass sketch by
    test."""
    allrows = reduce(lambda a, b: a.unionByName(b), sketches)
    return allrows.groupBy("bucket").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def logbucket_quantiles(
    sketch: DataFrame, probs=(0.5, 0.9, 0.99), sub_bits: int = 4
) -> DataFrame:
    """Quantile estimates from a sketch: for each p, the midpoint of
    the first bucket whose cumulative count reaches rank
    ``floor((n-1)*p) + 1`` (the positional definition KMV uses — no
    interpolation semantics).  The cumulative window is ordered over
    the SKETCH, whose size is bounded by construction (<= 63 * 2^sub_bits
    rows), so the single-partition window is a bounded-state scan, not
    a data-sized sort — the same argument the KMV summary carries.
    Output: (p_x100, rank, bucket, est, n) per prob, all integers."""
    from pyspark.sql import Window

    cum = sketch.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    spark = sketch.sparkSession
    probs_df = spark.createDataFrame(
        [(int(round(p * 100)),) for p in probs], "p_x100 int"
    )
    ranked = cum.crossJoin(F.broadcast(probs_df)).withColumn(
        "rank",
        (
            ((F.col("n") - 1) * F.col("p_x100") / F.lit(100)).cast("bigint")
            + F.lit(1)
        ),
    )
    return (
        ranked.filter(F.col("cum") >= F.col("rank"))
        .groupBy("p_x100", "rank", "n")
        .agg(F.min("bucket").cast("int").alias("bucket"))
        .select(
            "p_x100",
            F.col("rank").cast("bigint").alias("rank"),
            "bucket",
            logbucket_estimate(F.col("bucket"), sub_bits).alias("est"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
