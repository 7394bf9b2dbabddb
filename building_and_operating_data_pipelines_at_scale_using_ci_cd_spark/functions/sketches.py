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
