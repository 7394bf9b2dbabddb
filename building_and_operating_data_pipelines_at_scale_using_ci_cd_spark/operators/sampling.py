"""Deterministic dataset splitting / sampling / packing (SURVEY.md §2.10
north-star: the bookkeeping half of a training-data pipeline — after
dedup/quality filtering, a corpus still needs reproducible train/val/test
splits, stratified subsampling, and token-stream packing).

Everything is keyed on the portable md5 hash of a stable id (via
``functions.text.portable_hash`` discipline), NOT on ``rand()``:

  - reproducible across runs, engines, partitionings, and cluster sizes —
    re-running the pipeline tomorrow on 10× the executors yields the same
    split for every surviving document;
  - membership is a pure per-row projection: no shuffle, no sort, no
    global state — each operator is a narrow map stage at any scale;
  - an oracle engine (DuckDB) can reproduce assignments bit-for-bit.

Packing is the one operator that needs an order (a window cumsum). A
single global ORDER BY would serialize the corpus through one task, so
packing shards first (md5 of the id mod ``n_shards``) and packs within
shards — the standard way LLM pretraining pipelines parallelize sequence
packing; ``n_shards`` bounds per-task state, and the window shuffles once
on the shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: resolution of the md5-derived uniform in [0, 1)
_BUCKETS = 1_000_000


def uniform_from_id(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from an id: first 8 hex chars of
    md5(id#seed) → 32-bit int → mod 1e6 / 1e6. Engine-portable (md5 +
    integer arithmetic only)."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"#{seed}"))), 1, 8), 16, 10
    ).cast("bigint")
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by its id
    hash. Splits are disjoint, exhaustive, and stable: a row's assignment
    never changes when other rows are added or removed — the property
    random splits lack and training reproducibility needs.

    ``weights`` need not sum to 1; they are normalized. Pure projection —
    no shuffle."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    u = uniform_from_id(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | float,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its id-hash
    uniform falls under its stratum's fraction. With a dict, unlisted
    strata default to 0 (dropped); with a scalar, every stratum keeps the
    same share. No shuffle — membership is a per-row predicate, so this
    composes with any downstream plan for free (contrast ``sampleBy``,
    whose Bernoulli draw changes membership run to run)."""
    u = uniform_from_id(F.col(id_col), seed)
    if isinstance(fractions, dict):
        frac = None
        for k, v in fractions.items():
            branch = F.when(F.col(strata_col) == k, F.lit(float(v)))
            frac = branch if frac is None else frac.when(F.col(strata_col) == k, F.lit(float(v)))
        frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
    else:
        frac = F.lit(float(fractions))
    return df.filter(u < frac)


def pack_sequential(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Sequence packing: concatenate documents (in a deterministic order)
    into fixed-budget bins — the contiguous-stream chunking LLM
    pretraining uses to fill context windows. A document belongs to the
    bin where its stream offset starts, so every bin except a shard's
    last holds ≥ budget units of contiguous stream.

    Sharded for scale: rows are bucketed by md5(order_col) % n_shards and
    packed within shards (one window shuffle on the shard key; per-task
    state bounded by the largest shard, never the corpus). Output adds
    ``shard``, ``bin_id`` (global: shard * 2^32 + local bin), and
    ``bin_offset`` (the row's start position inside its bin).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(order_col).cast("string"), F.lit(f"#{seed}"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    sharded = df.withColumn("shard", (h % n_shards).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_incl = F.sum(F.col(size_col).cast("bigint")).over(w)
    cum_before = cum_incl - F.col(size_col).cast("bigint")
    local_bin = F.floor(cum_before / F.lit(budget))
    return (
        sharded.withColumn("__cum_before", cum_before)
        .withColumn(
            "bin_id", (F.col("shard").cast("bigint") * F.lit(1 << 32) + local_bin).cast("bigint")
        )
        .withColumn(
            "bin_offset", (F.col("__cum_before") - local_bin * F.lit(budget)).cast("bigint")
        )
        .drop("__cum_before")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    pos_col: str = "pos",
    shard_col: str = "shard",
) -> DataFrame:
    """Global pseudorandom shuffle + sharding — the step every training
    pipeline runs before writing tokenized data: rows land in
    ``n_shards`` shards by id hash, ordered pseudorandomly WITHIN each
    shard (``pos`` = 1..shard size), so reading shards sequentially
    yields a reproducible global shuffle. Deterministic (md5-derived,
    engine-portable), stable per row given (id, seed, n_shards), and
    re-shuffling is just a new seed.

    Plan shape: ONE shuffle (window partitioned by shard). ``n_shards``
    is the parallelism/state bound — each window partition holds one
    shard, so size shards like output files (corpus/n_shards rows each;
    at 100 TB that's ~100k shards of ~1 GB, which also matches what the
    downstream trainer wants to read). Compose with the file sink's
    ``partitionBy`` [shard] + a ``sortWithinPartitions`` on (shard,
    pos) to land one ordered file per shard."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    clash = [c for c in (pos_col, shard_col, "__h") if c in df.columns]
    if clash:
        raise ValueError(
            f"shuffle_shards output columns collide with input columns "
            f"{clash}; pass pos_col/shard_col to rename"
        )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    out = df.withColumn("__h", h).withColumn(
        shard_col, (F.col("__h") % n_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(id_col))
    return (
        out.withColumn(pos_col, F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    ``k`` rows with the smallest ``priority = hash48(id) // w`` (then id
    as tiebreak) — an integer-arithmetic variant of the A-Res /
    Efraimidis–Spirakis priority-sampling family. A row with integer
    weight ``w`` competes with priority ``h/w``, so doubling a row's
    weight halves its expected priority and (asymptotically) doubles its
    selection odds, while the WHOLE computation stays in 48-bit integer
    math: no ``ln``/``pow`` in the ranking key means no libm
    last-ulp divergence between engines — the sample is reproducible
    bit-for-bit anywhere (the float formulations are not, exactly at the
    selection boundary where it matters).

    Shape at scale: priority is a pure per-row projection (no shuffle);
    the global smallest-k is a TakeOrdered top-k (per-partition heaps +
    one k-row reduce), never a full sort. Weights must be positive
    integers. Output keeps the row plus ``__w`` and ``__priority``."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("bigint")
    # 48-bit hash: 12 hex chars of md5(id#seed). Exact in a BIGINT and,
    # after the exactly-divisible subtraction below, exact in the DOUBLE
    # division too (quotient <= 2^48 < 2^53).
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    # h // w without a DIV expression: (h - h % w) is exactly divisible,
    # so the double division is exact and the cast truncates nothing
    priority = ((h - h % w) / w).cast("bigint")
    return (
        df.withColumn("__w", w)
        .withColumn("__priority", priority)
        .orderBy(F.col("__priority").asc(), F.col(id_col).asc())
        .limit(k)
    )


def domain_mix_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Sample a corpus down to an EXACT target domain mixture — the
    "mixture weights" step of LLM pretraining data assembly (e.g. 2 parts
    web : 1 part code). ``weights`` are positive integers; the operator
    takes the largest k with ``w_s·k ≤ count_s`` for every stratum and
    keeps exactly ``w_s·k`` rows of stratum s, so the output follows the
    requested ratio exactly and is as large as the scarcest domain allows.

    All-integer math (no float keep-rates → no engine-boundary rounding):
    per-stratum counts aggregate map-side; k arrives as a one-row
    broadcast (never a driver collect); selection is "the w_s·k rows with
    the smallest (md5-uniform, id)" — one window shuffle on the stratum
    key, deterministic under insertion of other rows only in the usual
    rank-sample sense (adding rows can displace boundary rows; use
    :func:`stratified_sample` when per-row stability matters more than an
    exact mixture). Unlisted strata are dropped."""
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for stratum {s!r} must be positive")
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    weighted = df.filter(F.col(strata_col).isin(*weights)).withColumn(
        "__w", wmap[F.col(strata_col)].cast("bigint")
    )
    # k must range over the REQUESTED strata, not the observed ones: a
    # requested stratum with zero rows caps k at 0 (an exact w_s:...
    # mixture is infeasible), which a groupBy over the data alone would
    # silently miss (hypothesis found exactly that corpus)
    w_df = df.sparkSession.createDataFrame(
        [(s, int(w)) for s, w in weights.items()], f"`{strata_col}` string, `__w` bigint"
    )
    k_df = (
        w_df.join(weighted.groupBy(strata_col).count(), strata_col, "left")
        .select(
            F.floor(F.coalesce(F.col("count"), F.lit(0)) / F.col("__w")).alias("__k")
        )
        .groupBy()
        .agg(F.min("__k").alias("__k"))
    )
    w_rank = Window.partitionBy(strata_col).orderBy(
        uniform_from_id(F.col(id_col), seed), F.col(id_col)
    )
    return (
        weighted.withColumn("__rn", F.row_number().over(w_rank))
        .join(F.broadcast(k_df))
        .filter(F.col("__rn") <= F.col("__w") * F.col("__k"))
        .drop("__w", "__rn", "__k")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection (hashed n-gram features)
# ---------------------------------------------------------------------------
#
# Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
# selects raw-corpus documents that look like a small TARGET corpus:
# featurize every document into hashed n-gram bucket counts, fit
# bag-of-words distributions p (target) and q (raw), and weight each
# document by its log likelihood ratio sum_b c_b * (log p_b - log q_b).
#
# Cross-engine contract: the ONLY float arithmetic is the B per-bucket
# log-ratio scores, quantized HALF-UP to integer `scale`-units exactly
# the way lm_cross_entropy's rounding contract does (both engines
# evaluate ln on the same rational double); every per-document weight
# is then an exact INTEGER sum of those scores, so ranking never sits
# on a float boundary.
#
# Shape at 100 TB: the raw corpus is a narrow tokenize+explode map
# whose only shuffles are (a) ONE groupBy down to <= n_buckets rows and
# (b) ONE per-document weight aggregation keyed on the document id; the
# score table is <= n_buckets rows and broadcasts; the target corpus is
# small by definition (that's why you're matching it). Selection is a
# TakeOrdered top-k — never a global sort.


def _bucket_rows(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(__id, bucket) rows — one per unigram AND bigram OCCURRENCE (not
    distinct: DSIR weights are count-weighted). Bucket = portable 48-bit
    md5 hash mod n_buckets. Tokens materialize in their own projection
    (the shingles_from_tokens O(tokens²) lesson); the rand() barrier
    stops CollapseProject from inlining the split into the lambda."""
    from ..functions.text import tokens

    tk = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__tk"),
        F.rand().alias("__b0"),
    )
    uni = tk.select("__id", F.explode("__tk").alias("gram"))
    big = tk.select(
        "__id",
        F.explode(
            F.when(
                F.size("__tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__tk") - F.lit(1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__tk"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    grams = uni.unionByName(big)
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 12), 16, 10).cast("bigint")
        % F.lit(int(n_buckets))
    )
    return grams.select("__id", bucket.alias("bucket"))


def dsir_bucket_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 512,
    scale: int = 10_000,
    alpha: int = 1,
) -> DataFrame:
    """Per-bucket integer log-likelihood-ratio scores
    ``floor(scale * ln(p_b / q_b) + 0.5)`` with add-``alpha`` smoothed
    ``p_b = (tc_b + a) / (T + aB)`` over hashed unigram+bigram buckets.
    Returns the FULL ``n_buckets``-row grid (unseen buckets carry the
    smoothed floor score) — bounded build side for the weight join."""
    if n_buckets < 2 or n_buckets > 1_000_000:
        raise ValueError("n_buckets must be in [2, 1e6] (the broadcast bound)")
    qc = _bucket_rows(raw, id_col, text_col, n_buckets).groupBy("bucket").agg(
        F.count("*").alias("qc")
    )
    pc = _bucket_rows(target, id_col, text_col, n_buckets).groupBy("bucket").agg(
        F.count("*").alias("pc")
    )
    return _bucket_scores(raw.sparkSession, qc, pc, n_buckets, scale, alpha)


def _bucket_scores(spark, qc, pc, n_buckets: int, scale: int, alpha: int) -> DataFrame:
    """Score grid from already-aggregated per-bucket q/p counts (split
    out of :func:`dsir_bucket_scores` so :func:`dsir_select` can feed a
    materialized gram table instead of re-tokenizing the corpus)."""
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    tot = (
        qc.agg(F.sum("qc").alias("qt"))
        .crossJoin(pc.agg(F.sum("pc").alias("pt")))
    )  # 1-row scalar attach
    a, b = int(alpha), int(n_buckets)
    return (
        grid.join(qc, "bucket", "left")
        .join(pc, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                F.lit(float(scale))
                * (
                    F.log(F.coalesce(F.col("pc"), F.lit(0)) + F.lit(a))
                    - F.log(F.col("pt") + F.lit(a * b))
                    - F.log(F.coalesce(F.col("qc"), F.lit(0)) + F.lit(a))
                    + F.log(F.col("qt") + F.lit(a * b))
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("score"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    *,
    n_buckets: int = 512,
    scale: int = 10_000,
    alpha: int = 1,
) -> DataFrame:
    """The ``k`` raw-corpus documents most like the target corpus under
    the DSIR importance weight (deterministic top-k by ``(weight DESC,
    id ASC)`` — the ranking variant of the paper's Gumbel resampling;
    use :func:`weighted_priority_sample` over the weights when a
    without-replacement SAMPLE is wanted instead). Returns
    ``(id_col, n_grams, weight)``."""
    if k <= 0:
        raise ValueError("k must be positive")
    if n_buckets < 2 or n_buckets > 1_000_000:
        raise ValueError("n_buckets must be in [2, 1e6] (the broadcast bound)")
    # Tokenize + hash the raw corpus ONCE (round-12 optimization, guide
    # §8 "decide with small rows"): the (id, bucket) gram table feeds
    # BOTH the q-count aggregate and the final weight join — without
    # materialization the tokenize/explode/md5 subtree ran twice (the
    # plan carried 20 parquet scans). The checkpointed proxy is two
    # narrow integers + an id per gram occurrence — far cheaper to hold
    # than to recompute at any scale.
    raw_b = _bucket_rows(raw, id_col, text_col, n_buckets).localCheckpoint(
        eager=False
    )
    qc = raw_b.groupBy("bucket").agg(F.count("*").alias("qc"))
    pc = _bucket_rows(target, id_col, text_col, n_buckets).groupBy("bucket").agg(
        F.count("*").alias("pc")
    )
    scores = _bucket_scores(raw.sparkSession, qc, pc, n_buckets, scale, alpha)
    return (
        raw_b
        .join(F.broadcast(scores), "bucket")
        .groupBy("__id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("score").cast("bigint").alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "n_grams", "weight")
    )
