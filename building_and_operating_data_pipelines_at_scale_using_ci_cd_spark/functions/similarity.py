"""Similarity search over embedding columns (north-star, SURVEY.md §2.10).

Two paths:
  - brute-force cosine top-k — exact baseline. The query set is broadcast
    (it's small by construction); the corpus streams through one stage, so
    the plan is scan + broadcast-nested-loop + per-query top-k. Linear in
    corpus size, embarrassingly parallel — fine at 100 TB when the query
    set is bounded.
  - LSH-bucketed ANN (random hyperplane signs → bucket key) — the scale
    path when the query set is itself huge: both sides shuffle on the
    bucket key, candidates only within buckets (IVF-style), then exact
    rerank. Hyperplanes are derived from the portable md5 hash of
    (dim, plane) so the index is deterministic and engine-portable.

All dot products are built-in ``zip_with``/``aggregate`` expressions —
JVM-side, no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, element-cast before multiply so float32
    inputs accumulate deterministically."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def topk_neighbors(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Columns out: query_id, neighbor_id, rank, cosine_sim. The query side
    is broadcast explicitly — never let a small query table pick a shuffle
    join. Ties broken by neighbor id for determinism."""
    # norms are materialized once per row BEFORE the pair join: scoring a
    # pair then costs one dot product, not three (cosine() inline would
    # recompute both side's norms per candidate pair).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    joined = F.broadcast(q).crossJoin(c)
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "__cos", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("__cos"), 2).alias("cosine_sim"),
        )
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — no RNG state, so
    the same index is built on any engine, any cluster, any day."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:8], 16)
        out.append(1.0 if h & 1 else -1.0)
    return out


def lsh_bucket_key(vec: Column, dim: int, num_planes: int = 8, plane_offset: int = 0) -> Column:
    """Random-hyperplane LSH: sign bits of ``num_planes`` projections,
    packed into an int bucket key. ``plane_offset`` selects a disjoint
    plane family — how multi-table LSH derives independent tables from
    the same deterministic md5 plane generator."""
    key = None
    for p in range(num_planes):
        plane = _hyperplane(dim, p + plane_offset)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        key = bit if key is None else key + bit
    return key.cast("int")


def ivf_probe_assignments(
    df: DataFrame,
    centroids: list[tuple],
    id_col: str,
    vec_col: str,
    n_probe: int,
    out_id: str,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids WITHOUT a
    shuffle: the (small) centroid set is folded into the projection as a
    literal array, so assignment is a pure map stage — argmax over an
    array of (−sim, centroid_id) structs, sorted and sliced. At 100 TB
    this is the difference between a free narrow pass and an
    |corpus|×n_centroids exploded shuffle.

    Norm discipline: each centroid's norm is computed driver-side and
    baked in as a literal, and the row vector's norm is materialized once
    (behind a projection barrier — Spark re-evaluates lambda-body
    expressions per element, see operators/dedup.py) so scoring against
    n_centroids costs n_centroids dots, not 3·n_centroids. The norm rides
    along for the rerank join, which then pays one dot per candidate."""
    import math

    def _norm(vec) -> float:
        return math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0

    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
                F.lit(_norm(vec)).alias("cn"),
            )
            for cid, vec in centroids
        ]
    )
    staged = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(f"__{out_id}_v"),
        l2_norm(F.col(vec_col)).alias(f"__{out_id}_n"),
        F.rand().alias("__barrier"),
    )
    vec = F.col(f"__{out_id}_v")
    norm = F.col(f"__{out_id}_n")
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            (-(dot(vec, c["cv"]) / (norm * c["cn"]))).alias("neg_sim"),
            c["cid"].alias("cid"),
        ),
    )
    probed = F.slice(F.array_sort(scored), 1, n_probe)
    return staged.select(
        out_id,
        f"__{out_id}_v",
        f"__{out_id}_n",
        F.explode(F.transform(probed, lambda s: s["cid"])).alias("__list_id"),
    )


def kmeans_refine(
    corpus: DataFrame,
    cents: list[tuple],
    id_col: str,
    vec_col: str,
    iters: int = 2,
) -> list[tuple]:
    """Lloyd iterations over the IVF centroid set: assign every corpus
    vector to its nearest centroid (the same literal-array map stage the
    index uses — no shuffle beyond the groupBy), average each cluster
    elementwise, collect the ``n_centroids`` new centroids. Driver
    traffic per iteration is n_centroids rows — bounded regardless of
    corpus size — and the result is deterministic given the seeds, so
    the refined index is still reproducible run-to-run.

    Refinement tightens the lists (better recall at the same n_probe);
    it never changes the query-time plan shape."""
    dim = len(cents[0][1])
    for _ in range(max(0, iters)):
        assigned = ivf_probe_assignments(corpus, cents, id_col, vec_col, 1, "m")
        means = (
            assigned.groupBy("__list_id")
            .agg(
                *[
                    F.avg(F.element_at(F.col("__m_v"), i + 1).cast("double")).alias(f"__d{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new_cents = {
            int(r["__list_id"]): [float(r[f"__d{i}"]) for i in range(dim)] for r in means
        }
        # empty clusters keep their previous centroid
        cents = [(cid, new_cents.get(int(cid), list(vec))) for cid, vec in cents]
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned
    into ``n_centroids`` lists by nearest centroid; each query probes its
    ``n_probe`` nearest lists and reranks exactly inside them.

    Centroids seed from the ``n_centroids`` lowest-id corpus vectors — a
    deterministic seeding that keeps the index reproducible on any engine
    — and ``kmeans_iters`` Lloyd iterations (:func:`kmeans_refine`)
    optionally tighten them; refinement changes only the centroid VALUES,
    never the plan shape. Corpus vectors land in exactly one list; the
    probe join is a hash equi-join on list id — the IVF analogue of the
    LSH bucket join, with recall tunable via ``n_probe``.
    """
    cents = [
        (r[0], r[1])
        for r in corpus.select(id_col, vec_col).orderBy(F.col(id_col)).limit(n_centroids).collect()
    ]
    if kmeans_iters > 0:
        cents = kmeans_refine(corpus, cents, id_col, vec_col, kmeans_iters)
    c_assign = ivf_probe_assignments(corpus, cents, id_col, vec_col, 1, "neighbor_id")
    q_assign = ivf_probe_assignments(queries, cents, id_col, vec_col, n_probe, "query_id")
    joined = q_assign.join(c_assign, "__list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.withColumn(
        "__cos",
        dot(F.col("__query_id_v"), F.col("__neighbor_id_v"))
        / (F.col("__query_id_n") * F.col("__neighbor_id_n")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("__cos"), 2).alias("cosine_sim"))
    )


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine rerank inside. Two knobs, the standard LSH trade:

      - ``num_planes`` (bits per table): fewer planes → bigger buckets →
        higher recall per table, more compute;
      - ``num_tables`` (independent hash tables, disjoint plane seeds):
        a close pair is found if it collides in ANY table, so recall
        amplifies as 1-(1-p^planes)^tables at tables× candidate cost —
        the classic way to buy recall WITHOUT inflating bucket sizes
        (bench.py tracks recall@5 against the exact answer each round).

    Both sides explode to one row per (table, bucket) and shuffle on that
    composite key — hash-partitioned equi-joins, never a cross join; a
    pair colliding in several tables is scored per collision and
    de-duplicated before ranking (cheaper than re-joining vectors after
    an id-level distinct). This is what survives a 100× corpus scale-up."""

    def keyed(df: DataFrame, out_id: str, vec_alias: str, norm_alias: str) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_bucket_key(
                        F.col(vec_col), dim, num_planes, plane_offset=t * num_planes
                    ).alias("bkt"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(vec_alias),
            l2_norm(F.col(vec_col)).alias(norm_alias),
            F.explode(tables).alias("__tb"),
        ).select(out_id, vec_alias, norm_alias, "__tb.tbl", "__tb.bkt")

    q = keyed(queries, "query_id", "__qv", "__qn")
    c = keyed(corpus, "neighbor_id", "__cv", "__cn")
    joined = q.join(c, ["tbl", "bkt"]).filter(F.col("query_id") != F.col("neighbor_id"))
    # one dot per collision — norms were computed once per row above
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias("__cos"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("__cos"), 2).alias("cosine_sim"))
    )
