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

import numpy as np
import pandas as pd
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
    sim_decimals: int | None = 2,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Columns out: query_id, neighbor_id, rank, cosine_sim. The query side
    is broadcast explicitly — never let a small query table pick a shuffle
    join. Ties broken by neighbor id for determinism.

    ``sim_decimals=None`` emits the UNROUNDED cosine — required by any
    caller that derives further integer contracts from the similarity
    (``knn_edges`` weighted mass): rounding first would re-introduce the
    engine ROUND-semantics divergence the integer contract exists to
    avoid (Spark BigDecimal HALF_UP vs DuckDB multiply-then-round flip
    on .xx5-boundary doubles)."""
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
    # JVM dot on purpose: the BNLJ emits |q|·|corpus| pairs, and pushing
    # them through Arrow means serializing BOTH vectors per pair to
    # Python — measured 1.5x SLOWER than the interpreted zip_with here
    # (the candidate-join paths use _pair_dot because their pair volume
    # is bucket-bounded and already crosses a shuffle)
    scored = joined.withColumn(
        "__cos", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    sim = (
        F.col("__cos") if sim_decimals is None else F.round(F.col("__cos"), sim_decimals)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            sim.alias("cosine_sim"),
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
    the same deterministic md5 plane generator.

    The plane matrix ships as ONE 2-D array literal (``F.lit`` of a
    nested list), not ``num_planes×dim`` individual literal nodes: with
    12+ planes of dim 64 the per-float ``CreateArray(Literal…)`` tree
    made Catalyst analysis alone cost ~1.7s per plan build — more than
    the whole query's execution at bench scale. One Literal node keeps
    the tree O(planes) instead of O(planes·dim)."""
    planes = F.lit([_hyperplane(dim, p + plane_offset) for p in range(num_planes)])
    weights = F.lit([float(1 << p) for p in range(num_planes)])
    bits = F.zip_with(
        planes,
        weights,
        lambda plane, w: F.when(
            F.aggregate(
                F.zip_with(vec, plane, lambda x, v: x.cast("double") * v),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            w,
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(bits, F.lit(0.0), lambda acc, x: acc + x).cast("int")


# live centroid broadcasts, keyed by (SparkContext id, array digest).
# Re-invoking IVF/SemDeDup with the SAME centroid set reuses the handle
# instead of stacking a fresh ~dim×k float64 copy on driver+executors
# per call; distinct sets accumulate only until release_ivf_broadcasts()
# (long-lived sessions should call it between index generations).
_CENTROID_BROADCASTS: dict = {}


def release_ivf_broadcasts() -> int:
    """Destroy every centroid broadcast this module is holding and
    return how many were released. Safe to call at any point where no
    assignment DataFrame built from a prior call is still pending
    materialization (destroyed broadcasts fail on next use rather than
    silently recomputing)."""
    n = 0
    for bc in _CENTROID_BROADCASTS.values():
        try:
            bc.destroy()
            n += 1
        except Exception:
            pass  # context already stopped — nothing left to free
    _CENTROID_BROADCASTS.clear()
    return n


def _centroid_broadcast(sc, arrays: tuple):
    import hashlib

    digest = hashlib.sha1(b"".join(a.tobytes() for a in arrays)).hexdigest()
    key = (id(sc), digest)
    bc = _CENTROID_BROADCASTS.get(key)
    if bc is None:
        bc = sc.broadcast(arrays)
        _CENTROID_BROADCASTS[key] = bc
    return bc


def ivf_probe_assignments(
    df: DataFrame,
    centroids: list[tuple],
    id_col: str,
    vec_col: str,
    n_probe: int,
    out_id: str,
    transport: str = "broadcast",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids WITHOUT a
    shuffle: assignment is a pure map stage. At 100 TB this is the
    difference between a free narrow pass and an |corpus|×n_centroids
    exploded shuffle.

    Like the LSH index build (:func:`_make_bucketize`), the whole
    centroid scoring is ONE Arrow-batched numpy matmul per batch — the
    n_centroids interpreted ``aggregate(zip_with(...))`` passes it
    replaces cost more in Catalyst analysis + per-element eval than the
    query's execution once the centroid count grows (and with the
    ~√n adaptive default, it grows). The row norm comes out of the same
    matmul and rides along for the rerank join, which then pays one dot
    per candidate. Ties (equal cosine) break toward the LOWER centroid
    id, exactly like the previous (−sim, cid) struct sort.

    ``transport`` controls how the centroid matrix reaches executors:
      - ``"broadcast"`` (default): a SparkContext broadcast — shipped
        once per executor, torrent-distributed, NOT re-serialized into
        every task closure / plan. This is what lets the index size cap
        rise toward the SemDeDup ~100k-cluster regime: 100k × dim-64
        float64 centroids are ~50 MB, untenable inside a task binary,
        routine as a broadcast.
      - ``"closure"``: the matrix rides the UDF closure (the pre-round-7
        shape) — kept for the equality pin and as a fallback where
        broadcast variables are awkward (unit scaffolding).
    Assignments are bit-identical between transports (same arrays, same
    matmul) — asserted by test."""
    import math

    def _norm(vec) -> float:
        return math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0

    from pyspark.sql.functions import pandas_udf

    if transport not in ("broadcast", "closure"):
        raise ValueError("transport must be 'broadcast' or 'closure'")
    cids = np.array([int(cid) for cid, _ in centroids], dtype=np.int64)
    cmat = np.array([[float(x) for x in vec] for _, vec in centroids], dtype=np.float64)
    cnorms = np.array([_norm(vec) for _, vec in centroids], dtype=np.float64)
    # pre-sort centroid columns by cid so a STABLE argsort on -sim breaks
    # ties toward the lower centroid id
    order = np.argsort(cids, kind="stable")
    cids_s, cmat_s, cnorms_s = cids[order], cmat[order], cnorms[order]
    probe = min(n_probe, len(cids))
    # factory binding: the broadcast-mode UDF body must reference ONLY
    # the broadcast handle — a fallback expression naming the raw arrays
    # would capture them into the closure anyway (Python closures close
    # over referenced names regardless of branch) and defeat the point
    def _make_assign(get_index):
        @pandas_udf("struct<norm:double,lists:array<int>>")
        def assign(s: pd.Series) -> pd.DataFrame:
            ids, mat_c, norms_c = get_index()
            if len(s) == 0:
                return pd.DataFrame({"norm": pd.Series(dtype="float64"), "lists": []})
            mat = np.vstack(s.to_numpy()).astype(np.float64)
            norms = np.sqrt((mat * mat).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                # zero norms divide to inf/nan exactly like the JVM path
                # did; nan (-sim) sorts last in both engines
                sim = (mat @ mat_c.T) / (norms[:, None] * norms_c[None, :])
            nearest = np.argsort(-sim, axis=1, kind="stable")[:, :probe]
            return pd.DataFrame(
                {"norm": norms, "lists": list(ids[nearest].astype(np.int32))}
            )

        return assign

    if transport == "broadcast":
        bc = _centroid_broadcast(
            df.sparkSession.sparkContext, (cids_s, cmat_s, cnorms_s)
        )
        assign = _make_assign(lambda: bc.value)
    else:
        index = (cids_s, cmat_s, cnorms_s)
        assign = _make_assign(lambda: index)

    staged = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(f"__{out_id}_v"),
        assign(F.col(vec_col)).alias("__s"),
    )
    return staged.select(
        out_id,
        f"__{out_id}_v",
        F.col("__s.norm").alias(f"__{out_id}_n"),
        F.explode("__s.lists").alias("__list_id"),
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


def jl_sign(seed: str, j: int, i: int) -> int:
    """±1 entry (j, i) of the Johnson-Lindenstrauss projection matrix,
    derived from the first hex digit of ``md5(seed:j:i)`` — md5 is the
    one hash both Spark and DuckDB expose identically (the portable-
    hash oracle trick), so the ORACLE can rebuild the exact matrix in
    SQL while the operator ships it as literals."""
    import hashlib

    return 1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    *,
    in_dim: int = 64,
    seed: str = "jl",
    scale: int = 1000,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a ±1
    (Achlioptas-style) projection: ``proj[j] = Σ_i sign(j,i) · q_i``
    over the quantized input ``q_i = floor(x_i·scale + 0.5)`` —
    ALL-INTEGER, so the result is exact and cross-engine hashable (no
    float accumulation order anywhere). Distances are preserved up to
    the JL distortion times the ``1/scale`` quantization error; the
    usual pipeline is project → ANN/cluster in out_dim ≪ in_dim.

    Shape at scale: the matrix is out_dim × in_dim literal ints baked
    into ONE projection expression per output coordinate — pure
    whole-stage codegen, zero Python, zero shuffle, no closure capture
    (a few KB of literals, not a broadcast). Emits (id, proj) with
    ``proj: array<bigint>`` of length ``out_dim``."""
    if out_dim <= 0 or in_dim <= 0:
        raise ValueError("out_dim and in_dim must be positive")
    # the whole projection is ONE F.expr over a generated SQL string.
    # Building it Column-by-Column looks equivalent but costs out_dim ×
    # in_dim py4j round trips for the literals alone — measured 4.8s of
    # DRIVER time at 16×64 before the first task launched (the bench
    # "slow query" that was really slow Python). One string, one parse.
    q = (
        f"transform(`{vec_col}`, x -> CAST(floor(CAST(x AS DOUBLE) * "
        f"{float(scale)!r} + 0.5) AS LONG))"
    )
    rows = ",".join(
        "array(" + ",".join(str(jl_sign(seed, j, i)) + "L" for i in range(in_dim)) + ")"
        for j in range(out_dim)
    )
    proj = (
        f"transform(array({rows}), row -> "
        f"aggregate(zip_with(__q, row, (x, s) -> x * s), 0L, (a, x) -> a + x))"
    )
    return df.select(F.col(id_col), F.expr(q).alias("__q")).select(
        F.col(id_col), F.expr(proj).alias("proj")
    )


def adaptive_index_size(df: DataFrame, floor: int = 8, cap: int = 262144) -> int:
    """Scale-adaptive centroid/cluster count: ~√n, floored and capped.

    A FIXED centroid count is the thing that breaks at 100×: 8 lists
    over 8 join keys is fine at bench scale and pure skew at 100 TB.
    √n keeps both the per-list size and the number of lists growing as
    √n (the classic IVF balance: probe cost ∝ n_centroids + n/n_centroids
    is minimized at √n). Costs one count() job — pass an explicit size
    to skip it (the entry queries do, so their oracles stay static).

    The cap rose 65,536 → 262,144 in round 7: centroids now reach
    executors as a SparkContext broadcast (``ivf_probe_assignments``
    transport), so the matrix no longer rides every task closure —
    262k × dim-64 float64 is ~134 MB broadcast once per executor, which
    covers √n up to n ≈ 7·10¹⁰ vectors (the SemDeDup ~100k-cluster
    regime included)."""
    import math

    n = df.count()
    return max(floor, min(cap, int(math.isqrt(max(n, 0)))))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int = 2,
    kmeans_iters: int = 0,
    sim_decimals: int | None = 2,
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

    ``n_centroids=None`` sizes the index to ~√(corpus) via
    :func:`adaptive_index_size` — the default that survives a 100×
    scale-up; pass an explicit count for reproducible-at-a-fixed-SF
    results (oracle queries do).
    """
    if n_centroids is None:
        n_centroids = adaptive_index_size(corpus)
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
    sim = (
        F.col("__cos") if sim_decimals is None else F.round(F.col("__cos"), sim_decimals)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", sim.alias("cosine_sim"))
    )


def _pair_dot_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(dtype="float64")
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return pair_dot


def _pair_dot(a: Column, b: Column) -> Column:
    """Row-wise Σ aᵢ·bᵢ, Arrow-batched (one einsum per batch). Same value
    as :func:`dot` up to float summation order — use in candidate-rerank
    hot paths where an interpreted per-element zip_with dominates."""
    return _pair_dot_udf()(a, b)


def _make_bucketize(dim: int, num_planes: int, num_tables: int):
    """Arrow-batched bucket computation for :func:`ann_topk_lsh`: every
    table's bucket key plus the l2 norm in ONE numpy matmul per batch.

    Why a Pandas UDF here when the rule is "stay JVM-side": the
    num_planes·num_tables hyperplane projections per vector are a dense
    (batch×dim)@(dim×planes) matrix product. Expressed as Catalyst
    higher-order functions that is planes separate interpreted
    `aggregate(zip_with(...))` passes whose literal-heavy trees cost
    more in ANALYSIS (~1.5s per plan build at 12 planes) than the whole
    query's execution; expressed here it is one fused BLAS call per
    Arrow batch. The exact-rerank dots stay JVM `zip_with` — only the
    index build crosses, once per row. Buckets are bit-identical to the
    interpreted :func:`lsh_bucket_key` (same md5 planes, float64 math;
    verified in tests)."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_hyperplane(dim, p) for p in range(num_planes * num_tables)], dtype=np.float64
    )
    weights = np.array([1 << p for p in range(num_planes)], dtype=np.int64)

    @pandas_udf("struct<norm:double,bkts:array<int>>")
    def bucketize(s: pd.Series) -> pd.DataFrame:
        if len(s) == 0:
            return pd.DataFrame({"norm": pd.Series(dtype="float64"), "bkts": []})
        mat = np.vstack(s.to_numpy()).astype(np.float64)
        proj = mat @ planes.T
        bits = (proj >= 0).astype(np.int64).reshape(len(mat), num_tables, num_planes)
        bkts = (bits * weights).sum(axis=2).astype(np.int32)
        return pd.DataFrame(
            {"norm": np.sqrt((mat * mat).sum(axis=1)), "bkts": list(bkts)}
        )

    return bucketize


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 1,
    num_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine rerank inside. Three knobs, the standard LSH trade:

      - ``num_planes`` (bits per table): fewer planes → bigger buckets →
        higher recall per table, more compute;
      - ``num_tables`` (independent hash tables, disjoint plane seeds):
        a close pair is found if it collides in ANY table, so recall
        amplifies as 1-(1-p^planes)^tables at tables× candidate cost;
      - ``num_probes`` (multi-probe): each QUERY additionally probes the
        buckets at Hamming distance 1 — bucket key XOR (1<<i) for the
        first ``num_probes`` bit positions. Per-table hit probability
        rises from p^b to p^b + num_probes·p^(b-1)(1-p) — the recall of
        many tables at the index cost of few, because ONLY the query
        side fans out. The corpus (the 100 TB side) still materializes
        exactly ``num_tables`` rows per vector; probing all H-1 buckets
        (``num_probes = num_planes``) makes probe ordering moot, which
        is why this implementation skips query-directed margin sorting.

    Both sides shuffle on the composite (table, bucket) key — hash
    equi-joins, never a cross join; a pair colliding in several
    (table, probe) slots is scored per collision and de-duplicated
    before ranking (the distinct shuffles 3 small columns — cheaper
    than re-joining vectors after an id-level distinct). bench.py
    tracks recall@5 against the exact answer each round."""
    if not 0 <= num_probes <= num_planes:
        raise ValueError(f"num_probes must be in [0, num_planes]; got {num_probes}")
    bucketize = _make_bucketize(dim, num_planes, num_tables)

    def keyed(df: DataFrame, out_id: str, vec_alias: str, norm_alias: str, probes: int) -> DataFrame:
        # All tables' bucket keys + the norm come from ONE Arrow-batched
        # matmul (see _make_bucketize); the probe fan-out below is pure
        # int XOR over the materialized bucket array — never a
        # re-projection of the planes×dim hyperplane dots per probe row.
        base = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(vec_alias),
            bucketize(F.col(vec_col)).alias("__s"),
        ).select(
            out_id,
            vec_alias,
            F.col("__s.norm").alias(norm_alias),
            F.col("__s.bkts").alias("__bkts"),
        )
        entries = F.flatten(
            F.transform(
                F.col("__bkts"),
                lambda bkt, t: F.array(
                    F.struct(t.cast("int").alias("tbl"), bkt.alias("bkt")),
                    *[
                        F.struct(
                            t.cast("int").alias("tbl"),
                            bkt.bitwiseXOR(F.lit(1 << i)).alias("bkt"),
                        )
                        for i in range(probes)
                    ],
                ),
            )
        )
        return base.select(
            out_id, vec_alias, norm_alias, F.explode(entries).alias("__tb")
        ).select(out_id, vec_alias, norm_alias, "__tb.tbl", "__tb.bkt")

    q = keyed(queries, "query_id", "__qv", "__qn", num_probes)
    c = keyed(corpus, "neighbor_id", "__cv", "__cn", 0)
    joined = q.join(c, ["tbl", "bkt"]).filter(F.col("query_id") != F.col("neighbor_id"))
    # one dot per collision — norms were computed once per row above; the
    # candidate dots are Arrow-batched for the same reason as the index
    # build (one einsum per batch vs an interpreted zip_with per pair)
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (
            _pair_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
        ).alias("__cos"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("__cos"), 2).alias("cosine_sim"))
    )


def quantize_vector(vec: Column, bits: int = 8) -> Column:
    """Symmetric per-vector integer quantization — the storage form for
    embedding columns at corpus scale (int8 is 4× smaller than float32
    and preserves cosine ranking to ~1e-2): scale = max|x| / (2^(b-1)-1),
    q_i = round(x_i / scale). Pure Column expressions (JVM higher-order
    functions, no UDF): returns struct(scale, q array<int>).

    Engine-portable: both engines divide the same doubles and round
    half-away-from-zero, so the int codes reproduce exactly (a zero
    vector quantizes to zeros via the epsilon guard, not NaN)."""
    qmax = (1 << (bits - 1)) - 1
    v = F.transform(vec, lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(float(qmax)),
        F.lit(1e-30),
    )
    return F.struct(
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("q"),
    )


def dequantize_vector(quant: Column) -> Column:
    """Inverse of :func:`quantize_vector`: x̂_i = q_i · scale."""
    return F.transform(
        quant["q"], lambda q: q.cast("double") * quant["scale"]
    )


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    k_codes: int,
    iters: int,
    dim: int,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: split the vector into ``m``
    contiguous subspaces of ``dim/m`` dims and train an independent
    ``k_codes``-centroid Lloyd codebook per subspace under the
    ``clustering`` rounding contract (deterministic lowest-id seeds,
    9dp-sim assignment ties to the lower code, 6dp centroid rounding —
    so any engine retrains the identical codebooks; equality with the
    naive per-subspace ``lloyd_centroids`` loop is pinned by test).

    All ``m`` subspaces train FUSED, not in an m-loop of separate jobs:
    one seed collect (the k lowest-id vectors, sliced driver-side), and
    per Lloyd iteration ONE Arrow assign stage producing all m codes
    plus ONE (subspace, code) groupBy for the means — 2 jobs/iter
    instead of 3m (measured at m=16: halves the pq_topk entry's
    wall-clock, 32s → 16s for the full oracle compare).
    The mean shuffle is n·m tiny rows with map-side partials; driver
    traffic per iter is m·k_codes rows — design parameters, never
    corpus-sized."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    if k_codes <= 0 or iters < 0:
        raise ValueError("need k_codes > 0 and iters >= 0")
    d = dim // m
    seed_rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k_codes)
        .collect()
    )
    if len(seed_rows) < k_codes:
        # callers (and the unrolled DuckDB oracle) assume exactly
        # k_codes entries per subspace; training silently-smaller
        # codebooks from a short corpus would desync them
        raise ValueError(
            f"corpus has only {len(seed_rows)} rows; need >= k_codes={k_codes} "
            "to seed the codebooks (lower k_codes or grow the corpus)"
        )
    books = [
        [
            (rank, [float(x) for x in r["v"]][s * d : (s + 1) * d])
            for rank, r in enumerate(seed_rows)
        ]
        for s in range(m)
    ]
    if iters == 0:
        return books
    from .clustering import CENTROID_DECIMALS

    subs = F.array(
        *[F.slice(F.col(vec_col), s * d + 1, d) for s in range(m)]
    )
    for _ in range(iters):
        encode = _pq_encode(books, d)
        exploded = (
            corpus.select(encode(F.col(vec_col)).alias("__codes"), subs.alias("__subs"))
            .select("__codes", F.posexplode("__subs").alias("__s", "__sv"))
            .select(
                "__s",
                F.get("__codes", F.col("__s")).alias("__c"),
                "__sv",
            )
        )
        means = (
            exploded.groupBy("__s", "__c")
            .agg(
                *[
                    F.round(
                        F.avg(F.element_at(F.col("__sv"), i + 1).cast("double")),
                        CENTROID_DECIMALS,
                    ).alias(f"d{i}")
                    for i in range(d)
                ]
            )
            .collect()  # ≤ m·k_codes rows
        )
        new = {
            (int(r["__s"]), int(r["__c"])): [float(r[f"d{i}"]) for i in range(d)]
            for r in means
        }
        # empty codes keep their previous centroid (contract, mirrored)
        books = [
            [(cid, new.get((s, cid), vec)) for cid, vec in books[s]] for s in range(m)
        ]
    return books


def _pq_encode(books: list[list[tuple[int, list[float]]]], d: int):
    """Arrow-batched PQ encoder: all ``m`` subspace codes in one numpy
    pass per batch (same shape as the k-means assign stage — rounded
    cosine argmax per subspace, ties to the lower code id)."""
    from pyspark.sql.functions import pandas_udf

    from .clustering import SIM_DECIMALS

    mats, norm_list = [], []
    for cents in books:
        cids = np.array([c for c, _ in cents])
        order = np.argsort(cids, kind="stable")
        cmat = np.array([[float(x) for x in v] for _, v in cents], dtype=np.float64)[order]
        cn = np.sqrt((cmat * cmat).sum(axis=1))
        cn[cn == 0.0] = 1.0
        mats.append(cmat)
        norm_list.append(cn)

    @pandas_udf("array<int>")
    def encode(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series(dtype="object")
        mat = np.vstack(s.to_numpy()).astype(np.float64)
        codes = np.empty((mat.shape[0], len(mats)), dtype=np.int32)
        for i, (cmat, cn) in enumerate(zip(mats, norm_list)):
            sub = mat[:, i * d : (i + 1) * d]
            sn = np.sqrt((sub * sub).sum(axis=1))
            sn[sn == 0.0] = 1.0
            sim = np.round((sub @ cmat.T) / (sn[:, None] * cn[None, :]), SIM_DECIMALS)
            codes[:, i] = np.argsort(-sim, axis=1, kind="stable")[:, 0]
        return pd.Series(list(codes))

    return encode


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 1,
    shortlist: int = 20,
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) shortlist
    + exact rerank — the memory-bound scale path: the corpus is stored
    as ``m`` small int codes per vector (m·log2(k_codes) bits, e.g. 4
    bytes for 64 float dims here), and query scoring never touches raw
    corpus vectors until the final ``shortlist``-bounded rerank.

    Plan shape, stage by stage:
      1. codebook train — m small Lloyd jobs (driver traffic =
         m·k_codes rows/iter, a design parameter);
      2. encode — ONE Arrow map stage over the corpus (no shuffle), all
         m codes per batch in numpy;
      3. ADC tables — each query computes its m×k_codes dot-product
         lookup table ONCE against the codebook literal (a per-QUERY
         cost, k_codes·dim multiplies — independent of corpus size);
      4. score — broadcast the (tiny) query+table side over the codes:
         per pair just m ARRAY LOOKUPS + adds (``element_at`` chain),
         not a dim-wide dot — this is why PQ wins at 100 TB: the scan
         reads 4-byte codes and does m adds per candidate;
      5. exact rerank of the ADC top-``shortlist`` only.

    Determinism contract (strict oracle): codes via 9dp-rounded cosine
    argmax (tie → lower code), ADC entries rounded 9dp and summed in
    fixed subspace order, shortlist cut by (est DESC, id) row_number,
    final rank by exact cosine with id tie-break."""
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("dd")).first()
    if dim_row is None:
        raise ValueError("empty corpus")
    dim = dim_row["dd"]
    d = dim // m
    books = pq_train_codebooks(corpus, id_col, vec_col, m, k_codes, iters, dim)
    # --- encode the corpus: (neighbor_id, codes[m]) --------------------
    encode = _pq_encode(books, d)
    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("__codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        _adc_tables(F.col(vec_col), books, d).alias("__dtabs"),
    )
    # --- ADC scoring: m lookups + adds per (query, corpus-code) pair ---
    pairs = F.broadcast(q).crossJoin(codes).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w_est = Window.partitionBy("query_id").orderBy(
        F.col("__est").desc(), F.col("neighbor_id").asc()
    )
    short = (
        pairs.withColumn("__est", _adc_est(m))
        .withColumn("__srank", F.row_number().over(w_est))
        .filter(F.col("__srank") <= shortlist)
        .select("query_id", "neighbor_id", "__qv", "__qn")
    )
    # --- exact rerank inside the shortlist only ------------------------
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    rer = short.join(cvecs, "neighbor_id").withColumn(
        "__cos", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    return _rank_topk(rer, k)


def _adc_tables(vec: Column, books, d: int) -> Column:
    """Per-query ADC lookup tables: array of m arrays, entry [s][c] =
    round(dot(query_subvec_s, codebook_s[c]), 9). Computed ONCE per
    query against the codebook literal — k_codes·dim multiplies,
    independent of corpus size. books[s] is already ordered
    0..k_codes-1 (lloyd relabels seeds)."""
    m = len(books)
    book_lit = F.lit([[list(map(float, v)) for _, v in sorted(bk)] for bk in books])
    qsub = [F.slice(vec, s * d + 1, d) for s in range(m)]

    def _dtab(s: int) -> Column:
        # factory-bound s: a loop-local lambda default would be read by
        # F.transform as the (element, index) two-arg form
        return F.transform(
            F.element_at(book_lit, s + 1), lambda c: F.round(dot(qsub[s], c), 9)
        )

    return F.array(*[_dtab(s) for s in range(m)])


def _adc_est(m: int) -> Column:
    """Estimated similarity from __dtabs + __codes: m array lookups
    summed in fixed subspace order (left-assoc — the oracle writes the
    same dd0+dd1+… chain, so the IEEE sums agree bit-for-bit)."""
    est = None
    for s in range(m):
        term = F.element_at(
            F.element_at(F.col("__dtabs"), s + 1),
            F.element_at(F.col("__codes"), s + 1) + F.lit(1),
        )
        est = term if est is None else est + term
    return est


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared tail of every ANN path: rank by exact __cos (id
    tie-break), keep top-k, standard output columns."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round(F.col("__cos"), 2).alias("cosine_sim")
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 1,
    shortlist: int = 50,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ: the production-composed ANN path — IVF coarse lists
    restrict WHICH codes each query scores, PQ codes make scoring a
    candidate cost m array lookups instead of a dim-wide dot, and only
    the ADC top-``shortlist`` pays an exact rerank. At 100 TB this is
    the shape real vector stores run: the scan touches 16-byte codes of
    ~n_probe/n_centroids of the corpus, raw vectors only for
    shortlist·|queries| rows.

    ``residual=True`` is the full published IVFADC recipe: codebooks
    quantize the residual v − coarse_centroid(v) (global codebooks, as
    in the original formulation), and the estimator decomposes as
    dot(q, c_list) + Σ_s dot(q_s, residual_codeword_s). The per-(query,
    probed-list) term is computed ONCE on the ≤ n_probe assignment rows
    — candidate scoring stays m array lookups + adds. Residuals
    concentrate around the origin, so the same k_codes budget spends its
    resolution where the mass is — worth measuring per corpus (the
    sidecar does).

    Both stages are deterministic (coarse assignment = stable argsort
    on unrounded sims exactly like ``ivf_topk``; residual subtraction is
    exact double arithmetic; PQ under the rounding contract), so the
    whole composition carries a strict oracle either way."""
    cents = [
        (r[0], r[1])
        for r in corpus.select(id_col, vec_col).orderBy(F.col(id_col)).limit(n_centroids).collect()
    ]
    c_assign = ivf_probe_assignments(corpus, cents, id_col, vec_col, 1, "neighbor_id")
    q_assign = ivf_probe_assignments(queries, cents, id_col, vec_col, n_probe, "query_id")
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("dd")).first()
    if dim_row is None:
        raise ValueError("empty corpus")
    dim = dim_row["dd"]
    d = dim // m
    if residual:
        # coarse centroid by list id, as one map literal (n_centroids·dim
        # floats — a design parameter)
        cmap = F.map_from_arrays(
            F.lit([int(cid) for cid, _ in cents]),
            F.lit([[float(x) for x in vec] for _, vec in cents]),
        )
        res_vec = F.zip_with(
            F.col("__train_v"),
            F.element_at(cmap, F.col("__list_id")),
            lambda a, b: a.cast("double") - b,
        )
        train_src = c_assign.select(
            F.col("neighbor_id").alias(id_col),
            F.col("__neighbor_id_v").alias("__train_v"),
            "__list_id",
        ).select(F.col(id_col), res_vec.alias("__train_vec"))
        books = pq_train_codebooks(train_src, id_col, "__train_vec", m, k_codes, iters, dim)
        codes = train_src.select(
            F.col(id_col).alias("neighbor_id"),
            _pq_encode(books, d)(F.col("__train_vec")).alias("__codes"),
        )
        # per-(query, probed list) additive term dot(q, c_list), rounded
        # like the ADC table entries and leading the fixed sum order
        qc = F.round(
            dot(F.col("__query_id_v"), F.element_at(cmap, F.col("__list_id"))), 9
        )
        q_assign = q_assign.withColumn("__qc", qc)
        est_col = F.col("__qc") + _adc_est(m)
    else:
        books = pq_train_codebooks(corpus, id_col, vec_col, m, k_codes, iters, dim)
        codes = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _pq_encode(books, d)(F.col(vec_col)).alias("__codes"),
        )
        est_col = _adc_est(m)
    q_tab = q_assign.withColumn(
        "__dtabs", _adc_tables(F.col("__query_id_v"), books, d)
    )
    cands = (
        q_tab.join(c_assign, "__list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(codes, "neighbor_id")
    )
    w_est = Window.partitionBy("query_id").orderBy(
        F.col("__est").desc(), F.col("neighbor_id").asc()
    )
    short = (
        cands.withColumn("__est", est_col)
        .withColumn("__srank", F.row_number().over(w_est))
        .filter(F.col("__srank") <= shortlist)
    )
    # vectors + norms already rode along on both assignment sides — the
    # rerank needs no join back to the corpus
    rer = short.withColumn(
        "__cos",
        dot(F.col("__query_id_v"), F.col("__neighbor_id_v"))
        / (F.col("__query_id_n") * F.col("__neighbor_id_n")),
    )
    return _rank_topk(rer, k)
