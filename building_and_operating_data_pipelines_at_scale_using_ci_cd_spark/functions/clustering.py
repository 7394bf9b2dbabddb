"""DataFrame-only k-means (Lloyd's algorithm) over an embedding column —
the clustering primitive behind corpus bucketing, SemDeDup-style
semantic grouping, and IVF index builds, expressed without MLlib so the
whole loop stays on the DataFrame API and any SQL engine can replay it.

Scale shape (mirrors :func:`..functions.similarity.kmeans_refine`, which
refines IVF lists with the same loop):
  - ASSIGN is a pure Arrow-batched map stage — one numpy matmul per
    batch against the (k × dim) centroid matrix; no shuffle, no explode.
  - UPDATE is one groupBy(cluster) with per-dimension averages (map-side
    partial agg); driver traffic per iteration is exactly k rows — a
    design parameter, never a function of corpus size. The aggregate is
    ``dim`` expressions wide — fine through the embedding sizes here
    (64) and typical (≤2k); for very high-dim vectors switch the update
    to posexplode → groupBy(cluster, pos) to trade Catalyst expression
    width for an (n·dim)-row shuffle.
  - iterations are a fixed count, so the job graph is static.

Cross-engine determinism (what makes a strict value-hash oracle possible
for an iterative float algorithm):
  - similarities are ROUNDED to 9 decimals before the argmax, ties break
    toward the LOWER centroid id — a last-ulp libm difference between
    engines can no longer flip an assignment;
  - updated centroids are ROUNDED to 6 decimals, so the engines'
    different summation orders (both within 1e-12 of the true mean)
    collapse to identical bits before the next iteration amplifies them;
  - empty clusters keep their previous centroid (documented, mirrored).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimals kept when rounding similarities before argmax / centroids
#: between iterations — the cross-engine reproducibility contract
SIM_DECIMALS = 9
CENTROID_DECIMALS = 6


def _assign_clusters(
    df: DataFrame, cents: list[tuple[int, list[float]]], id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment by rounded cosine similarity: a pure
    Arrow map stage (see module docstring). Returns (id, vec, cluster)."""
    from pyspark.sql.functions import pandas_udf

    cids = np.array([int(c) for c, _ in cents], dtype=np.int64)
    order = np.argsort(cids, kind="stable")
    cids_s = cids[order]
    cmat = np.array([[float(x) for x in v] for _, v in cents], dtype=np.float64)[order]
    cnorms = np.sqrt((cmat * cmat).sum(axis=1))
    cnorms[cnorms == 0.0] = 1.0

    @pandas_udf("int")
    def assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series(dtype="int32")
        mat = np.vstack(s.to_numpy()).astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sim = np.round((mat @ cmat.T) / (norms[:, None] * cnorms[None, :]), SIM_DECIMALS)
        # stable argsort on -sim: equal (rounded) sims resolve to the
        # lower centroid id, exactly like the oracle's ORDER BY cid
        best = np.argsort(-sim, axis=1, kind="stable")[:, 0]
        return pd.Series(cids_s[best].astype(np.int32))

    return df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        assign(F.col(vec_col)).alias("cluster"),
    )


def lloyd_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
) -> list[tuple[int, list[float]]]:
    """The Lloyd training loop alone: deterministic lowest-id seeds
    relabeled 0..k-1, then ``iters`` assign → mean-update rounds under
    the module's rounding contract. Returns the trained centroid list —
    the piece product-quantization codebook training
    (``similarity.pq_topk``) shares with :func:`kmeans_fit_predict`."""
    if k <= 0 or iters < 0:
        raise ValueError("need k > 0 and iters >= 0")
    seed_rows = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("empty input")
    # relabel seeds 0..k-1 (ascending id) so cluster ids are dense
    cents = [
        (rank, [float(x) for x in r["v"]]) for rank, r in enumerate(seed_rows)
    ]
    # the seeds carry the vectors, so the dimensionality comes for free —
    # a separate size() probe job (the former first()) was pure overhead
    dim = len(seed_rows[0]["v"])
    for _ in range(iters):
        assigned = _assign_clusters(df, cents, id_col, vec_col)
        means = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.round(
                        F.avg(F.element_at(F.col("__v"), i + 1).cast("double")),
                        CENTROID_DECIMALS,
                    ).alias(f"d{i}")
                    for i in range(dim)
                ]
            )
            .collect()  # exactly k rows — bounded by the design parameter
        )
        new = {int(r["cluster"]): [float(r[f"d{i}"]) for i in range(dim)] for r in means}
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return cents


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | None = 8,
    iters: int = 3,
) -> DataFrame:
    """Lloyd's k-means with deterministic seeding: initial centroids are
    the ``k`` lowest-id vectors (reproducible, no RNG), then ``iters``
    rounds of assign → mean-update. Returns one row per input vector:
    (id, cluster) with cluster relabeled 0..k-1 by ascending seed id.

    ``k=None`` sizes adaptively (~√n via
    :func:`..functions.similarity.adaptive_index_size` — the same
    scale-with-the-corpus default IVF and SemDeDup use); entry queries
    pass explicit k so their oracles stay static."""
    if k is None:
        from .similarity import adaptive_index_size

        k = adaptive_index_size(df)
    cents = lloyd_centroids(df, id_col, vec_col, k, iters)
    final = _assign_clusters(df, cents, id_col, vec_col)
    return final.select(F.col("__id").alias(id_col), "cluster")
