"""Product-quantization ANN (functions/similarity.py pq_topk): output
contract, shortlist behavior, and recall on data where subspace
structure makes PQ near-exact."""

import pytest

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
    pq_topk,
    pq_train_codebooks,
    topk_neighbors,
)


@pytest.fixture(scope="module")
def vecs(spark):
    # 8 well-separated direction clusters in 8-dim space, 10 vectors each:
    # cluster c points mostly along axis c with a small deterministic wobble
    rows = []
    for c in range(8):
        for j in range(10):
            v = [0.05 * ((c * 10 + j) % 3) for _ in range(8)]
            v[c] = 1.0 + 0.01 * j
            rows.append((c * 10 + j, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_pq_output_contract(spark, vecs):
    q = vecs.filter(F.col("vec_id") % 20 == 0)
    out = pq_topk(q, vecs, "vec_id", "embedding", k=3, m=2, k_codes=4, iters=1, shortlist=10)
    rows = out.collect()
    assert out.columns == ["query_id", "neighbor_id", "rank", "cosine_sim"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["neighbor_id"]
    for qid, rs in per_q.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        sims = [x["cosine_sim"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_pq_recall_on_clustered_data(spark, vecs):
    # a full-corpus shortlist makes the pipeline provably lossless: the
    # exact rerank must then reproduce the brute-force answer EXACTLY
    # (same tie-break), catching any wiring bug in encode/ADC/shortlist/
    # rerank. (This fixture is pathologically tie-heavy — many exact
    # cosines are 1.0 — so partial-shortlist recall is tie-ordering
    # luck, not signal; QUALITY evidence is the bench recall sidecar at
    # sf0.1: 0.945 with k_codes=32/shortlist=100 over 2000 uniform
    # vectors.)
    q = vecs.filter(F.col("vec_id") % 20 == 0)
    exact = topk_neighbors(q, vecs, "vec_id", "embedding", k=3).collect()
    approx = pq_topk(
        q, vecs, "vec_id", "embedding", k=3, m=2, k_codes=8, iters=2, shortlist=80
    ).collect()
    t, g = {}, {}
    for r in exact:
        t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        g.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert t == g


def test_pq_shortlist_caps_rerank(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    # k > shortlist: output is capped by the shortlist, not k
    out = pq_topk(q, vecs, "vec_id", "embedding", k=50, m=2, k_codes=4, iters=0, shortlist=5)
    assert out.count() == 5


def test_pq_codebooks_shape_and_determinism(spark, vecs):
    books = pq_train_codebooks(vecs, "vec_id", "embedding", m=4, k_codes=4, iters=1, dim=8)
    assert len(books) == 4
    for bk in books:
        assert [cid for cid, _ in bk] == [0, 1, 2, 3]
        assert all(len(v) == 2 for _, v in bk)
    again = pq_train_codebooks(vecs, "vec_id", "embedding", m=4, k_codes=4, iters=1, dim=8)
    assert books == again  # deterministic: same seeds, same rounding
    with pytest.raises(ValueError):
        pq_train_codebooks(vecs, "vec_id", "embedding", m=3, k_codes=4, iters=1, dim=8)


def test_ivfpq_full_probe_equals_pq(spark, vecs):
    # probing EVERY coarse list with an uncapped shortlist makes IVF-PQ's
    # candidate set the whole corpus — output must equal plain pq_topk
    # (same codes, same ADC tables, same rerank); this pins the coarse
    # restriction as the ONLY thing IVF adds
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ivfpq_topk,
    )

    q = vecs.filter(F.col("vec_id") % 20 == 0)
    a = sorted(
        map(
            tuple,
            ivfpq_topk(
                q, vecs, "vec_id", "embedding", k=3, n_centroids=4, n_probe=4,
                m=2, k_codes=4, iters=1, shortlist=100,
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pq_topk(
                q, vecs, "vec_id", "embedding", k=3, m=2, k_codes=4, iters=1, shortlist=100
            ).collect(),
        )
    )
    assert a == b


def test_ivfpq_restricts_candidates(spark, vecs):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ivfpq_topk,
    )

    q = vecs.filter(F.col("vec_id") == 0)
    out = ivfpq_topk(
        q, vecs, "vec_id", "embedding", k=50, n_centroids=8, n_probe=1,
        m=2, k_codes=4, iters=0, shortlist=1000,
    )
    # probing 1 of 8 lists: the candidate pool (= output at huge k) must
    # be a strict subset of the corpus
    n = out.count()
    assert 0 < n < 79


def test_ivfpq_residual_mode_contract(spark, vecs):
    # residual IVFADC: same output contract, deterministic across runs,
    # candidate restriction still applies. (Quality at sf0.1 measured in
    # ROUND6_NOTES: residual 0.705 vs raw 0.80 on uniform vectors — raw
    # stays the default; residuals win when coarse cells carry real
    # structure to subtract.)
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ivfpq_topk,
    )

    q = vecs.filter(F.col("vec_id") % 20 == 0)

    def run():
        return sorted(
            map(
                tuple,
                ivfpq_topk(
                    q, vecs, "vec_id", "embedding", k=3, n_centroids=4, n_probe=2,
                    m=2, k_codes=4, iters=1, shortlist=20, residual=True,
                ).collect(),
            )
        )

    a = run()
    assert a == run()  # deterministic
    assert 0 < len(a) <= 4 * 3
    assert all(r[0] != r[1] for r in a)


def test_pq_fused_training_equals_per_subspace_lloyd(spark, vecs):
    # the fused trainer (one assign stage + one grouped mean per iter)
    # must produce BIT-IDENTICAL codebooks to running lloyd_centroids
    # independently per sliced subspace — this is what keeps the DuckDB
    # oracle's per-subspace unroll valid
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.clustering import (
        lloyd_centroids,
    )

    m, kc, it, dim = 4, 4, 2, 8
    d = dim // m
    fused = pq_train_codebooks(vecs, "vec_id", "embedding", m=m, k_codes=kc, iters=it, dim=dim)
    for s in range(m):
        sub = vecs.select(
            "vec_id", F.slice(F.col("embedding"), s * d + 1, d).alias("__sub")
        )
        naive = lloyd_centroids(sub, "vec_id", "__sub", kc, it)
        assert fused[s] == naive, f"subspace {s}"
