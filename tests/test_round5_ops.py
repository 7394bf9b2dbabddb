"""Round-5 operators: semantic dedup, bloom incremental dedup, domain-mix
sampling, unigram LM scoring, and the BPE tokenizer."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.bpe import (
    EOW,
    bpe_apply,
    bpe_encode_kernel,
    bpe_train,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
    unigram_cross_entropy,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
    bloom_incremental_new,
    semantic_dedup_keep,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
    domain_mix_sample,
)


# -- semantic dedup ---------------------------------------------------------


def test_semantic_dedup_drops_planted_near_dups(spark):
    # two tight groups along axes e0/e1 + one isolated vector; centroids
    # are the 2 lowest-id vectors, so the groups land in separate clusters
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.999, 0.04, 0.0]),   # ~dup of 1
        (4, [0.0, 0.999, 0.04]),   # ~dup of 2
        (5, [0.0, 0.0, 1.0]),      # isolated (assigned somewhere, kept)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup_keep(df, "vec_id", "embedding", n_clusters=2, threshold=0.95)
    kept_ids = sorted(r["kept_id"] for r in kept.collect())
    assert kept_ids == [1, 2, 5]


def test_semantic_dedup_chain_collapses_to_lowest_id(spark):
    # 1~2 and 2~3 similar, 1~3 also similar within one cluster: keep only 1
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.99, 0.14]),
        (3, [0.97, 0.24]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup_keep(df, "vec_id", "embedding", n_clusters=1, threshold=0.9)
    assert sorted(r["kept_id"] for r in kept.collect()) == [1]


def test_semantic_dedup_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup_keep(df, "vec_id", "embedding").count() == 0


# -- bloom incremental dedup ------------------------------------------------


def test_bloom_incremental_equals_exact_anti_join(spark, tables):
    docs = spark.table("documents").withColumn("fp", F.substring("text", 1, 30))
    new = docs.filter(F.col("doc_id") % 3 == 0)
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    got = sorted(r["doc_id"] for r in bloom_incremental_new(new, hist, "fp").collect())
    expected = sorted(
        r["doc_id"]
        for r in new.join(
            hist.select(F.col("fp").alias("__h")), new["fp"] == F.col("__h"), "left_anti"
        ).collect()
    )
    assert got == expected


def test_bloom_filters_known_duplicates(spark):
    hist = spark.createDataFrame([(i, f"text-{i}") for i in range(100)], "id long, t string")
    new = spark.createDataFrame(
        [(200, "text-5"), (201, "text-42"), (202, "brand new")], "id long, t string"
    )
    out = bloom_incremental_new(new, hist, "t").collect()
    assert [r["id"] for r in out] == [202]


# -- domain mix sampling ----------------------------------------------------


def test_domain_mix_exact_ratio(spark, tables):
    docs = spark.table("documents")
    out = domain_mix_sample(docs, "source", {"src0": 3, "src1": 2, "src2": 1}, "doc_id")
    counts = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) <= {"src0", "src1", "src2"}
    k = counts["src2"]
    assert counts["src0"] == 3 * k and counts["src1"] == 2 * k and k > 0
    # scarcest stratum bound: src strata each have 25 docs at sf0.001
    per = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert k == min(per["src0"] // 3, per["src1"] // 2, per["src2"])


def test_domain_mix_deterministic_and_validates(spark, tables):
    docs = spark.table("documents")
    a = sorted(r["doc_id"] for r in domain_mix_sample(docs, "source", {"src0": 1, "src1": 1}, "doc_id", seed=3).collect())
    b = sorted(r["doc_id"] for r in domain_mix_sample(docs, "source", {"src0": 1, "src1": 1}, "doc_id", seed=3).collect())
    assert a == b
    with pytest.raises(ValueError):
        domain_mix_sample(docs, "source", {"src0": 0}, "doc_id")


# -- unigram LM scoring -----------------------------------------------------


def test_unigram_cross_entropy_hand_computed(spark):
    import math

    # corpus: "a a b" / "a c" → counts a=3 b=1 c=1, total=5
    df = spark.createDataFrame([(1, "a a b"), (2, "a c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_cross_entropy(df, "doc_id", "text").collect()}
    h1 = -(2 * math.log2(3 / 5) + math.log2(1 / 5)) / 3
    h2 = -(math.log2(3 / 5) + math.log2(1 / 5)) / 2
    assert got[1]["n_tokens"] == 3 and got[1]["cross_entropy"] == round(h1, 4)
    assert got[2]["n_tokens"] == 2 and got[2]["cross_entropy"] == round(h2, 4)


def test_unigram_cross_entropy_rare_tokens_score_higher(spark, tables):
    out = unigram_cross_entropy(spark.table("documents"), "doc_id", "text")
    stats = out.agg(F.min("cross_entropy"), F.max("cross_entropy")).first()
    assert stats[0] > 0 and stats[1] > stats[0]


# -- BPE --------------------------------------------------------------------


def test_bpe_train_learns_expected_first_merge(spark):
    # "aaab aaab aaab ab" → most frequent pair is (a, a)
    df = spark.createDataFrame([(1, "aaab aaab aaab ab")], "id long, text string")
    merges = bpe_train(df, "text", n_merges=2)
    assert merges[0] == ("a", "a")
    assert len(merges) == 2


def test_bpe_encode_kernel_greedy_rank_order():
    merges = [("a", "a"), ("aa", "b"), ("b", EOW)]
    enc = bpe_encode_kernel(merges)
    # rank-0 merge applies first: aab -> (aa)b -> aab</w> via rank-1 then EOW stays
    assert enc("aab") == ["aab", EOW]
    assert enc("ab") == ["a", "b" + EOW]  # no (a,b) merge learned; (b,</w>) applies
    assert enc("") == [EOW]


def test_bpe_apply_roundtrip_token_concat(spark, tables):
    docs = spark.table("documents").limit(50)
    merges = bpe_train(docs, "text", n_merges=8)
    out = bpe_apply(docs, "doc_id", "text", merges)
    row = out.first()
    assert row["n_tokens"] == len(row["tokens"])
    # detokenization invariant: stripping EOW markers reconstructs the
    # lowercased alnum word stream
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    import re

    for r in out.collect():
        words_from_tokens = "".join(r["tokens"]).replace(EOW, " ").split()
        expected = re.findall(r"[a-z0-9]+", src[r["doc_id"]].lower())
        assert words_from_tokens == expected


def test_bpe_train_rejects_negative(spark, tables):
    with pytest.raises(ValueError):
        bpe_train(spark.table("documents"), "text", n_merges=-1)


# -- multi-table LSH --------------------------------------------------------


def test_ann_multi_table_recall_dominates_single_table(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ann_topk_lsh,
        topk_neighbors,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_neighbors(q, emb, "vec_id", "embedding", k=5).collect()
    }

    def recall(num_tables):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(
                q, emb, "vec_id", "embedding", dim=64, k=5,
                num_planes=4, num_tables=num_tables,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r4 = recall(1), recall(4)
    # collision in ANY table keeps a pair: candidate set only grows,
    # and exact rerank means recall is monotone in num_tables
    assert r4 >= r1
    assert r4 > 0


def test_ann_multi_table_no_duplicate_pairs(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ann_topk_lsh,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    out = ann_topk_lsh(q, emb, "vec_id", "embedding", dim=64, k=5, num_planes=3, num_tables=3)
    rows = out.collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
    # cross-table collisions must be de-duplicated before ranking
    assert len(pairs) == len(set(pairs))
    ranks = {}
    for r in rows:
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    for qid, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


# -- logistic-regression classifier -----------------------------------------


def test_logreg_learns_separable_data(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.classifier import (
        logreg_score,
        logreg_train,
    )

    # y = 1 iff x1 > 0.5, perfectly separable on one feature
    rows = [(float(i % 10) / 10.0,) for i in range(100)]
    df = spark.createDataFrame(rows, "x1 double").selectExpr(
        "array(1.0, x1) AS x", "CAST(x1 > 0.5 AS INT) AS y"
    )
    w = logreg_train(df, "x", "y", dim=2, iters=40, lr=4.0)
    scored = df.withColumn("p", logreg_score(F.col("x"), w))
    acc = scored.selectExpr("AVG(CAST((p > 0.5) = (y = 1) AS DOUBLE))").first()[0]
    assert acc >= 0.95
    assert w[1] > 0  # positive slope on the separating feature


def test_logreg_score_is_projection_and_bounded(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.classifier import (
        logreg_score,
        text_feature_vector,
    )

    docs = spark.table("documents")
    scored = docs.select(
        logreg_score(text_feature_vector(F.col("text")), [0.1, -0.2, 0.3, 0.4, -0.5]).alias("p")
    )
    stats = scored.agg(F.min("p"), F.max("p")).first()
    assert 0.0 < stats[0] and stats[1] < 1.0
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow map stage


def test_logreg_train_validates(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.classifier import (
        logreg_train,
    )

    df = spark.table("documents").selectExpr("array(1.0) AS x", "1 AS y")
    with pytest.raises(ValueError):
        logreg_train(df, "x", "y", dim=1, iters=-1)
    assert logreg_train(df, "x", "y", dim=1, iters=0) == [0.0]


def test_bigram_cross_entropy_hand_computed(spark):
    import math

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
        bigram_cross_entropy,
    )

    # corpus "a b a b" + "a a": bigrams (a,b)x2 (b,a)x1 (a,a)x1;
    # ctx a=3 b=1; uni a=4 b=2, total 6
    df = spark.createDataFrame([(1, "a b a b"), (2, "a a")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_cross_entropy(df, "doc_id", "text", lam=0.5).collect()}
    p_ab = 0.5 * 2 / 3 + 0.5 * 2 / 6
    p_ba = 0.5 * 1 / 1 + 0.5 * 4 / 6
    p_aa = 0.5 * 1 / 3 + 0.5 * 4 / 6
    h1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    h2 = -math.log2(p_aa)
    assert out[1]["n_bigrams"] == 3 and out[1]["bigram_cross_entropy"] == round(h1, 4)
    assert out[2]["n_bigrams"] == 1 and out[2]["bigram_cross_entropy"] == round(h2, 4)
    # single-token and empty docs carry no transitions: excluded
    df2 = spark.createDataFrame([(3, "solo"), (4, "")], "doc_id long, text string")
    assert bigram_cross_entropy(df2, "doc_id", "text").count() == 0
    with pytest.raises(ValueError):
        bigram_cross_entropy(df, "doc_id", "text", lam=1.5)


def test_semantic_dedup_refine_iters_keeps_invariants(spark, tables):
    emb = spark.table("embeddings")
    base = semantic_dedup_keep(emb, "vec_id", "embedding", n_clusters=4, threshold=0.3)
    refined = semantic_dedup_keep(
        emb, "vec_id", "embedding", n_clusters=4, threshold=0.3, refine_iters=1
    )
    n = emb.count()
    assert 0 < refined.count() <= n and 0 < base.count() <= n
    # kept ids are a subset of the corpus either way
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert {r["kept_id"] for r in refined.collect()} <= ids


# -- multi-probe LSH (round 6) ----------------------------------------------


def test_ann_multiprobe_recall_dominates_no_probe(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ann_topk_lsh,
        topk_neighbors,
    )

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_neighbors(q, emb, "vec_id", "embedding", k=5).collect()
    }

    def recall(num_probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(
                q, emb, "vec_id", "embedding", dim=64, k=5,
                num_planes=4, num_tables=2, num_probes=num_probes,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r4 = recall(0), recall(4)
    # probing adds buckets on the query side only: the candidate set can
    # only grow, and exact rerank keeps recall monotone in num_probes
    assert r4 >= r0
    assert r4 > 0


def test_ann_multiprobe_rejects_bad_probe_count(spark, tables):
    import pytest as _pytest

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        ann_topk_lsh,
    )

    emb = spark.table("embeddings")
    with _pytest.raises(ValueError):
        ann_topk_lsh(emb, emb, "vec_id", "embedding", dim=64, num_planes=4, num_probes=5)


def test_arrow_bucketize_matches_interpreted_lsh_bucket_key(spark, tables):
    """The Arrow matmul index build must produce bit-identical buckets to
    the interpreted Catalyst lsh_bucket_key path (same md5 planes, same
    float64 math) — this is what keeps the DuckDB oracle valid."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
        _make_bucketize,
        lsh_bucket_key,
    )

    emb = spark.table("embeddings")
    B, T = 4, 3
    hof = {
        r["vec_id"]: tuple(r[f"b{t}"] for t in range(T))
        for r in emb.select(
            "vec_id",
            *[
                lsh_bucket_key(F.col("embedding"), 64, B, plane_offset=t * B).alias(f"b{t}")
                for t in range(T)
            ],
        ).collect()
    }
    bucketize = _make_bucketize(64, B, T)
    arrow = {
        r["vec_id"]: tuple(r["s"]["bkts"])
        for r in emb.select("vec_id", bucketize(F.col("embedding")).alias("s")).collect()
    }
    assert hof == arrow
