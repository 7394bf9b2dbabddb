"""Round-6 late additions: TF-IDF, inverted index, weighted priority
sampling, exact n-gram Jaccard join, DataFrame-only k-means."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.clustering import (
    kmeans_fit_predict,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.indexing import (
    inverted_index,
    tfidf_top_terms,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
    weighted_priority_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "entirely different words compose this sentence here now"),
        (5, "singleword"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestTfidf:
    def test_rank_window_and_counts(self, docs):
        out = tfidf_top_terms(docs, "doc_id", "text", top_n=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # every non-empty doc contributes at most top_n rows, rank 1..n
        for doc_id, rows in by_doc.items():
            assert len(rows) <= 2
            assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        assert 6 not in by_doc  # empty text yields no terms
        # doc 4's terms are unique to it (df=1): highest idf in corpus,
        # each term tf=1; rank-1 term must be its alphabetically first
        assert by_doc[4][0]["df"] == 1

    def test_identical_docs_get_identical_scores(self, docs):
        out = tfidf_top_terms(docs, "doc_id", "text", top_n=3)
        a = sorted((r["term"], r["tfidf"]) for r in out.filter("doc_id = 1").collect())
        b = sorted((r["term"], r["tfidf"]) for r in out.filter("doc_id = 3").collect())
        assert a == b

    def test_rejects_bad_top_n(self, docs):
        with pytest.raises(ValueError):
            tfidf_top_terms(docs, "doc_id", "text", top_n=0)


class TestInvertedIndex:
    def test_df_band_and_postings_bound(self, docs):
        out = inverted_index(docs, "doc_id", "text", min_df=2, max_df=3, max_postings=2)
        rows = {r["term"]: r for r in out.collect()}
        # 'the' appears in docs 1,2,3 → df=3, postings capped at 2, ascending
        assert rows["the"]["df"] == 3
        assert rows["the"]["postings"] == [1, 2]
        # df=1 terms (doc 4's vocabulary) are excluded by min_df
        assert "entirely" not in rows
        for r in rows.values():
            assert 2 <= r["df"] <= 3
            assert len(r["postings"]) <= 2
            assert r["postings"] == sorted(r["postings"])

    def test_rejects_bad_band(self, docs):
        with pytest.raises(ValueError):
            inverted_index(docs, "doc_id", "text", min_df=5, max_df=4)


class TestWeightedSample:
    def test_deterministic_and_weight_monotone(self, spark):
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, 8).otherwise(1).alias("w"),
        )
        out1 = weighted_priority_sample(df, "doc_id", "w", 200, seed=0)
        out2 = weighted_priority_sample(df, "doc_id", "w", 200, seed=0)
        ids1 = [r["doc_id"] for r in out1.collect()]
        assert sorted(ids1) == sorted(r["doc_id"] for r in out2.collect())
        assert len(ids1) == 200
        # 8x-weighted rows (even ids) dominate the sample: expected share
        # 8/9 ~ 0.89; assert well above the unweighted 0.5
        even = sum(1 for i in ids1 if i % 2 == 0)
        assert even > 140

    def test_priorities_are_hash_div_weight(self, spark):
        df = spark.range(50).select(F.col("id").alias("doc_id"), F.lit(7).alias("w"))
        out = weighted_priority_sample(df, "doc_id", "w", 50, seed=0).collect()
        for r in out:
            assert r["__priority"] * 7 <= (r["__priority"] + 1) * 7  # integers
            assert r["__w"] == 7

    def test_rejects_bad_k(self, spark):
        df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(1).alias("w"))
        with pytest.raises(ValueError):
            weighted_priority_sample(df, "doc_id", "w", 0)


class TestNgramJaccard:
    def test_exact_dup_pair_found(self, docs):
        out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold_num=3, threshold_den=5).collect()
        pairs = {(r["id_a"], r["id_b"]): r for r in out}
        assert (1, 3) in pairs
        assert pairs[(1, 3)]["jaccard_sim"] == 1.0
        assert pairs[(1, 3)]["inter"] == pairs[(1, 3)]["union_sz"]
        # doc 4 shares no trigram with anything
        assert not any(4 in p for p in pairs)

    def test_matches_all_pairs_answer(self, docs):
        """Prefix filtering must be COMPLETE: compare against a brute-force
        pandas all-pairs Jaccard over the same hashed shingles."""
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
            _hashed_shingle_df,
        )

        sh = {
            r["__id"]: set(r["__sh"])
            for r in _hashed_shingle_df(docs, "doc_id", "text", 3).collect()
        }
        expected = set()
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sh[a] & sh[b])
                union = len(sh[a] | sh[b])
                if union and inter * 5 >= 3 * union:
                    expected.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                         threshold_num=3, threshold_den=5).collect()
        }
        assert got == expected

    def test_rejects_bad_threshold(self, docs):
        with pytest.raises(ValueError):
            ngram_jaccard_pairs(docs, "doc_id", "text", threshold_num=0)

    def test_collapse_path_equals_direct_path(self, spark, docs):
        """The exact-collapse pre-pass must be answer-invariant: flood the
        corpus with exact copies and compare collapse vs direct output,
        including the inter/union counts."""
        copies = docs
        for i in (1, 2):
            copies = copies.unionByName(
                docs.select((docs.doc_id + 100 * i).alias("doc_id"), "text")
            )
        direct = sorted(map(tuple, ngram_jaccard_pairs(
            copies, "doc_id", "text", collapse_exact=False).collect()))
        collapsed = sorted(map(tuple, ngram_jaccard_pairs(
            copies, "doc_id", "text", collapse_exact=True).collect()))
        assert direct == collapsed
        assert len(direct) > 0


class TestKmeans:
    def test_partition_properties(self, spark, tables):
        emb = tables["embeddings"]
        out = kmeans_fit_predict(emb, "vec_id", "embedding", k=4, iters=2)
        rows = out.collect()
        assert len(rows) == emb.count()  # every vector assigned exactly once
        clusters = {r["cluster"] for r in rows}
        assert clusters <= set(range(4))
        assert len(clusters) >= 2  # random embeddings don't collapse to one

    def test_deterministic(self, spark, tables):
        emb = tables["embeddings"]
        a = sorted(map(tuple, kmeans_fit_predict(emb, "vec_id", "embedding", 4, 2).collect()))
        b = sorted(map(tuple, kmeans_fit_predict(emb, "vec_id", "embedding", 4, 2).collect()))
        assert a == b

    def test_iter_zero_is_seed_assignment(self, spark, tables):
        """iters=0 assigns against the raw seed vectors; each seed vector
        must land in its own cluster (cosine 1.0 with itself)."""
        emb = tables["embeddings"]
        out = kmeans_fit_predict(emb, "vec_id", "embedding", k=4, iters=0)
        seeds = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(4).collect()]
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert [got[s] for s in seeds] == [0, 1, 2, 3]

    def test_rejects_bad_params(self, spark, tables):
        with pytest.raises(ValueError):
            kmeans_fit_predict(tables["embeddings"], "vec_id", "embedding", k=0)


class TestRegistryEntries:
    def test_new_operators_callable_from_config(self, docs, tables):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        assert apply_operator(
            "tfidfTopTerms", docs, {"id_col": "doc_id", "text_col": "text", "top_n": 2}
        ).count() > 0
        assert apply_operator(
            "invertedIndex", docs,
            {"id_col": "doc_id", "text_col": "text", "min_df": 2, "max_df": 3},
        ).count() > 0
        wdf = docs.withColumn("w", F.lit(2))
        assert apply_operator(
            "weightedSample", wdf, {"id_col": "doc_id", "weight_col": "w", "k": 3}
        ).count() == 3
        assert apply_operator(
            "ngramJaccardPairs", docs, {"id_col": "doc_id", "text_col": "text"}
        ).count() >= 1
        assert apply_operator(
            "kmeansClusters", tables["embeddings"],
            {"id_col": "vec_id", "vec_col": "embedding", "k": 4, "iters": 1},
        ).count() == tables["embeddings"].count()
        qdf = apply_operator(
            "qualityQuantileCut", tables["documents"],
            {"id_col": "doc_id", "text_col": "text", "q": 0.5},
        )
        total = tables["documents"].count()
        # >= because ties at the threshold all survive
        assert total / 2 <= qdf.count() <= total


class TestProfileColumns:
    def test_one_pass_stats(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (None, "b", 2.5)],
            "id bigint, name string, score double",
        )
        rows = {r["col_name"]: r for r in profile_columns(df).collect()}
        assert set(rows) == {"id", "name", "score"}
        assert all(r["n_rows"] == 4 for r in rows.values())
        assert rows["id"]["n_nulls"] == 1 and rows["id"]["n_distinct"] == 3
        assert rows["name"]["n_nulls"] == 1 and rows["name"]["n_distinct"] == 2
        assert rows["score"]["min_value"] == "1.5" and rows["score"]["max_value"] == "2.5"
        # round-12 contract: exactly TWO aggregate passes — a slim
        # count/min/max pass and a counts-only exact-distinct pass
        # (splitting keeps the Expand a HashAggregate; fused min/max
        # string buffers forced SortAggregate + a Sort of the expanded
        # stream — see profile_columns). Never a per-column scan: the
        # pass count stays 2 regardless of column count.
        plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("LogicalRDD") == 2
        wide = df.withColumn("extra", df["id"] + 1)
        plan4 = profile_columns(wide)._jdf.queryExecution().optimizedPlan().toString()
        assert plan4.count("LogicalRDD") == 2

    def test_subset_and_unknown_column(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            profile_columns,
        )

        df = spark.createDataFrame([(1, "x")], "id bigint, v string")
        assert profile_columns(df, ["id"]).count() == 1
        with pytest.raises(ValueError):
            profile_columns(df, ["nope"])

    def test_config_callable(self, spark, tables):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        out = apply_operator(
            "profileColumns", tables["orders"], {"columns": ["o_orderkey", "o_totalprice"]}
        )
        assert out.count() == 2


class TestQuantize:
    def test_roundtrip_error_bounded(self, spark, tables):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            dequantize_vector,
            quantize_vector,
        )

        emb = tables["embeddings"]
        q = emb.select(
            "vec_id", "embedding", quantize_vector(F.col("embedding")).alias("qt")
        )
        checked = q.select(
            F.array_max(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    dequantize_vector(F.col("qt")),
                    lambda a, b: F.abs(a - b),
                )
            ).alias("err"),
            F.col("qt.scale").alias("scale"),
            F.array_max(F.transform("qt.q", lambda v: F.abs(v))).alias("maxcode"),
        ).collect()
        for r in checked:
            assert r["err"] <= r["scale"] * 0.5000001  # half-step reconstruction
            assert r["maxcode"] <= 127  # int8 range

    def test_zero_vector_quantizes_to_zeros(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            quantize_vector,
        )

        df = spark.createDataFrame([(1, [0.0] * 4)], "vec_id bigint, embedding array<float>")
        r = df.select(quantize_vector(F.col("embedding")).alias("qt")).first()
        assert list(r["qt"]["q"]) == [0, 0, 0, 0]


def test_ngram_jaccard_hash_order_same_answer(spark):
    """prefix_order='hash' (map-side prefix slice) must return exactly the
    df-order answer — completeness holds for ANY global gram order."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),
        (3, "a b c d e f g h"),
        (4, "p q r s t u v w"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, ngram_jaccard_pairs(
        df, "doc_id", "text", collapse_exact=False, prefix_order="df").collect()))
    b = sorted(map(tuple, ngram_jaccard_pairs(
        df, "doc_id", "text", collapse_exact=False, prefix_order="hash").collect()))
    assert a == b and len(a) >= 1
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(df, "doc_id", "text", prefix_order="nope")


def test_udtf_sentence_split(spark):
    """Spark 4 Python UDTF registered for config SQL: row-count-changing
    sentence expansion. JOIN LATERAL ... ON TRUE is the working form —
    the comma-LATERAL form dropped the first row of multi-row
    expansions in this build (documented in COVERAGE.md)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.register import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    spark.createDataFrame(
        [(1, "First one. Second one. "), (2, "Only"), (3, None)],
        "doc_id int, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM udtf_docs d JOIN LATERAL py_split_sentences(d.text) s ON TRUE
        """
    ).collect()
    got = {(r["doc_id"], r["pos"], r["sentence"]) for r in rows}
    assert got == {(1, 0, "First one"), (1, 1, "Second one"), (2, 0, "Only")}
