"""Round-8 operators: term co-occurrence / PMI counting."""

import pytest


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "apple banana cherry"),
        (2, "apple banana"),
        (3, "apple date"),
        (4, "banana cherry"),
        (5, "unique_term apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTermCooccurrence:
    def test_hand_computed_counts(self, spark, tiny_docs):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            term_cooccurrence,
        )

        got = {
            (r["term_a"], r["term_b"]): r.asDict()
            for r in term_cooccurrence(tiny_docs, "doc_id", "text").collect()
        }
        # df: apple 4, banana 3, cherry 2, date 1 (dropped), unique_term 1 (dropped)
        assert set(got) == {
            ("apple", "banana"),
            ("apple", "cherry"),
            ("banana", "cherry"),
        }
        ab = got[("apple", "banana")]
        assert (ab["pair_docs"], ab["docs_a"], ab["docs_b"], ab["n_docs"]) == (2, 4, 3, 5)
        # lift = 1000*2*5 // (4*3) = 833
        assert ab["lift_x1000"] == 833
        bc = got[("banana", "cherry")]
        assert bc["pair_docs"] == 2 and bc["lift_x1000"] == 1000 * 2 * 5 // (3 * 2)

    def test_repeated_tokens_count_once_per_doc(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            term_cooccurrence,
        )

        df = spark.createDataFrame(
            [(1, "x x x y"), (2, "x y y")], "doc_id long, text string"
        )
        got = term_cooccurrence(df, "doc_id", "text", min_doc_freq=1).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["term_a"], r["term_b"], r["pair_docs"]) == ("x", "y", 2)

    def test_max_terms_per_doc_keeps_rarest(self, spark, tiny_docs):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            term_cooccurrence,
        )

        # with cap=1, each doc keeps only its RAREST kept term -> no pairs
        got = term_cooccurrence(
            tiny_docs, "doc_id", "text", min_doc_freq=1, max_terms_per_doc=1
        ).collect()
        assert got == []
        # cap=2: doc 1 keeps (cherry df2, banana df3); doc 4 keeps both ->
        # the banana-cherry pair survives with pair_docs 2
        got = {
            (r["term_a"], r["term_b"]): r["pair_docs"]
            for r in term_cooccurrence(
                tiny_docs, "doc_id", "text", min_doc_freq=1, max_terms_per_doc=2
            ).collect()
        }
        assert got[("banana", "cherry")] == 2

    def test_max_doc_freq_drops_stopword_tier(self, spark, tiny_docs):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            term_cooccurrence,
        )

        got = term_cooccurrence(
            tiny_docs, "doc_id", "text", min_doc_freq=1, max_doc_freq=3
        ).collect()
        terms = {t for r in got for t in (r["term_a"], r["term_b"])}
        assert "apple" not in terms  # df 4 > 3

    def test_registry_step(self, spark, tiny_docs):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            OPERATORS,
        )

        out = OPERATORS["termCooccurrence"](
            tiny_docs, "doc_id", "text", min_doc_freq="2"
        )
        assert out.count() == 3
