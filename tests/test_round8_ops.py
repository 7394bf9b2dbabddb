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


class TestRandomProjection:
    def test_hand_computed_coordinate(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            jl_sign,
            random_projection,
        )

        vec = [0.5, -1.25, 2.0]  # quantizes to 500, -1250, 2000
        df = spark.createDataFrame([(1, vec)], "id long, v array<double>")
        got = random_projection(df, "id", "v", 2, in_dim=3, seed="t").collect()[0]
        q = [500, -1250, 2000]
        for j in range(2):
            want = sum(jl_sign("t", j, i) * q[i] for i in range(3))
            assert got["proj"][j] == want

    def test_quantization_half_up(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            jl_sign,
            random_projection,
        )

        # 0.0005 * 1000 + 0.5 = 1.0 -> floor 1; -0.0005 -> floor(0) = 0
        df = spark.createDataFrame([(1, [0.0005, -0.0005])], "id long, v array<double>")
        got = random_projection(df, "id", "v", 1, in_dim=2, seed="q").collect()[0]
        assert got["proj"][0] == jl_sign("q", 0, 0) * 1 + jl_sign("q", 0, 1) * 0

    def test_distance_preservation(self, spark):
        import numpy as np

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            random_projection,
        )

        # i.i.d. Gaussian points have CONCENTRATED pairwise distances (no
        # spread to preserve), so build pairs with real structure: 10
        # anchors, each with a near neighbor (+0.1σ noise) and the rest far
        rng = np.random.default_rng(8)
        anchors = rng.normal(size=(10, 64))
        vecs = np.vstack([anchors, anchors + 0.1 * rng.normal(size=(10, 64))])
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(20)],
            "id long, v array<double>",
        )
        proj = {
            r["id"]: np.array(r["proj"], dtype=float)
            for r in random_projection(df, "id", "v", 16).collect()
        }
        orig, red = [], []
        for a in range(20):
            for b in range(a + 1, 20):
                orig.append(np.linalg.norm(vecs[a] - vecs[b]))
                red.append(np.linalg.norm(proj[a] - proj[b]))
        # near/far structure survives the projection: strong correlation
        # and every near pair stays below every far pair's projected
        # distance percentile band
        # (at k=16 the JL distortion among the concentrated far pairs is
        # large, so the correlation bound is modest — the separation
        # assertion below is the sharp check)
        assert np.corrcoef(orig, red)[0, 1] > 0.75
        near = [red[i] for i, d in enumerate(orig) if d < 2]
        far = [red[i] for i, d in enumerate(orig) if d > 5]
        assert near and far and max(near) < min(far)

    def test_plan_is_jvm_only(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            random_projection,
        )

        df = spark.createDataFrame([(1, [0.1] * 64)], "id long, v array<double>")
        plan = random_projection(df, "id", "v", 8)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # row-local projection: no shuffle

    def test_registry_step(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            OPERATORS,
        )

        df = spark.createDataFrame([(1, [0.1] * 8)], "id long, v array<double>")
        out = OPERATORS["randomProjection"](
            df, "id", "v", "4", in_dim="8"
        ).collect()
        assert len(out) == 1 and len(out[0]["proj"]) == 4
