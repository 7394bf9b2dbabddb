"""Round-7 operator changes: approx profiling, scale-safe emission,
centroid transport, RAG chunking."""

import pytest

from pyspark.sql import functions as F


class TestHeavyHitters:
    def test_exact_answer_on_skewed_stream(self, spark):
        """100k-ish items, one 10% hitter, long uniform tail: result must
        equal the plain GROUP BY HAVING answer exactly."""
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            heavy_hitters,
        )

        df = spark.range(50_000).select(
            F.when(F.col("id") % 10 == 0, F.lit("HOT"))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 20_000).cast("string")))
            .alias("item")
        ).repartition(8)
        got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "item", 1, 50).collect()}
        exact = {
            (r["item"], r["cnt"])
            for r in df.groupBy("item")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .filter(F.col("cnt") * 50 >= 50_000)
            .collect()
        }
        assert got == exact and ("HOT", 5000) in got

    def test_candidates_bounded_per_partition(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            mg_candidates,
        )

        df = spark.range(20_000).select(
            F.concat(F.lit("k"), (F.col("id") % 5000).cast("string")).alias("item")
        ).repartition(4)
        n_cand = mg_candidates(df, "item", 32).count()
        assert n_cand <= 4 * 32  # <= partitions x k, never the key space

    def test_null_items_excluded_deliberately(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            heavy_hitters,
        )

        rows = [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 1
        df = spark.createDataFrame(rows, "item string")
        got = {(r["item"], r["cnt"]) for r in heavy_hitters(df, "item", 1, 2).collect()}
        # threshold over NON-NULL rows (7): a=6 qualifies, b=1 does not,
        # null is excluded by contract, never silently half-counted
        assert got == {("a", 6)}

    def test_k_guard_and_registry(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            heavy_hitters,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        df = spark.range(100).select(F.lit("x").alias("item"))
        with pytest.raises(ValueError, match="completeness"):
            heavy_hitters(df, "item", 1, 100, k=10)
        out = apply_operator(
            "heavyHitters", df, {"item_col": "item", "frac_num": "1", "frac_den": "2"}
        )
        assert [(r["item"], r["cnt"]) for r in out.collect()] == [("x", 100)]


class TestBloomFilteredJoin:
    def test_matches_plain_join_and_rejects_anti(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
            bloom_filtered_join,
        )

        probe = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        build = spark.range(300).select((F.col("id") * 7).alias("k"), F.lit("b").alias("tag"))
        got = sorted(
            (r["k"], r["v"], r["tag"])
            for r in bloom_filtered_join(probe, build, "k").collect()
        )
        exact = sorted(
            (r["k"], r["v"], r["tag"]) for r in probe.join(build, "k").collect()
        )
        assert got == exact and len(got) > 0
        semi = bloom_filtered_join(probe, build, "k", how="left_semi")
        assert semi.count() == probe.join(build, "k", "left_semi").count()
        with pytest.raises(ValueError, match="answer-changing"):
            bloom_filtered_join(probe, build, "k", how="left_anti")

    def test_registry_build_view_resolution(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        probe = spark.range(1000).select(F.col("id").alias("k"))
        spark.range(10).select((F.col("id") * 100).alias("k"), F.lit(1).alias("w")) \
            .createOrReplaceTempView("bloom_build_side")
        out = apply_operator(
            "bloomFilteredJoin", probe, {"key": "k", "build_view": "bloom_build_side"}
        )
        assert out.count() == 10


class TestChunkDocuments:
    def _chunks(self, spark, rows, **kw):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            chunk_documents,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return chunk_documents(df, "doc_id", "text", **kw).collect()

    def test_windows_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        got = sorted(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in self._chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
        )
        # stride 3: starts 0,3,6,9 — final window is 1 token
        assert [g[0] for g in got] == [0, 1, 2, 3]
        assert [g[1] for g in got] == [4, 4, 4, 1]
        assert got[0][2] == "t0 t1 t2 t3"
        assert got[1][2] == "t3 t4 t5 t6"
        assert got[3][2] == "t9"

    def test_no_overlap_reassembles(self, spark):
        text = "a  b   c d e"  # runs of spaces collapse under the contract
        got = sorted(
            (r["chunk_id"], r["chunk_text"])
            for r in self._chunks(spark, [(1, text)], chunk_tokens=2, overlap=0)
        )
        assert " ".join(t for _, t in got) == "a b c d e"

    def test_short_and_empty_docs(self, spark):
        got = self._chunks(spark, [(1, "only two"), (2, "")], chunk_tokens=8)
        by_id = {r["doc_id"]: r for r in got}
        assert len(got) == 2
        assert by_id[1]["n_tokens"] == 2 and by_id[1]["chunk_text"] == "only two"
        assert by_id[2]["n_tokens"] == 0 and by_id[2]["chunk_text"] == ""

    def test_no_shuffle_no_python(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            chunk_documents,
        )

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            chunk_documents(df, "doc_id", "text", chunk_tokens=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "EvalPython" not in plan

    def test_validation_and_registry(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
            chunk_documents,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)
        out = apply_operator(
            "chunkDocuments",
            df,
            {"id_col": "doc_id", "text_col": "text", "chunk_tokens": "2", "overlap": "0"},
        )
        assert out.count() == 2


class TestProfileApprox:
    def test_approx_switch_accuracy_and_plan(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            profile_columns,
        )

        df = spark.range(5000).select(
            F.col("id"), (F.col("id") % 7).alias("seven"), F.lit("x").alias("c")
        )
        rows = {
            r["col_name"]: r
            for r in profile_columns(df, approx_distinct=True).collect()
        }
        # low-cardinality columns are exact under HLL; high-cardinality
        # within the rsd envelope
        assert rows["seven"]["n_distinct"] == 7
        assert rows["c"]["n_distinct"] == 1
        assert abs(rows["id"]["n_distinct"] - 5000) / 5000 < 0.1
        # everything else stays exact
        assert all(r["n_rows"] == 5000 and r["n_nulls"] == 0 for r in rows.values())
        # the plan must carry the sketch agg, not the expanding exact
        # distinct (the 100-TB point of the switch)
        plan = (
            profile_columns(df, approx_distinct=True)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "approx_count_distinct" in plan
        assert "Expand" not in plan

    def test_both_mode_values_and_split_plan(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            profile_columns,
        )

        df = spark.range(3000).select(F.col("id"), (F.col("id") % 5).alias("five"))
        out = profile_columns(df, distinct_mode="both")
        rows = {r["col_name"]: r for r in out.collect()}
        assert rows["five"]["n_distinct"] == 5
        assert rows["five"]["n_distinct_approx"] == 5
        assert rows["id"]["n_distinct"] == 3000
        assert abs(rows["id"]["n_distinct_approx"] - 3000) / 3000 < 0.1
        # DELIBERATELY two aggregates (1-row crossJoin), NOT one fused
        # agg: the sketches must stay OUT of the exact-distinct Expand
        # (fusing measured 2x slower — see profile_columns docstring)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Range") == 2
        expand_section = plan.split("Expand")[-1] if "Expand" in plan else ""
        assert "approx_count_distinct" not in expand_section.split("Aggregate")[0]
        with pytest.raises(ValueError):
            profile_columns(df, distinct_mode="fuzzy")

    def test_centroid_transport_modes_identical(self, spark):
        """Broadcast-variable centroid transport (the >65k-cluster
        enabler) must produce bit-identical assignments to the closure
        mode it replaced."""
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.similarity import (
            ivf_probe_assignments,
        )

        rows = [(i, [float((i * 13 + j * 7) % 11) for j in range(8)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        cents = [(i, [float((i * 5 + j) % 11) for j in range(8)]) for i in range(9)]
        a = sorted(
            (r["q"], r["__list_id"])
            for r in ivf_probe_assignments(
                df, cents, "vec_id", "embedding", 3, "q", transport="broadcast"
            ).collect()
        )
        b = sorted(
            (r["q"], r["__list_id"])
            for r in ivf_probe_assignments(
                df, cents, "vec_id", "embedding", 3, "q", transport="closure"
            ).collect()
        )
        assert a == b
        with pytest.raises(ValueError):
            ivf_probe_assignments(
                df, cents, "vec_id", "embedding", 3, "q", transport="literal"
            )

    def test_registry_passthrough(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        df = spark.range(100).select(F.col("id"))
        out = apply_operator(
            "profileColumns", df, {"approx_distinct": "true", "rsd": "0.05"}
        )
        got = out.collect()[0]
        assert abs(got["n_distinct"] - 100) / 100 < 0.2
