"""Round-7 operator changes: approx profiling, scale-safe emission."""

import pytest

from pyspark.sql import functions as F


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
