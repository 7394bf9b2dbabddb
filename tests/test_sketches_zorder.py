"""Count-min sketch (functions/sketches.py) and Z-order layout
(operators/scale.py): CMS guarantees + exact mergeability; Morton key
bit math + disjoint partition ranges after the layout pass."""

import pytest

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_frequency,
    cms_merge,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
    zorder_layout,
    zorder_scale,
    zorder_value,
)


@pytest.fixture
def items(spark):
    # zipf-ish: item i appears 200//(i+1) times — a few heavy hitters
    rows = [(f"item_{i}",) for i in range(40) for _ in range(200 // (i + 1))]
    return spark.createDataFrame(rows, "item string")


def _est_map(df):
    return {r["item"]: r["cms_est"] for r in df.collect()}


def test_cms_never_undercounts(spark, items):
    exact = {r["item"]: r["n"] for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()}
    est = _est_map(cms_frequency(items, "item", depth=4, width=32))
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert est[k] >= v, k


def test_cms_exact_when_wide(spark, items):
    # width >> cardinality and depth 4: the odds that some item collides
    # in ALL rows are negligible, and this fixture is fixed — est == true
    exact = {r["item"]: r["n"] for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()}
    est = _est_map(cms_frequency(items, "item", depth=4, width=4096))
    assert est == exact


def test_cms_sketch_state_is_bounded(spark, items):
    sk = cms_build(items, "item", depth=3, width=16)
    assert sk.count() <= 3 * 16
    # every depth row preserves the total stream count
    per_row = sk.groupBy("row").agg(F.sum("cnt").alias("total")).collect()
    n = items.count()
    assert {r["total"] for r in per_row} == {n}


def test_cms_merge_equals_whole_sketch(spark, items):
    # partial sketches over disjoint shards merge into EXACTLY the
    # whole-stream sketch — the per-day-partials maintenance pattern
    # (shards split deterministically: limit() picks different rows on
    # re-evaluation and CMS counters would drift between the two plans)
    shard = F.ascii(F.substring("item", 6, 1)) % 2
    a = items.filter(shard == 0)
    b = items.filter(shard == 1)
    merged = cms_merge(
        cms_build(a, "item", depth=4, width=32),
        cms_build(b, "item", depth=4, width=32),
    )
    whole = cms_build(items, "item", depth=4, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_probe_of_absent_item_is_zero_or_collision(spark, items):
    sk = cms_build(items, "item", depth=4, width=4096)
    probes = spark.createDataFrame([("never_seen",)], "item string")
    est = _est_map(cms_estimate(sk, probes, "item", depth=4, width=4096))
    assert est["never_seen"] == 0  # wide sketch: all 4 counters untouched


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (2, 1)], "x int, y int")
    out = df.select(
        "x", "y", zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # x occupies even bit positions, y odd: z = interleave(y,x)
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110  # x=10 -> bits 0,2 = 0,1; y=01 -> bits 1,3 = 1,0
    with pytest.raises(ValueError):
        zorder_value([F.col("x"), F.col("y")], bits=32)


def test_zorder_scale_endpoints_and_integrality(spark):
    df = spark.createDataFrame([(10,), (55,), (100,)], "v int")
    out = df.select(zorder_scale(F.col("v"), 10, 100, bits=4).alias("s")).collect()
    vals = [r["s"] for r in out]
    assert vals[0] == 0 and vals[2] == 15  # min -> 0, max -> 2^bits - 1
    assert all(0 <= v <= 15 for v in vals)


def test_zorder_layout_partitions_are_disjoint_z_ranges(spark):
    rows = [(i % 97, (i * 31) % 89) for i in range(2000)]
    df = spark.createDataFrame(rows, "a int, b int")
    laid = zorder_layout(df, ["a", "b"], bits=8, num_partitions=8)
    # recompute z per row with the same scaling and check that the
    # partition-id -> z-range mapping is non-overlapping (this is what
    # makes parquet min/max stats selective after the write)
    z = zorder_value(
        [zorder_scale(F.col("a"), 0, 96, 8), zorder_scale(F.col("b"), 0, 88, 8)], 8
    )
    spans = (
        laid.withColumn("__pid", F.spark_partition_id())
        .withColumn("__z", z)
        .groupBy("__pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    )
    spans = sorted([(r["lo"], r["hi"]) for r in spans])
    assert len(spans) > 1  # actually split
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    # layout is a reshuffle, never a filter
    assert laid.count() == 2000


def test_registry_steps(spark, items):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    est = apply_operator("cmsFrequency", items, {"item_col": "item", "depth": "4", "width": "64"})
    assert est.columns == ["item", "cms_est"]
    df = spark.createDataFrame([(i, i * 7 % 50) for i in range(100)], "a int, b int")
    laid = apply_operator(
        "zorderLayout", df, {"cols": ["a", "b"], "bits": "6", "num_partitions": "4"}
    )
    assert laid.count() == 100


class TestKMV:
    """KMV bottom-k sketch: deterministic uniform distinct-sample."""

    def test_sketch_rows_and_determinism(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_hash,
            kmv_sketch,
        )
        from pyspark.sql import functions as F

        df = spark.range(0, 1000).select(F.col("id").alias("v"))
        sk = kmv_sketch(df, "v", k=32)
        rows = sk.collect()
        assert len(rows) == 32
        assert [r.pos for r in rows] == sorted(r.pos for r in rows)
        hvs = [r.hv for r in rows]
        assert hvs == sorted(hvs)
        # rerun == same sketch (deterministic hash, no RNG)
        assert kmv_sketch(df, "v", k=32).collect() == rows
        # the hash really is the bottom-k of the full hash set
        all_h = sorted(
            r.h for r in df.select(kmv_hash(F.col("v")).alias("h")).collect()
        )
        assert hvs == all_h[:32]

    def test_merge_equals_single_pass(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_merge,
            kmv_sketch,
        )
        from pyspark.sql import functions as F

        a = spark.range(0, 600).select(F.col("id").alias("v"))
        b = spark.range(400, 1000).select(F.col("id").alias("v"))  # overlap
        merged = kmv_merge(
            kmv_sketch(a, "v", k=32), kmv_sketch(b, "v", k=32), k=32
        )
        whole = kmv_sketch(a.unionByName(b), "v", k=32)
        assert merged.collect() == whole.collect()

    def test_summary_estimate_and_quantiles(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_sketch,
            kmv_summary,
        )
        from pyspark.sql import functions as F

        n = 5000
        df = spark.range(0, n).select(F.col("id").alias("v"))
        row = kmv_summary(kmv_sketch(df, "v", k=256), 256).collect()[0]
        assert abs(row.est_distinct - n) / n < 0.2  # ~1/sqrt(k) regime
        # quantiles of a uniform 0..n sample land near the true ones
        assert abs(row.q50 - n / 2) < n * 0.15
        assert row.q25 < row.q50 < row.q75

    def test_summary_requires_full_sketch(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_sketch,
            kmv_summary,
        )
        from pyspark.sql import functions as F
        import pytest

        df = spark.range(0, 10).select(F.col("id").alias("v"))
        with pytest.raises(ValueError, match="full sketch"):
            kmv_summary(kmv_sketch(df, "v", k=64), 64)


class TestKMVIntersect:
    """Join-size / overlap estimation from two full KMV sketches."""

    @staticmethod
    def _sets(spark, a_range, b_range):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_sketch,
        )
        from pyspark.sql import functions as F

        a = spark.range(*a_range).select(F.col("id").alias("v"))
        b = spark.range(*b_range).select(F.col("id").alias("v"))
        return kmv_sketch(a, "v", k=64), kmv_sketch(b, "v", k=64)

    def test_overlap_estimate(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_intersect,
        )

        # |A ∩ B| = 200, |A ∪ B| = 1000, J = 0.2 — deterministic hash,
        # so the estimate is a fixed value; bounds are the ~1/sqrt(k)
        # regime, not flake tolerance
        sk_a, sk_b = self._sets(spark, (0, 600), (400, 1000))
        row = kmv_intersect(sk_a, sk_b, 64).collect()[0]
        assert row.k == 64
        assert abs(row.union_est - 1000) / 1000 < 0.3
        assert 500 <= row.jaccard_x10000 <= 3500  # J=0.2 ± sampling
        assert 50 <= row.inter_est <= 400

    def test_identical_sets(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_intersect,
        )

        sk_a, sk_b = self._sets(spark, (0, 500), (0, 500))
        row = kmv_intersect(sk_a, sk_b, 64).collect()[0]
        assert row.n_both == 64
        assert row.jaccard_x10000 == 10000
        assert row.inter_est == row.union_est

    def test_disjoint_sets(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_intersect,
        )

        sk_a, sk_b = self._sets(spark, (0, 500), (1000, 1500))
        row = kmv_intersect(sk_a, sk_b, 64).collect()[0]
        assert row.n_both == 0
        assert row.jaccard_x10000 == 0
        assert row.inter_est == 0

    def test_requires_full_sketches(self, spark):
        import pytest
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            kmv_intersect,
            kmv_sketch,
        )
        from pyspark.sql import functions as F

        small = spark.range(0, 10).select(F.col("id").alias("v"))
        big = spark.range(0, 500).select(F.col("id").alias("v"))
        with pytest.raises(ValueError, match="full"):
            kmv_intersect(kmv_sketch(small, "v", k=64), kmv_sketch(big, "v", k=64), 64)

    def test_registry_step(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
            apply_operator,
        )

        sk_a, sk_b = self._sets(spark, (0, 500), (0, 500))
        sk_b.createOrReplaceTempView("kmv_b_v")
        row = apply_operator(
            "kmvIntersect", sk_a, {"other_view": "kmv_b_v", "k": "64"}
        ).collect()[0]
        assert row.jaccard_x10000 == 10000
