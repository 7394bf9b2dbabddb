"""Triangle counting (degree-ordered orientation) and the grid-cell
spatial proximity join."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
    triangle_count,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.geo import (
    geo_cell,
    proximity_pairs,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return triangle_count(df, "src", "dst").collect()[0]


class TestTriangleCount:
    def test_complete_graphs(self, spark):
        for n, expect in [(3, 1), (4, 4), (5, 10)]:  # C(n,3)
            kn = [(a, b) for a in range(n) for b in range(n) if a < b]
            r = _tri(spark, kn)
            assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (
                n, n * (n - 1) // 2, expect,
            )

    def test_triangle_free(self, spark):
        # star graph: hub never closes a wedge
        star = [(0, i) for i in range(1, 8)]
        assert _tri(spark, star)["n_triangles"] == 0

    def test_noise_normalization(self, spark):
        # duplicates, reversed edges, self-loops all collapse
        edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1)]
        r = _tri(spark, edges)
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)

    def test_random_graph_vs_brute_force(self, spark):
        random.seed(17)
        n = 40
        edges = [(a, b) for a in range(n) for b in range(a + 1, n)
                 if random.random() < 0.25]
        adj = set(edges)
        expect = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        assert _tri(spark, edges)["n_triangles"] == expect

    def test_registry_step(self, spark):
        df = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], ["src", "dst"])
        out = apply_operator("triangleCount", df, {})
        assert out.collect()[0]["n_triangles"] == 1


class TestProximityPairs:
    def test_matches_brute_force(self, spark):
        random.seed(3)
        pts = [(i, random.randint(-3000, 3000), random.randint(-3000, 3000))
               for i in range(150)]
        radius = 700
        df = spark.createDataFrame(pts, ["id", "lat", "lon"])
        got = sorted(
            (r["id_a"], r["id_b"], r["dist2"])
            for r in proximity_pairs(df, "id", "lat", "lon", radius).collect()
        )
        exp = sorted(
            (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
            for a, b in itertools.combinations(pts, 2)
            if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= radius * radius
        )
        assert got == exp  # banding complete AND no duplicates

    def test_cross_origin_cells(self, spark):
        # floor-div on negatives: the offset trick keeps neighbors adjacent
        df = spark.createDataFrame([(1, -1, -1), (2, 1, 1)], ["id", "lat", "lon"])
        rows = proximity_pairs(df, "id", "lat", "lon", 5).collect()
        assert len(rows) == 1 and rows[0]["dist2"] == 8

    def test_cell_id_distinct_neighbors(self, spark):
        # 9 probed cells of any point are distinct (pair found exactly once)
        df = spark.createDataFrame([(0, 0)], ["lat", "lon"])
        cells = df.select(
            *[
                (geo_cell(F.col("lat"), F.col("lon"), 100)
                 + F.lit(dx * (1 << 32) + dy)).alias(f"c{dx}{dy}")
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        ).collect()[0]
        assert len(set(cells)) == 9

    def test_bad_radius(self, spark):
        df = spark.createDataFrame([(1, 0, 0)], ["id", "lat", "lon"])
        with pytest.raises(ValueError):
            proximity_pairs(df, "id", "lat", "lon", 0)

    def test_registry_step(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 0), (2, 3, 4), (3, 9000, 9000)], ["id", "lat", "lon"]
        )
        out = apply_operator(
            "geoProximityPairs", df,
            {"id_col": "id", "lat_col": "lat", "lon_col": "lon",
             "radius_micro": "10"},
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["dist2"] == 25
