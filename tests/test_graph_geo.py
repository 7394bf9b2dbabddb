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


class TestBFSLevels:
    @staticmethod
    def _bfs(spark, edges, sources, **kw):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
            bfs_levels,
        )

        e = spark.createDataFrame(edges, ["src", "dst"])
        s = spark.createDataFrame([(x,) for x in sources], ["node"])
        return sorted(
            (r.node, r.dist) for r in bfs_levels(e, s, **kw).collect()
        )

    def test_path_graph(self, spark):
        got = self._bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1], max_hops=3)
        assert got == [(1, 0), (2, 1), (3, 2), (4, 3)]  # 5 beyond max_hops

    def test_multi_source_takes_min(self, spark):
        got = self._bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 5], max_hops=4)
        assert got == [(1, 0), (2, 1), (3, 2), (4, 1), (5, 0)]

    def test_unreachable_component_absent(self, spark):
        got = self._bfs(spark, [(1, 2), (8, 9)], [1], max_hops=4)
        assert got == [(1, 0), (2, 1)]

    def test_directed_mode(self, spark):
        # 2 -> 1 only: undirected reaches 2, directed does not
        undirected = self._bfs(spark, [(2, 1)], [1], max_hops=2)
        directed = self._bfs(spark, [(2, 1)], [1], max_hops=2, directed=True)
        assert undirected == [(1, 0), (2, 1)]
        assert directed == [(1, 0)]

    def test_cycle_terminates_at_first_visit(self, spark):
        got = self._bfs(spark, [(1, 2), (2, 3), (3, 1)], [1], max_hops=10)
        assert got == [(1, 0), (2, 1), (3, 1)]

    def test_vs_networkx_free_reference(self, spark):
        # brute-force reference BFS in plain python over a random graph
        import random

        random.seed(7)
        edges = list({(random.randrange(30), random.randrange(30)) for _ in range(60)})
        edges = [(a, b) for a, b in edges if a != b]
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dist = {0: 0}
        frontier = [0]
        for h in range(1, 5):
            nxt = [v for u in frontier for v in adj.get(u, ()) if v not in dist]
            for v in nxt:
                dist.setdefault(v, h)
            frontier = sorted(set(nxt))
        got = dict(self._bfs(spark, edges, [0], max_hops=4))
        assert got == dist

    def test_registry_step(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        spark.createDataFrame([(1,)], ["node"]).createOrReplaceTempView("bfs_src_v")
        got = sorted(
            (r.node, r.dist)
            for r in apply_operator(
                "bfsLevels", e, {"sources_view": "bfs_src_v", "max_hops": "1"}
            ).collect()
        )
        assert got == [(1, 0), (2, 1)]

    def test_validation(self, spark):
        import pytest as _pt
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
            bfs_levels,
        )

        e = spark.createDataFrame([(1, 2)], ["src", "dst"])
        s = spark.createDataFrame([(1,)], ["node"])
        with _pt.raises(ValueError, match="max_hops"):
            bfs_levels(e, s, max_hops=-1)
