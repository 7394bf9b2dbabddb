"""PageRank on DataFrames (functions/graph.py): mass conservation,
hub detection, teleport floor, and the integer-unit contract."""

import pytest

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
    SCALE,
    knn_edges,
    knn_pagerank,
    pagerank,
)


@pytest.fixture
def star(spark):
    # node 0 is a hub: 1..5 all point at 0; 0 points at 1 (no dangling)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id bigint")
    return edges, nodes


def test_hub_ranks_first_and_floor_holds(spark, star):
    edges, nodes = star
    out = pagerank(edges, nodes, "id", iters=3, rank_mode="global").collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["id"] == 0  # the hub
    assert by_rank[1]["id"] == 1  # fed by the hub
    n = len(out)
    floor = (3 * SCALE) // (20 * n)  # teleport term (1-d)/n in units
    assert all(r["pr_units"] >= floor for r in out)
    assert sorted(r["rank"] for r in out) == list(range(1, n + 1))


def test_emission_modes_agree(spark, star):
    """Default emission is unranked mass; top_n returns the head of the
    global order with identical mass values; global/top_n/none disagree
    only in shape, never in pr_units."""
    edges, nodes = star
    base = pagerank(edges, nodes, "id", iters=3)
    assert base.columns == ["id", "pr_units"]
    full = pagerank(edges, nodes, "id", iters=3, rank_mode="global").collect()
    top2 = pagerank(edges, nodes, "id", iters=3, top_n=2).collect()
    assert [r["id"] for r in top2] == [
        r["id"] for r in sorted(full, key=lambda r: r["rank"])[:2]
    ]
    mass = {r["id"]: r["pr_units"] for r in base.collect()}
    assert all(mass[r["id"]] == r["pr_units"] for r in full)
    assert all(mass[r["id"]] == r["pr_units"] for r in top2)
    # the top_n plan must be a TakeOrdered, not a global sort
    plan = pagerank(edges, nodes, "id", iters=3, top_n=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        pagerank(edges, nodes, "id", rank_mode="global", top_n=2)
    with pytest.raises(ValueError):
        pagerank(edges, nodes, "id", rank_mode="bogus")


def test_mass_is_bounded_and_deterministic(spark, star):
    edges, nodes = star
    a = {(r["id"], r["pr_units"]) for r in pagerank(edges, nodes, "id", iters=2).collect()}
    b = {(r["id"], r["pr_units"]) for r in pagerank(edges, nodes, "id", iters=2).collect()}
    assert a == b  # integer units: bit-identical across runs
    total = sum(u for _, u in a)
    # integer floors only ever LEAK mass; never exceeds 1.0
    assert total <= SCALE


def test_knn_edges_degree_and_no_self(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    e = knn_edges(vecs, "vec_id", "embedding", k=3)
    deg = {r["src"]: r["n"] for r in e.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert set(deg.values()) == {3}
    assert e.filter(F.col("src") == F.col("dst")).count() == 0


def test_knn_edges_ivf_method(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(40)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    e = knn_edges(vecs, "vec_id", "embedding", k=3, method="ivf", n_probe=2)
    deg = {r["src"]: r["n"] for r in e.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # approximate graph: out-degree bounded by k, may be ragged
    assert all(1 <= d <= 3 for d in deg.values())
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    # pagerank runs fine on the ragged approximate graph
    out = knn_pagerank(vecs, "vec_id", "embedding", k=3, iters=2, method="ivf")
    assert out.count() == 40
    with pytest.raises(ValueError):
        knn_edges(vecs, "vec_id", "embedding", method="hnsw")


def test_weighted_pagerank_splits_by_weight(spark):
    # hub 0 has two out-edges: weight 9 to node 1, weight 1 to node 2 —
    # node 1 must receive 9x node 2's inflow (before the teleport floor)
    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], "src bigint, dst bigint, weight bigint"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id bigint")
    out = {r["id"]: r["pr_units"] for r in pagerank(edges, nodes, "id", iters=1).collect()}
    n = 3
    floor = (3 * SCALE) // (20 * n)
    inflow1, inflow2 = out[1] - floor, out[2] - floor
    assert abs(inflow1 - 9 * inflow2) <= 20  # integer floors only
    # uniform edges (no weight column): equal split
    eu = spark.createDataFrame([(0, 1), (0, 2), (1, 0), (2, 0)], "src bigint, dst bigint")
    ou = {r["id"]: r["pr_units"] for r in pagerank(eu, nodes, "id", iters=1).collect()}
    assert ou[1] == ou[2]


def test_knn_pagerank_registry_step(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = apply_operator(
        "knnPagerank", vecs, {"id_col": "vec_id", "vec_col": "embedding", "k": "3", "iters": "2"}
    )
    # scale-safe default: unranked mass
    assert out.columns == ["vec_id", "pr_units"]
    assert out.count() == 12
    top = apply_operator(
        "knnPagerank",
        vecs,
        {"id_col": "vec_id", "vec_col": "embedding", "k": "3", "iters": "2", "top_n": "5"},
    )
    assert top.columns == ["vec_id", "pr_units", "rank"]
    assert top.count() == 5
