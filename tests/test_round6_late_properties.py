"""Property-based tests for the round-6-late operators: CMS guarantees
under arbitrary streams and splits, Z-order interleave bijectivity,
PageRank mass bounds on random graphs, and resample grid completeness.
Few examples (each runs real Spark jobs); hypothesis explores the
corners — tiny domains force collisions, random edges force ragged
degrees, duplicate timestamps force tie paths."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
    SCALE,
    pagerank,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
    zorder_value,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: streams over a 6-item domain, 1-40 events — tiny domain + tiny width
#: force real counter collisions
_stream = st.lists(st.sampled_from([f"k{i}" for i in range(6)]), min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(items=_stream, width=st.sampled_from([2, 4, 64]))
def test_cms_never_undercounts_any_stream(spark, items, width):
    df = spark.createDataFrame([(x,) for x in items], "item string")
    exact = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    est = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(
            cms_build(df, "item", depth=3, width=width), df, "item", 3, width
        ).collect()
    }
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert est[k] >= v, (k, width)


@settings(**_SETTINGS)
@given(items=_stream, cut=st.integers(min_value=0, max_value=5))
def test_cms_merge_of_any_split_equals_whole(spark, items, cut):
    """Counter-wise merge of ANY partition of the stream equals the
    whole-stream sketch — the property that makes per-day partials
    sound."""
    df = spark.createDataFrame([(x,) for x in items], "item string")
    a = df.filter(F.col("item") <= f"k{cut}")
    b = df.filter(F.col("item") > f"k{cut}")
    merged = cms_merge(
        cms_build(a, "item", depth=3, width=8), cms_build(b, "item", depth=3, width=8)
    )
    whole = cms_build(df, "item", depth=3, width=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=12
    )
)
def test_zorder_interleave_is_injective(spark, pairs):
    """Distinct (x, y) pairs must map to distinct Z values (bit
    interleave is a bijection on the bit-bounded domain)."""
    df = spark.createDataFrame(list(set(pairs)), "x int, y int")
    out = df.select(
        "x", "y", zorder_value([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()
    zs = [r["z"] for r in out]
    assert len(set(zs)) == len(zs)
    assert all(0 <= z < 256 for z in zs)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=10,
    )
)
def test_pagerank_mass_bounds_on_random_graphs(spark, edges):
    """On ANY graph: total mass never exceeds SCALE (integer floors only
    leak), every node keeps at least the teleport floor, and ranks are a
    permutation of 1..n."""
    nodes = sorted({v for e in edges for v in e})
    e_df = spark.createDataFrame(list(set(edges)), "src bigint, dst bigint")
    n_df = spark.createDataFrame([(v,) for v in nodes], "id bigint")
    out = pagerank(e_df, n_df, "id", iters=2, rank_mode="global").collect()
    n = len(nodes)
    floor = (3 * SCALE) // (20 * n)
    assert sum(r["pr_units"] for r in out) <= SCALE
    assert all(r["pr_units"] >= floor for r in out)
    assert sorted(r["rank"] for r in out) == list(range(1, n + 1))
