"""Lexical retrieval tier (functions/indexing.py round-8 continuation):
Okapi BM25 scoring and reciprocal-rank fusion."""

import math

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.indexing import (
    bm25_scores,
    rrf_fuse,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)


def _corpus(spark):
    rows = [
        (1, "spark shuffle join join hash"),
        (2, "hash table scan"),
        (3, "window sort order order order"),
        (4, "join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    """Reference BM25 in plain Python (Lucene idf form)."""
    toks = {i: t.split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + idf * (
                    tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                )
    return out


def test_bm25_matches_reference(spark):
    rows = [
        (1, "spark shuffle join join hash"),
        (2, "hash table scan"),
        (3, "window sort order order order"),
        (4, "join"),
    ]
    got = {
        r.doc_id: (r.n_matched_terms, r.bm25)
        for r in bm25_scores(
            _corpus(spark), "doc_id", "text", ["join", "hash"]
        ).collect()
    }
    ref = _bm25_ref(rows, ["join", "hash"])
    assert set(got) == set(ref) == {1, 2, 4}  # doc 3 matches nothing
    for i, score in ref.items():
        assert got[i][1] == pytest.approx(score, abs=1e-4)
    assert got[1][0] == 2 and got[2][0] == 1 and got[4][0] == 1


def test_bm25_term_absent_from_corpus(spark):
    out = bm25_scores(_corpus(spark), "doc_id", "text", ["join", "zzznope"])
    got = {r.doc_id for r in out.collect()}
    assert got == {1, 4}  # absent term contributes no rows, no crash


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="query term"):
        bm25_scores(_corpus(spark), "doc_id", "text", [])


def test_bm25_higher_tf_and_rarity_rank_higher(spark):
    rows = [(i, "filler " * 10 + ("rare " if i == 1 else "")) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, "doc_id", "text", ["rare", "filler"]).collect()}
    assert got[1] > max(v for k, v in got.items() if k != 1)


def test_rrf_exact_units(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (10, 2)], "doc_id long, rank int")
    got = {
        r.doc_id: (r.n_lists, r.rrf_units)
        for r in rrf_fuse([a, b], "doc_id").collect()
    }
    u = lambda r: 10**9 // (60 + r)  # noqa: E731
    assert got[10] == (2, u(1) + u(2))
    assert got[11] == (2, u(2) + u(1))
    assert got[12] == (1, u(3))  # absent from list b contributes nothing
    assert got[10][1] == got[11][1]  # symmetric ranks tie exactly


def test_rrf_validation(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], "doc_id")
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse([a], "doc_id", k=0)


def test_registry_steps_bm25_and_rrf(spark):
    """Config-dialect reachability: bm25Score over a view, then rrfFuse
    of two ranked views resolved by name."""
    _corpus(spark).createOrReplaceTempView("rt_docs")
    scored = apply_operator(
        "bm25Score",
        spark.table("rt_docs"),
        {"id_col": "doc_id", "text_col": "text", "query_terms": "join,hash"},
    )
    assert {r.doc_id for r in scored.collect()} == {1, 2, 4}

    spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_id long, rank int"
    ).createOrReplaceTempView("rt_lex")
    vec = spark.createDataFrame([(2, 1), (1, 2)], "doc_id long, rank int")
    fused = apply_operator(
        "rrfFuse",
        vec,
        {"id_col": "doc_id", "other_views": "rt_lex", "k": "60"},
    )
    got = {r.doc_id: r.rrf_units for r in fused.collect()}
    assert got[1] == got[2] == 10**9 // 61 + 10**9 // 62


def test_rrf_plan_is_single_shuffle(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1)], "doc_id long, rank int")
    plan = rrf_fuse([a, b], "doc_id")._jdf.queryExecution().executedPlan().toString()
    # union + one aggregate exchange; no join, no extra shuffles
    assert plan.count("Exchange") <= 1 or "AQEShuffleRead" in plan
