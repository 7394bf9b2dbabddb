"""Property-based tests for the round-6 operators: prefix-filter
completeness of the exact n-gram Jaccard join under randomized corpora,
weighted-sample priority semantics, and the k-means nearest-centroid
invariant. Small examples (each runs real Spark jobs), interesting
corners explored by hypothesis: tiny vocabularies force shared grams and
exact duplicates; tied weights force tiebreak paths."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
    _hashed_shingle_df,
    ngram_jaccard_pairs,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
    weighted_priority_sample,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: docs over a 4-word vocabulary, 0-6 tokens each — tiny vocab forces
#: shared trigrams, repeated draws force exact duplicates
_corpus = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6).map(
        " ".join
    ),
    min_size=2,
    max_size=8,
).map(lambda texts: [(i + 1, t) for i, t in enumerate(texts)])


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_ngram_jaccard_matches_brute_force(spark, docs):
    """Both the prefix-filtered core and the collapse wrapper must equal
    all-pairs Jaccard over the hashed shingles, for ANY corpus."""
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    sh = {
        r["__id"]: set(r["__sh"])
        for r in _hashed_shingle_df(df, "doc_id", "text", 3).collect()
    }
    expected = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter * 5 >= 3 * union:
                expected[(a, b)] = (inter, union)
    for collapse in (False, True):
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["union_sz"])
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, collapse_exact=collapse
            ).collect()
        }
        assert got == expected, f"collapse={collapse}"


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 40), st.integers(1, 5)), min_size=1, max_size=15
    ).map(lambda rs: list({k: (k, w) for k, w in rs}.values())),
    k=st.integers(1, 6),
)
def test_weighted_sample_is_smallest_k_by_priority(spark, rows, k):
    """The sample must be EXACTLY the k rows with the smallest
    (hash48(id) // w, id) — recompute the priority independently."""
    import hashlib

    df = spark.createDataFrame(rows, "doc_id bigint, w int")
    got = [
        (r["doc_id"], r["__priority"])
        for r in weighted_priority_sample(df, "doc_id", "w", k, seed=0).collect()
    ]

    def prio(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}#0".encode()).hexdigest()[:12], 16)
        return h // w

    expected = sorted(((prio(i, w), i) for i, w in rows))[:k]
    assert sorted((p, i) for i, p in got) == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=3,
        max_size=10,
    ).filter(lambda vs: all(any(x != 0 for x in v) for v in vs)),
    k=st.integers(2, 3),
)
def test_kmeans_assignment_is_nearest_centroid(spark, vecs, k):
    """After the final iteration every vector must sit in the cluster
    whose centroid has the max (rounded) cosine sim — recompute the final
    centroids independently from the assignment itself and check."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.clustering import (
        kmeans_fit_predict,
    )

    rows = [(i + 1, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    k = min(k, len(rows))
    out = {r["vec_id"]: r["cluster"] for r in
           kmeans_fit_predict(df, "vec_id", "embedding", k=k, iters=1).collect()}
    assert set(out) == {i for i, _ in rows}
    # rebuild iteration-1 centroids exactly as the engine defines them
    seeds = {c: list(v) for c, (_, v) in enumerate(rows[:k])}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 9)

    assign1 = {
        i: min(range(k), key=lambda c: (-cos(v, seeds[c]), c)) for i, v in rows
    }
    cents = {}
    for c in range(k):
        member_vecs = [v for i, v in rows if assign1[i] == c]
        if member_vecs:
            cents[c] = [
                round(sum(col) / len(member_vecs), 6) for col in zip(*member_vecs)
            ]
        else:
            cents[c] = seeds[c]
    for i, v in rows:
        best = min(range(k), key=lambda c: (-cos(v, cents[c]), c))
        assert out[i] == best, (i, v, out[i], best)
