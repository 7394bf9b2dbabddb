"""Property-based tests (SURVEY.md §5.4): SCD2 invariants and dedup
survivor determinism under randomized inputs.

Examples are kept small and few — each example runs real Spark jobs — but
hypothesis still explores the interesting corners (dup keys, ties, empty
deltas, value flapping) far better than hand-picked cases.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
    scd2_merge,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
    dedup_split,
)

#: (key, value) rows; tiny domains force key collisions and value ties
_snapshot = st.lists(
    st.tuples(st.integers(1, 4), st.integers(0, 3)), min_size=1, max_size=8
).map(lambda rows: list({k: (k, v) for k, v in rows}.values()))  # unique keys

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(snap1=_snapshot, snap2=_snapshot)
def test_scd2_invariants_hold_for_any_snapshot_pair(spark, snap1, snap2):
    df1 = spark.createDataFrame(snap1, "k int, v int")
    df2 = spark.createDataFrame(snap2, "k int, v int")
    t1 = scd2_merge(None, df1, keys=["k"], effective_ts="2024-01-01 00:00:00")
    t2 = scd2_merge(t1, df2, keys=["k"], effective_ts="2024-02-01 00:00:00")

    rows = t2.collect()
    # exactly one current row per key ever seen
    seen_keys = {k for k, _ in snap1} | {k for k, _ in snap2}
    current = [r for r in rows if r["is_current"]]
    assert sorted(r["k"] for r in current) == sorted(seen_keys)
    # current rows carry the latest value for keys present in snap2
    latest = dict(snap2)
    for r in current:
        if r["k"] in latest:
            assert r["v"] == latest[r["k"]]
    # intervals per key: non-overlapping, closed rows end where successors start
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["eff_start_ts"])
        for a, b in zip(versions, versions[1:]):
            assert a["eff_end_ts"] <= b["eff_start_ts"]
        assert sum(r["is_current"] for r in versions) == 1

    # idempotency: re-merging the same snapshot changes nothing
    t3 = scd2_merge(t2, df2, keys=["k"], effective_ts="2024-03-01 00:00:00")
    assert sorted(map(tuple, t3.collect())) == sorted(map(tuple, rows))


#: rows with deliberate PK collisions and order-col ties
_dup_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 2), st.integers(0, 99)),
    min_size=1,
    max_size=10,
)


@settings(**_SETTINGS)
@given(rows=_dup_rows)
def test_dedup_survivor_deterministic_and_complete(spark, rows):
    df = spark.createDataFrame(rows, "pk int, ord int, payload int")
    good1, bad1 = dedup_split(df, ["pk"], ["ord", "payload"])
    good2, bad2 = dedup_split(df, ["pk"], ["ord", "payload"])

    g1 = sorted(map(tuple, good1.collect()))
    assert g1 == sorted(map(tuple, good2.collect()))  # deterministic
    # exactly one survivor per key; survivor is the max by (ord, payload)
    expected = {}
    for pk, o, p in rows:
        if pk not in expected or (o, p) > expected[pk]:
            expected[pk] = (o, p)
    assert g1 == sorted((pk, o, p) for pk, (o, p) in expected.items())
    # nothing lost: survivors + duplicates == input
    assert len(g1) + bad1.count() == len(rows)


#: space-separated lowercase token docs (the corpus operators' domain)
_doc_text = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=12,
).map(" ".join)
_corpus = st.lists(_doc_text, min_size=1, max_size=6).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)


def _span_dedup_model(docs, span_tokens):
    """Sequential model of C4 global span dedup: docs in id order, each
    split into consecutive ``span_tokens``-token chunks; a chunk survives
    iff its string was never seen before ANYWHERE — including earlier in
    the same document (an intra-doc repeat is a duplicate of its own
    first occurrence; hypothesis falsified the old 'first doc intact'
    assertion with [(0, 'alpha alpha alpha alpha')])."""
    seen, out = set(), {}
    for doc_id, text in sorted(docs):
        toks = text.split(" ")
        kept = []
        for i in range(0, len(toks), span_tokens):
            chunk = " ".join(toks[i : i + span_tokens])
            if chunk not in seen:
                seen.add(chunk)
                kept.append(chunk)
        out[doc_id] = " ".join(kept)
    return out


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_span_dedup_matches_model_and_idempotent(spark, docs):
    """remove_duplicate_spans equals the sequential first-occurrence
    model exactly, is idempotent, and never grows a document."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string")
    once = remove_duplicate_spans(df, "doc_id", "text", span_tokens=2)
    twice = remove_duplicate_spans(once, "doc_id", "text", span_tokens=2)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == _span_dedup_model(docs, 2)  # exact first-occurrence law
    assert a == b  # idempotent
    orig = dict(docs)
    assert all(len(a[i]) <= len(orig[i]) for i in orig)  # never grows


def test_span_dedup_intra_doc_repeat_semantics(spark):
    """Pin the semantics hypothesis surfaced: a document's own repeated
    span dedups against its first occurrence (C4 keeps only the first
    corpus-wide occurrence — there is no same-document exemption)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(0, "alpha alpha alpha alpha"), (1, "alpha alpha beta beta")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, "doc_id", "text", span_tokens=2).collect()
    }
    # doc 0: chunks ['alpha alpha', 'alpha alpha'] → second is a dup of the first
    # doc 1: 'alpha alpha' already seen in doc 0; 'beta beta' is new
    assert out == {0: "alpha alpha", 1: "beta beta"}


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_repetition_profile_bounds(spark, docs):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        repetition_profile,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string")
    for r in repetition_profile(df, "doc_id", "text", n=2).collect():
        assert r["distinct_grams"] <= r["total_grams"]
        assert 0.0 <= r["dup_gram_frac"] < 1.0 or r["total_grams"] == 0
        assert 0.0 <= r["top_gram_frac"] <= 1.0
        n_tok = len(dict(docs)[r["doc_id"]].split(" "))
        assert r["total_grams"] == max(n_tok - 1, 0)


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_redact_and_nfc_idempotent(spark, docs):
    """redact_pii and NFC normalization are idempotent — running either
    twice equals running it once (required for safe pipeline re-runs)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.register import (
        py_nfc_normalize,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
        redact_pii,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string").withColumn(
        "text", F.concat(F.col("text"), F.lit(" x@y.io 10.0.0.1 café"))
    )
    one = df.select(redact_pii(py_nfc_normalize(F.col("text"))).alias("t"))
    two = one.select(redact_pii(py_nfc_normalize(F.col("t"))).alias("t"))
    assert [r["t"] for r in one.collect()] == [r["t"] for r in two.collect()]


# -- round 5: mixture sampling, bloom dedup, BPE -----------------------------

_weights = st.dictionaries(
    st.sampled_from(["s0", "s1", "s2"]), st.integers(1, 3), min_size=1, max_size=3
)
_docs_by_stratum = st.lists(
    st.tuples(st.integers(0, 60), st.sampled_from(["s0", "s1", "s2"])),
    min_size=1,
    max_size=40,
).map(lambda rows: list({i: (i, s) for i, s in rows}.values()))  # unique ids


@settings(**_SETTINGS)
@given(rows=_docs_by_stratum, weights=_weights)
def test_domain_mix_ratio_exact_for_any_corpus(spark, rows, weights):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.sampling import (
        domain_mix_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = domain_mix_sample(df, "src", weights, "doc_id").collect()
    per = {s: sum(1 for r in out if r["src"] == s) for s in weights}
    have = {s: sum(1 for _, src in rows if src == s) for s in weights}
    k = min(have[s] // w for s, w in weights.items())
    # exact ratio at the largest feasible k, never exceeding availability
    for s, w in weights.items():
        assert per[s] == w * k
    # determinism: same inputs → same ids
    again = domain_mix_sample(df, "src", weights, "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


_keys = st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(hist=_keys, new=_keys)
def test_bloom_incremental_equals_anti_join_for_any_keys(spark, hist, new):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        bloom_incremental_new,
    )

    hist_df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(hist)], "id long, k string"
    )
    new_df = spark.createDataFrame(
        [(1000 + i, k) for i, k in enumerate(new)], "id long, k string"
    )
    got = sorted(r["id"] for r in bloom_incremental_new(new_df, hist_df, "k").collect())
    want = sorted(1000 + i for i, k in enumerate(new) if k not in set(hist))
    assert got == want  # no false negatives, verify join kills false positives


_words = st.lists(st.text(alphabet="ab", min_size=1, max_size=5), min_size=1, max_size=8)


@settings(**_SETTINGS)
@given(words=_words)
def test_bpe_detokenization_invariant_for_any_corpus(spark, words):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.bpe import (
        EOW,
        bpe_apply,
        bpe_train,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=4)
    row = bpe_apply(df, "doc_id", "text", merges).first()
    assert "".join(row["tokens"]).replace(EOW, " ").split() == words
    assert row["n_tokens"] == len(row["tokens"])


# -- round 7: chunking coverage, heavy-hitter exactness ----------------------

_tokens = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=3), min_size=0, max_size=40
)


@settings(**_SETTINGS)
@given(toks=_tokens, chunk=st.integers(1, 8), overlap=st.integers(0, 7))
def test_chunking_covers_every_token_in_order(spark, toks, chunk, overlap):
    """For ANY token list and window geometry: concatenating chunks with
    the overlap removed reproduces the space-normalized document, and
    every chunk obeys the size bound (the completeness/geometry contract
    behind the doc_chunks oracle)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        chunk_documents,
    )

    if overlap >= chunk:
        overlap = chunk - 1
    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    assert all(n <= chunk for _, n, _ in rows)
    assert [cid for cid, _, _ in rows] == list(range(len(rows)))
    stride = chunk - overlap
    rebuilt: list[str] = []
    for cid, _n, ctext in rows:
        ctoks = ctext.split(" ") if ctext else []
        rebuilt.extend(ctoks if cid == 0 else ctoks[overlap:])
    # trailing windows can re-cover already-seen tokens when the final
    # stride overruns; the rebuilt list must START with the original and
    # contain nothing new
    assert rebuilt[: len(toks)] == toks
    assert len(rebuilt) >= len(toks)


_stream = st.lists(st.integers(0, 30), min_size=1, max_size=120)


@settings(**_SETTINGS)
@given(items=_stream, den=st.integers(2, 10))
def test_heavy_hitters_equals_group_by_having(spark, items, den):
    """For ANY stream and threshold 1/den: the bounded-memory two-pass
    answer equals the plain GROUP BY HAVING answer exactly."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
        heavy_hitters,
    )

    df = spark.createDataFrame([(str(i),) for i in items], "item string").repartition(3)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", 1, den).collect()
    }
    n = len(items)
    exact = {
        (str(k), v)
        for k, v in __import__("collections").Counter(str(i) for i in items).items()
        if v * den >= n
    }
    assert got == exact


# --- round 8: codec properties (pure-Python, no Spark jobs — generous
# example counts are cheap here) ------------------------------------------


@given(st.lists(st.integers(0, 255), min_size=0, max_size=600))
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_any_index_stream(indices):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(8, _lzw_encode(8, indices), len(indices)) == indices


@given(
    st.lists(st.integers(0, 255), min_size=1, max_size=120),
    st.integers(1, 40),
    st.integers(1, 40),
)
@settings(max_examples=25, deadline=None)
def test_gif_image_roundtrip_any_raster(pixels, w, h):
    import numpy as np

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
        decode_gif,
        encode_gif_gray,
    )

    img = np.resize(np.array(pixels, dtype=np.uint8), (h, w))
    _, _, luma = decode_gif(encode_gif_gray(img, w, h))
    assert luma == [int(v) for v in img.reshape(-1)]


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=200), st.sampled_from(["mulaw", "alaw"]))
@settings(max_examples=40, deadline=None)
def test_g711_quantizer_idempotent_and_nearest(samples, law):
    import numpy as np

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        decode_wav,
        encode_wav_g711,
    )

    table = _MULAW_TABLE if law == "mulaw" else _ALAW_TABLE
    _, _, dec = decode_wav(encode_wav_g711(samples, 8000, law=law))
    for x, d in zip(samples, dec):
        # decoded value is a nearest table code (ties toward lower byte)
        assert abs(d - x) == int(np.abs(table - np.int64(x)).min())
    _, _, dec2 = decode_wav(encode_wav_g711(dec, 8000, law=law))
    assert dec2 == dec


@given(st.lists(st.integers(0, 255), min_size=1, max_size=150), st.integers(1, 30), st.integers(1, 30), st.booleans())
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_any_raster_plain_and_adam7(pixels, w, h, interlace):
    import numpy as np

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
        decode_png,
        encode_png_gray,
    )

    img = np.resize(np.array(pixels, dtype=np.uint8), (h, w))
    _, _, luma = decode_png(encode_png_gray(img.reshape(-1), w, h, interlace=interlace))
    assert luma == [int(v) for v in img.reshape(-1)]


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([64, 256, 4096]),
    st.sampled_from([None, "verbatim", "lpc"]),
    st.sampled_from([0, 2]),
)
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_any_signal(samples, block_size, subframe, po):
    """FLAC is lossless: decode(encode(x)) == x for ANY int16 signal,
    across block sizes, forced subframe types and partition orders —
    hypothesis explores constants, ramps, extremes and short tails."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    if subframe == "lpc" and len(samples) < 3:
        samples = samples + [0, 0]
    rate, ch, dec = decode_flac(
        encode_flac(
            [samples], 16000, block_size=block_size, subframe=subframe,
            partition_order=po,
        )
    )
    assert (rate, ch) == (16000, 1) and dec == samples


@given(
    st.lists(st.integers(-20000, 20000), min_size=2, max_size=200),
)
@settings(max_examples=25, deadline=None)
def test_flac_midside_roundtrip(left):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    right = left[::-1]
    _, ch, dec = decode_flac(encode_flac([left, right], 8000, stereo="mid/side"))
    assert ch == 2 and dec == left


@given(st.lists(st.integers(0, 255), min_size=1, max_size=256), st.integers(1, 16), st.integers(1, 16))
@settings(max_examples=25, deadline=None)
def test_phash_deterministic_any_raster(pixels, w, h):
    """pHash never crashes and is deterministic on arbitrary rasters
    (including degenerate 1×1) — the integer DCT path has no float, no
    overflow, no shape assumptions beyond 2-D."""
    import numpy as np

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.phash import (
        phash64,
    )

    r = np.resize(np.array(pixels, dtype=np.int64), (h, w))
    out = phash64(r)
    assert out == phash64(r)
    assert len(out[2]) == 64


# --- round-8 fourth session: web / sketch / graph / geo properties -------

_url_chars = st.text(
    alphabet="abcXYZ019-._~/?&=#: ", min_size=0, max_size=30
)


@settings(**_SETTINGS)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "Https"]),
    host=st.sampled_from(["a.b.com", "WWW.shop.co.uk", "X.Y.Z.example.org"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    rest=_url_chars,
)
def test_url_canonicalization_idempotent(spark, scheme, host, port, rest):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form is a FIXED POINT, so re-running the hygiene pass on an already
    clean corpus is a no-op — the property that makes incremental crawl
    merges safe."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
        canonicalize_url,
    )

    url = f"{scheme}://{host}{port}/{rest}"
    df = spark.createDataFrame([(url,)], ["u"])
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    assert once.collect() == twice.collect()


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(1, 10**12), min_size=1, max_size=40),
    split=st.integers(2, 4),
)
def test_logbucket_merge_equals_direct_and_bounds_error(spark, vals, split):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
        logbucket_estimate,
        logbucket_index,
        logbucket_merge,
        logbucket_sketch,
    )

    df = spark.createDataFrame([(v, i % split) for i, v in enumerate(vals)], "v long, g int")
    direct = sorted(map(tuple, logbucket_sketch(df, "v").collect()))
    parts = [logbucket_sketch(df.filter(F.col("g") == i), "v") for i in range(split)]
    merged = sorted(map(tuple, logbucket_merge(*parts).collect()))
    assert merged == direct
    # every value's midpoint representative is within 1/32 relative error
    rows = df.select(
        "v", logbucket_estimate(logbucket_index(F.col("v"))).alias("est")
    ).collect()
    for r in rows:
        assert abs(r["est"] - r["v"]) * 32 <= r["v"] + 32


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=25
    )
)
def test_triangle_count_matches_brute_force_any_multigraph(spark, edges):
    """Edge direction, duplicates, and self-loops never change the
    census — and the oriented-wedge count equals the O(n^3) truth."""
    import itertools as it

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
        triangle_count,
    )

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {v for e in simple for v in e}
    expect = sum(
        1 for a, b, c in it.combinations(sorted(nodes), 3)
        if (a, b) in simple and (b, c) in simple and (a, c) in simple
    )
    df = spark.createDataFrame(edges or [(0, 0)], "src int, dst int")
    r = triangle_count(df, "src", "dst").collect()[0]
    assert r["n_triangles"] == expect
    assert r["n_edges"] == len(simple)


@settings(**_SETTINGS)
@given(
    pts=st.lists(
        st.tuples(st.integers(-500, 500), st.integers(-500, 500)),
        min_size=1, max_size=25, unique=True,
    ),
    radius=st.integers(1, 400),
)
def test_proximity_pairs_complete_and_exact_any_cloud(spark, pts, radius):
    import itertools as it

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.geo import (
        proximity_pairs,
    )

    rows = [(i, la, lo) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, lat long, lon long")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist2"])
        for r in proximity_pairs(df, "id", "lat", "lon", radius).collect()
    )
    exp = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for a, b in it.combinations(rows, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= radius * radius
    )
    assert got == exp
