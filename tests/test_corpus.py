"""Corpus-curation operators: decontamination, boilerplate n-grams,
PII redaction."""

import pytest
from pyspark.sql import Row, functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
    PII_PATTERNS,
    redact_pii,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
    contaminated_docs,
    frequent_ngrams,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="a quick brown fox jumps over a sleeping cat"),
            Row(doc_id=3, text="completely unrelated content about databases"),
            Row(doc_id=4, text="short"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog today"),
        ]
    )


def test_contaminated_docs_flags_ngram_overlap(spark, docs):
    corpus = docs.filter(F.col("doc_id") != 1)
    eval_df = docs.filter(F.col("doc_id") == 1)
    hits = {
        r["doc_id"]: r["n_overlap"]
        for r in contaminated_docs(corpus, eval_df, "doc_id", "text", n=5).collect()
    }
    # doc 5 contains the full eval doc => shares all 5 of its 5-grams;
    # doc 2 shares "quick brown fox jumps over" ... no — eval 5-grams start
    # at "the quick ..."; doc 2's only candidate is "quick brown fox jumps
    # over", which IS an eval gram (positions 2-6).
    assert hits[5] == 5
    assert hits[2] == 1
    assert 3 not in hits and 4 not in hits


def test_contaminated_docs_min_overlap_threshold(spark, docs):
    corpus = docs.filter(F.col("doc_id") != 1)
    eval_df = docs.filter(F.col("doc_id") == 1)
    hits = contaminated_docs(
        corpus, eval_df, "doc_id", "text", n=5, min_overlap=2
    ).collect()
    assert {r["doc_id"] for r in hits} == {5}


def test_contaminated_docs_shuffle_fallback_matches(spark, docs):
    corpus = docs.filter(F.col("doc_id") != 1)
    eval_df = docs.filter(F.col("doc_id") == 1)
    a = sorted(
        map(tuple, contaminated_docs(corpus, eval_df, "doc_id", "text", n=5).collect())
    )
    b = sorted(
        map(
            tuple,
            contaminated_docs(
                corpus, eval_df, "doc_id", "text", n=5, broadcast_eval=False
            ).collect(),
        )
    )
    assert a == b


def test_frequent_ngrams_doc_freq(spark, docs):
    freq = {
        r["gram"]: r["doc_freq"]
        for r in frequent_ngrams(docs, "doc_id", "text", n=3, min_doc_freq=2).collect()
    }
    assert freq["quick brown fox"] == 3  # docs 1, 2, 5
    assert freq["the lazy dog"] == 2  # docs 1, 5
    assert "unrelated content about" not in freq  # doc_freq 1 filtered


def test_frequent_ngrams_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="x y z and x y z and x y z")]
    )
    # "x y z" appears 3x in ONE doc: doc_freq must be 1, filtered at >=2
    assert frequent_ngrams(df, "doc_id", "text", n=3, min_doc_freq=2).count() == 0


def test_redact_pii_all_shapes(spark):
    df = spark.createDataFrame(
        [
            Row(
                s="mail bob.smith+x@corp.example.org call 555-123-4567 "
                "host 192.168.001.1 ssn 078-05-1120 keep the rest"
            )
        ]
    )
    out = df.select(redact_pii(F.col("s")).alias("r")).head()["r"]
    assert "[EMAIL]" in out and "[PHONE]" in out and "[IP]" in out and "[SSN]" in out
    assert "bob.smith" not in out and "078-05" not in out
    assert out.endswith("keep the rest")


def test_redact_pii_email_before_phone_order(spark):
    # digits inside an email local part must not be half-eaten by the
    # phone pattern: email is scrubbed first
    df = spark.createDataFrame([Row(s="reach 555-123-4567x@y.io now")])
    out = df.select(redact_pii(F.col("s")).alias("r")).head()["r"]
    assert out == "reach [EMAIL] now"


def test_redact_pii_plain_text_untouched(spark):
    df = spark.createDataFrame([Row(s="no pii here just words 12 34")])
    assert df.select(redact_pii(F.col("s")).alias("r")).head()["r"] == (
        "no pii here just words 12 34"
    )


def test_pii_patterns_are_re2_safe():
    # oracle portability contract: no backrefs / lookaround, so the same
    # pattern set runs on Java regex AND RE2 (DuckDB) verbatim
    for pattern, _ in PII_PATTERNS:
        assert "(?=" not in pattern and "(?<" not in pattern and "\\1" not in pattern


def test_registry_pii_redact(spark, docs):
    out = apply_operator(
        "piiRedact",
        docs.withColumn("text", F.concat(F.col("text"), F.lit(" a@b.co"))),
        {"text_col": "text"},
    )
    assert all("[EMAIL]" in r["text"] for r in out.collect())


def test_registry_decontaminate_predicate_split(spark, docs):
    out = apply_operator(
        "decontaminate",
        docs,
        {
            "id_col": "doc_id",
            "text_col": "text",
            "eval_predicate": "doc_id = 1",
            "n": "5",
        },
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 5}


def test_registry_frequent_ngrams(spark, docs):
    out = apply_operator(
        "frequentNgrams",
        docs,
        {"id_col": "doc_id", "text_col": "text", "n": "3", "min_doc_freq": "3"},
    )
    assert {r["gram"] for r in out.collect()} == {
        "quick brown fox",
        "brown fox jumps",
        "fox jumps over",
    }


def test_repetition_profile_counts(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        repetition_profile,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),  # bigrams: ab ba ab ba ab
            Row(doc_id=2, text="w x y z"),      # all distinct
            Row(doc_id=3, text="solo"),          # < n tokens
        ]
    )
    rows = {r["doc_id"]: r for r in repetition_profile(df, "doc_id", "text", n=2).collect()}
    r1 = rows[1]
    assert r1["total_grams"] == 5 and r1["distinct_grams"] == 2
    assert r1["dup_gram_frac"] == 1.0 - 2 / 5
    assert r1["top_gram_frac"] == 3 / 5  # "a b" occurs 3x
    r2 = rows[2]
    assert r2["dup_gram_frac"] == 0.0 and r2["top_gram_frac"] == 1 / 3
    r3 = rows[3]
    assert r3["total_grams"] == 0 and r3["dup_gram_frac"] == 0.0


def test_remove_duplicate_spans_first_occurrence_wins(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f"),       # chunks: "a b c", "d e f"
            Row(doc_id=2, text="a b c x y z"),       # "a b c" dup -> dropped
            Row(doc_id=3, text="a b c d e f"),       # fully duplicate -> empty
        ]
    )
    out = {r["doc_id"]: r["text"] for r in
           remove_duplicate_spans(df, "doc_id", "text", span_tokens=3).collect()}
    assert out[1] == "a b c d e f"
    assert out[2] == "x y z"
    assert out[3] == ""


def test_remove_duplicate_spans_within_doc(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.corpus import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="p q r p q r tail")])
    out = remove_duplicate_spans(df, "doc_id", "text", span_tokens=3).head()["text"]
    assert out == "p q r tail"  # second "p q r" chunk dropped, short tail kept


def test_filter_reasons_rules_trip(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
        filter_reasons,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="tiny doc"),  # too_few_tokens + more
            Row(doc_id=2, text=" ".join(
                ["the", "of", "and", "to", "in", "is"]
                + [f"word{i}" for i in range(30)])),  # healthy: 36 distinct
        ]
    )
    out = {r["doc_id"]: r["r"] for r in
           df.select("doc_id", filter_reasons(F.col("text")).alias("r")).collect()}
    assert "too_few_tokens" in out[1]
    assert out[2] == []


def test_nfc_normalize_composes(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.register import (
        py_nfc_normalize,
    )

    df = spark.createDataFrame([Row(s="café plain")])
    out = df.select(py_nfc_normalize(F.col("s")).alias("n")).head()["n"]
    assert out == "café plain"
    assert len(out) == len("café plain") - 1


def test_registry_span_and_repetition_and_nfc(spark, docs):
    rep = apply_operator(
        "repetitionProfile", docs, {"id_col": "doc_id", "text_col": "text", "n": "2"}
    )
    assert rep.count() == docs.count()
    spans = apply_operator(
        "removeDuplicateSpans", docs,
        {"id_col": "doc_id", "text_col": "text", "span_tokens": "3"},
    )
    assert spans.count() == docs.count()
    nfc = apply_operator("nfcNormalize", docs, {"text_col": "text"})
    assert nfc.count() == docs.count()
    flt = apply_operator("filterWithReasons", docs, {"text_col": "text"})
    assert {"keep", "filter_reasons"} <= set(flt.columns)
    # docs fixture texts are < 30 tokens: every row trips too_few_tokens
    assert flt.filter(F.col("keep")).count() == 0
    assert all("too_few_tokens" in r["filter_reasons"] for r in flt.collect())
