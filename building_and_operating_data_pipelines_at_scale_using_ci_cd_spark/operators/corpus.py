"""Corpus-level n-gram analyses for training-data curation:
benchmark decontamination and boilerplate (frequent n-gram) detection.

Both are staples of an LLM data pipeline that the relational surface
alone doesn't name: before training, every corpus is (a) scrubbed of
documents that overlap the evaluation benchmarks (else the benchmark is
leaked into the weights) and (b) profiled for boilerplate n-grams
(navigation bars, license headers) that repeat across many documents.

Scale posture (100 TB): the corpus side of both operators is a narrow
map + explode; the only shuffle is the final per-gram / per-doc
aggregation. Decontamination joins against the *eval* gram set, which is
bounded by the benchmark suite (thousands of docs), so it broadcasts —
the 100-TB corpus is never shuffled for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles_from_tokens, tokens


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) rows: one row per DISTINCT token n-gram per document.

    Tokenizes in one projection and shingles in the next — the shingle
    lambda slices the token array per index, and Spark does not hoist
    loop-invariant expressions out of higher-order-function lambdas, so
    an inline split() would re-tokenize the document once per gram (the
    O(n²) trap documented in functions.text.shingles_from_tokens)."""
    tk = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__tk"),
        F.rand().alias("__b0"),  # barrier: stop CollapseProject merging
    )
    return tk.select(
        "__id", F.explode(shingles_from_tokens(F.col("__tk"), n)).alias("gram")
    )


def contaminated_docs(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥
    ``min_overlap`` distinct token ``n``-grams with any document in
    ``eval_df`` — the standard n-gram-collision test (the 8-gram /
    13-gram overlap checks used for public-benchmark leakage).

    Returns (id_col, n_overlap) for flagged documents. The eval gram set
    is DISTINCT'd and broadcast by default (benchmarks are small);
    ``broadcast_eval=False`` falls back to a shuffle join for unusually
    large eval sets.
    """
    cg = _gram_rows(corpus, id_col, text_col, n)
    eg = _gram_rows(eval_df, id_col, text_col, n).select("gram").distinct()
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        cg.join(eg, "gram")
        .groupBy("__id")
        .agg(F.count_distinct("gram").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(F.col("__id").alias(id_col), "n_overlap")
    )


def frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Boilerplate profile: token ``n``-grams appearing in at least
    ``min_doc_freq`` DISTINCT documents, with their document frequency.

    Returns (gram, doc_freq). One explode + one groupBy — the doc-freq
    aggregation is the only shuffle, and partial aggregation (map-side
    combine) collapses repeated grams before it."""
    return (
        _gram_rows(df, id_col, text_col, n)
        .groupBy("gram")
        .agg(F.count_distinct("__id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
    )
