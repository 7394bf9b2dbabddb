"""Corpus indexing operators (SURVEY.md §2.10 extension): TF-IDF term
scoring and a bounded inverted index — the retrieval-side bookkeeping a
training-data pipeline needs next to dedup/quality filtering (keyword
dedup audits, corpus search, per-domain vocabulary drift).

Both operators share :func:`..functions.text.word_tokens` — the
engine-portable tokenizer ([a-z0-9] runs) every text operator here uses,
so an oracle engine reproduces the token stream byte-for-byte.

Scale shape:
  - TF-IDF: ONE corpus explode + one (doc,term) aggregation; document
    frequency rides a count window over that aggregated table (term
    partitions are df-sized), the doc count is a one-row broadcast, and
    ranking is a per-document window. A groupBy+join formulation of df
    re-runs the whole explode subtree — Catalyst does not reuse the
    exchange across the two consumers (measured: 3 corpus scans).
  - Inverted index: the naive plan (collect_list per term, slice after)
    buffers a hot term's ENTIRE posting list in one reducer — a stopword
    at 100 TB is a single-task OOM. So the index is df-bounded first:
    document frequency attaches as a count window over the distinct
    (doc, term) table, the mid-frequency band [min_df, max_df] filters
    BEFORE any list is built, and only then are postings collected —
    bounded by ``max_df`` rows per term by construction, not by luck;
    the final groupBy reuses the window's term partitioning (no extra
    shuffle).

Cross-engine determinism: ranks order by the tfidf score ROUNDED to 9
decimals (then term ascending). Raw float ordering would let a last-ulp
libm difference between engines flip ranks of two near-equal scores; at
9 decimals both engines see identical keys unless the true values
actually differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import word_tokens


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
) -> DataFrame:
    """Top ``top_n`` TF-IDF terms per document. idf uses the smoothed
    form ln((1+N)/(1+df)) + 1 (the sklearn convention) so unseen-df
    edge cases never divide by zero. Returns (id, rank, term, tf, df,
    tfidf) with tfidf rounded to 4 decimals."""
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are (doc, term)-distinct, so a COUNT WINDOW per term over tf
    # IS the document frequency — attached in place, so the corpus is
    # exploded and aggregated exactly once (a separate groupBy + join
    # re-ran the whole explode subtree: Catalyst does not reuse the
    # exchange across the two consumers — measured 3 corpus scans)
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    idf = F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(n_docs))
        .withColumn("__key", F.round(F.col("tf") * idf, 9))
    )
    w = Window.partitionBy("__id").orderBy(F.col("__key").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("__id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            F.round(F.col("__key"), 4).alias("tfidf"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 5,
    max_df: int = 50,
    max_postings: int = 10,
) -> DataFrame:
    """Mid-frequency inverted index: term → document frequency + the
    first ``max_postings`` doc ids (ascending). Terms outside
    [min_df, max_df] are excluded BEFORE postings are materialized, so
    per-term reducer state is bounded by ``max_df`` at any corpus size
    (see module docstring). Returns (term, df, postings)."""
    if not 0 < min_df <= max_df:
        raise ValueError("need 0 < min_df <= max_df")
    doc_terms = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(word_tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    # df as a COUNT WINDOW per term, attached in place: the corpus is
    # exploded/distinct'd exactly once (a groupBy+join formulation re-ran
    # the whole subtree — Catalyst does not reuse the exchange across two
    # consumers), and the final groupBy reuses the window's term
    # partitioning, so the band filter costs no extra shuffle
    banded = doc_terms.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    return (
        banded.groupBy("term", "df")
        .agg(
            F.slice(F.array_sort(F.collect_list("__id")), 1, max_postings).alias(
                "postings"
            )
        )
        .select("term", F.col("df").cast("int").alias("df"), "postings")
    )
