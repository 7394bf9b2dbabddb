"""Corpus indexing operators (SURVEY.md §2.10 extension): TF-IDF term
scoring and a bounded inverted index — the retrieval-side bookkeeping a
training-data pipeline needs next to dedup/quality filtering (keyword
dedup audits, corpus search, per-domain vocabulary drift).

Both operators share :func:`..functions.text.word_tokens` — the
engine-portable tokenizer ([a-z0-9] runs) every text operator here uses,
so an oracle engine reproduces the token stream byte-for-byte.

Scale shape:
  - TF-IDF: ONE corpus explode into a PERSISTED (doc,term) aggregate
    that feeds both consumers — Catalyst does not reuse the exchange
    when an aggregate feeds a per-term groupBy AND a join back to
    itself, so the un-persisted formulation re-ran the whole explode
    subtree (measured: 3 corpus scans). Document frequency is then a
    map-side-partial groupBy joined back (AQE broadcasts the
    vocabulary-sized side). NOT a count window over the term: a
    stopword's window partition is n_docs rows in ONE task — the
    straggler the broadcast join exists to avoid.
  - Inverted index: the naive plan (collect_list per term, slice after)
    buffers a hot term's ENTIRE posting list in one reducer — a stopword
    at 100 TB is a single-task OOM. So the index is df-bounded first:
    document frequency from a map-side-partial groupBy over the persisted
    distinct (doc, term) table, the mid-frequency band [min_df, max_df]
    filters BEFORE any list is built, and only then are postings
    collected — bounded by ``max_df`` rows per term by construction,
    not by luck.

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
    # persisted: tf feeds BOTH the df aggregation and the scoring join —
    # without it the whole explode subtree runs once per consumer (see
    # module docstring)
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=False)
    # tf rows are (doc, term)-distinct, so a count per term IS the
    # document frequency — map-side partial agg, vocabulary-sized output
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    idf = F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    scored = (
        tf.join(dfc, "term")
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
    # persisted: doc_terms feeds BOTH the df aggregation and the postings
    # join — without it the explode+distinct subtree runs per consumer
    doc_terms = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(word_tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dfc = (
        doc_terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    # no broadcast hint: the filtered band is vocabulary-shaped, which a
    # 100 TB corpus can still grow past any broadcast threshold — let
    # AQE pick broadcast when the runtime size allows it
    return (
        doc_terms.join(dfc, "term")
        .groupBy("term", "df")
        .agg(
            F.slice(F.array_sort(F.collect_list("__id")), 1, max_postings).alias(
                "postings"
            )
        )
        .select("term", F.col("df").cast("int").alias("df"), "postings")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query-term
    set — the lexical half of hybrid retrieval (the vector half is the
    ANN tier in ``similarity.py``; fuse with :func:`rrf_fuse`). Uses the
    Lucene idf form ln(1 + (N−df+0.5)/(df+0.5)), always positive.

    Returns (id, n_matched_terms, bm25) for documents matching ≥1 query
    term — a deterministic ROW SET (the float only decides values).

    Scale shape: document length comes from ``size(word_tokens(text))``
    — a map-only projection, no explode; only tokens IN the query set
    are exploded and aggregated (the shuffle carries |q| terms per doc,
    not the corpus vocabulary); per-term document frequency is a
    |q|-row broadcast; N/avgdl attach as a 1-row broadcast scalar (the
    allowlisted BNLJ pattern — never a driver collect).

    Cross-engine contract: the score is ROUND(·, round_dp) — the same
    4dp rounding proven on ``lm_cross_entropy``'s logs; everything
    else (tf, df, dl, N) is exact-integer and avgdl is one exact
    division of an integer sum.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    terms = sorted(set(query_terms))
    dl = df.select(
        F.col(id_col).alias("__id"),
        F.size(word_tokens(F.col(text_col))).alias("__dl"),
    ).localCheckpoint(eager=False)
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(word_tokens(F.col(text_col))).alias("__tok"),
        )
        .filter(F.col("__tok").isin(terms))
        .groupBy("__id", "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "__tok")
        .join(dl, "__id")
        .crossJoin(F.broadcast(stats))  # 1-row scalar attach
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_matched_terms"),
            F.round(F.sum(contrib), round_dp).alias("bm25"),
        )
        .select(F.col("__id").alias(id_col), "n_matched_terms", "bm25")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 10**9,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists over one id space:
    rrf(id) = Σ_lists scale // (k + rank) — the standard hybrid-search
    combiner (lexical ∪ vector), with the reciprocal QUANTIZED to an
    integer so the fused score (and therefore the fused ORDER) is exact
    on every engine: integer division + integer sum, no float anywhere.

    Inputs each carry (id_col, rank_col); an id absent from a list
    contributes 0 for it (full outer union semantics). Returns
    (id, n_lists, rrf_units) — callers order by (rrf_units DESC, id).

    Scale shape: one unionByName + one groupBy on the id — a single
    shuffle regardless of list count; each input list is usually
    already top-k-bounded by its producer.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k <= 0:
        raise ValueError("rrf k must be positive")
    # integer DIV, never float-divide-then-truncate: a true quotient that
    # lands within one ulp of an integer would truncate differently as a
    # double than under exact integer division
    units = F.expr(
        f"CAST({scale} AS BIGINT) DIV (CAST({k} AS BIGINT) + CAST({rank_col} AS BIGINT))"
    )
    parts = [r.select(F.col(id_col), units.alias("__units")) for r in rankings]
    from functools import reduce

    allr = reduce(lambda a, b: a.unionByName(b), parts)
    return allr.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("__units").cast("bigint").alias("rrf_units"),
    )
