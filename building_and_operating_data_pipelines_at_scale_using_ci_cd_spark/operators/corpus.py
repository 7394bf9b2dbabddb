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

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import shingles_from_tokens, tokens


def _spread(df: DataFrame) -> DataFrame:
    """Round 12 (same helper as operators/dedup.py): the tokenize/gram
    HOF passes below are CPU-bound per row and a small parquet input
    arrives as 1-2 partitions — spread rows across the cluster first.
    CONDITIONAL: a no-op whenever the scan is already at least as wide
    as the cluster (the 100 TB case), so it never adds a shuffle at
    scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) rows: one row per DISTINCT token n-gram per document.

    Tokenizes in one projection and shingles in the next — the shingle
    lambda slices the token array per index, and Spark does not hoist
    loop-invariant expressions out of higher-order-function lambdas, so
    an inline split() would re-tokenize the document once per gram (the
    O(n²) trap documented in functions.text.shingles_from_tokens)."""
    df = _spread(df)
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


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Per-document repetition metrics over token ``n``-grams (the
    Gopher-style repetition filters): total vs distinct gram counts, the
    duplicate-gram fraction, and the share of the single most frequent
    gram. Docs shorter than ``n`` tokens report zero grams and 0.0
    fractions.

    Returns (id_col, total_grams, distinct_grams, dup_gram_frac,
    top_gram_frac). Shape: one explode + groupBy(id, gram) + groupBy(id)
    — both aggregations partial-agg (map-side combine) and shuffle on
    id-derived keys, never corpus-wide state.
    """
    tk = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.lower(F.col(text_col))).alias("__tk"),
        F.rand().alias("__b0"),  # barrier: stop CollapseProject merging
    )
    # ALL grams (not distinct — repetition is the point)
    idx = F.sequence(F.lit(1), F.size(F.col("__tk")) - F.lit(n - 1))
    grams = tk.select(
        "__id",
        F.explode(
            F.when(
                F.size(F.col("__tk")) >= n,
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("__tk"), i, n))),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    per_gram = grams.groupBy("__id", "gram").agg(F.count("*").alias("cnt"))
    per_doc = per_gram.groupBy("__id").agg(
        F.sum("cnt").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.max("cnt").alias("top_cnt"),
    )
    # left join back so sub-n-token docs still get a (zeroed) row
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            F.coalesce("distinct_grams", F.lit(0)).alias("distinct_grams"),
            F.when(
                F.col("total_grams").isNotNull(),
                F.lit(1.0) - F.col("distinct_grams") / F.col("total_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_gram_frac"),
            F.when(
                F.col("total_grams").isNotNull(), F.col("top_cnt") / F.col("total_grams")
            )
            .otherwise(F.lit(0.0))
            .alias("top_gram_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, span_tokens: int = 3
) -> DataFrame:
    """C4-style global span dedup: split every document into consecutive
    non-overlapping ``span_tokens``-token chunks, keep only the FIRST
    occurrence of each chunk corpus-wide (ordered by id, then position),
    and reassemble the surviving chunks in document order.

    Returns (id_col, text_col) — documents reduced to never-seen-before
    spans; docs whose every span was already seen come back empty-string.

    Shape: explode → one ``groupBy(chunk).agg(min(struct(id, pos)))``
    (the first-occurrence choice is an AGGREGATION, not a ranking, so
    partial aggregation / map-side combine absorbs hyper-common
    boilerplate chunks before the shuffle — a ``Window.partitionBy(
    chunk)`` would instead serialize every occurrence of a boilerplate
    chunk into one straggler task at crawl scale) → one groupBy(id)
    reassembly. ``concat_ws`` over ``array_sort(collect_list(...))`` per
    doc is bounded by document length.
    """
    tk = _spread(df).select(
        F.col(id_col).alias("__id"),
        tokens(F.col(text_col)).alias("__tk"),
        F.rand().alias("__b0"),  # barrier: stop CollapseProject merging
    )
    n_chunks = F.ceil(F.size(F.col("__tk")) / F.lit(span_tokens)).cast("int")
    chunk_arr = F.when(
        n_chunks >= 1,  # guard: sequence(0, -1) would count DOWN
        F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("__tk"), i * span_tokens + 1, span_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunks = tk.select("__id", F.posexplode(chunk_arr).alias("pos", "chunk"))
    # min(struct(id, pos)) == the (id, pos)-least occurrence: struct
    # ordering is field-by-field, exactly orderBy(id, pos) rank 1 — and
    # the winner row carries everything downstream needs, so no join.
    kept = chunks.groupBy("chunk").agg(
        F.min(F.struct("__id", "pos")).alias("__w")
    ).select(F.col("__w.__id").alias("__id"), F.col("__w.pos").alias("pos"), "chunk")
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias(text_col)
    )
    # docs whose every span was seen before still get an (empty) row
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """RAG-prep chunker: split each document into ``chunk_tokens``-token
    windows advancing by ``chunk_tokens - overlap`` (overlapping windows
    keep context across chunk boundaries — the standard retrieval-index
    preparation). Emits (id, chunk_id, n_tokens, chunk_text); the final
    window may be shorter; a document shorter than one stride still
    yields its single chunk.

    Whitespace contract (shared with the DuckDB oracle): tokens are the
    non-empty fields of a single-space split — runs of spaces collapse,
    tabs/newlines stay inside tokens, and rejoining uses one space, so
    ``overlap=0`` chunk_texts concatenate back to the space-normalized
    document.

    Null contract: documents whose text is NULL produce NO chunks (they
    are filtered up front). Without the filter the chunk_id==0
    keep-branch fires on a null token array and emits a spurious
    (chunk_id 0, null n_tokens, null chunk_text) row whose cross-engine
    NULL semantics the oracle need not share. An empty-but-non-null
    document still yields its single empty chunk.

    Shape at scale: pure JVM higher-order functions — one projection
    tokenizes, ``sequence``/``posexplode`` fans out window starts, and
    ``slice`` cuts each window from the token array. NO shuffle at all
    (chunking is embarrassingly row-local) and no Python; output rows ≈
    input tokens / stride, so the explode factor is bounded by the
    chunk geometry, not the corpus."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    df = df.filter(F.col(text_col).isNotNull())
    tk = df.select(
        F.col(id_col).alias("__id"),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("__tk"),
    )
    n = F.size(F.col("__tk"))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = tk.select(
        "__id", "__tk", F.posexplode(starts).alias("chunk_id", "__start")
    ).filter((F.col("__start") < F.size(F.col("__tk"))) | (F.col("chunk_id") == 0))
    win = F.slice(F.col("__tk"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        F.col("__id").alias(id_col),
        "chunk_id",
        F.size(win).alias("n_tokens"),
        F.array_join(win, " ").alias("chunk_text"),
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


def term_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
    max_terms_per_doc: int | None = None,
) -> DataFrame:
    """Document-level term co-occurrence with integer association
    strength — the counting core of PMI/collocation analysis. Returns
    (term_a, term_b, pair_docs, docs_a, docs_b, n_docs, lift_x1000)
    for every unordered term pair sharing a document, where
    ``lift_x1000 = floor(1000 · pair_docs · n_docs / (docs_a·docs_b))``.
    Lift is P(a,b)/(P(a)P(b)) and PMI is its log, a MONOTONE transform —
    so ranking by the all-integer lift IS ranking by PMI, with no float
    log to diverge across engines (the knn_pagerank integer-mass
    lesson applied to collocations). Tokens are the shared single-space
    split contract; terms are per-document DISTINCT (document-level
    co-occurrence, not positional windows).

    Shape at scale — the pair explosion is the danger (Σ_d C(t_d, 2)):
      1. the doc-frequency band filter runs BEFORE any pairing (the
         ``inverted_index`` lesson): drop hapaxes (< min_doc_freq, they
         cannot co-occur meaningfully) and stopword-frequency terms
         (> max_doc_freq, they pair with EVERYTHING — the quadratic
         blowup at corpus scale);
      2. ``max_terms_per_doc`` optionally caps each document's
         contribution to its N RAREST kept terms (ascending df, then
         term — deterministic), bounding pairs per doc at C(N, 2)
         regardless of document length;
      3. the pair generator is a self-equi-join on doc id (never a
         cross join), and the final count is one map-side-combinable
         groupBy; n_docs attaches as a 1-row broadcast scalar."""
    if min_doc_freq < 1:
        raise ValueError("min_doc_freq must be >= 1")
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(
                    F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
                )
            ).alias("term"),
        )
    )
    dfc = toks.groupBy("term").agg(F.count("*").alias("__df"))
    band = dfc.filter(F.col("__df") >= min_doc_freq)
    if max_doc_freq is not None:
        band = band.filter(F.col("__df") <= max_doc_freq)
    kept = toks.join(band, "term")
    if max_terms_per_doc is not None:
        w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("term").asc())
        kept = (
            kept.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_terms_per_doc)
            .drop("__rk")
        )
    a = kept.select(F.col("__id"), F.col("term").alias("term_a"), F.col("__df").alias("docs_a"))
    b = kept.select(F.col("__id"), F.col("term").alias("term_b"), F.col("__df").alias("docs_b"))
    pairs = (
        a.join(b, "__id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "docs_a", "docs_b")
        .agg(F.count("*").alias("pair_docs"))
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        "pair_docs",
        F.col("docs_a").cast("bigint").alias("docs_a"),
        F.col("docs_b").cast("bigint").alias("docs_b"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        # DIV (not /) keeps the arithmetic in exact bigint — a float
        # quotient could land at x.999... and truncate differently than
        # DuckDB's integer // on division-exact boundaries
        F.expr(
            "CAST((1000 * pair_docs * n_docs) DIV (docs_a * docs_b) AS BIGINT)"
        ).alias("lift_x1000"),
    )


def quality_quantile_cut(
    df: DataFrame,
    id_col: str,
    text_col: str,
    q: float = 0.75,
    accuracy: int | None = None,
) -> DataFrame:
    """Corpus-level quality-quantile culling — keep the documents whose
    heuristic quality score reaches the corpus's own ``q``-quantile (the
    FineWeb/CCNet move: thresholds are set relative to the corpus, not
    as absolute constants, so the same config culls the same share of
    any corpus).

    Scale shape: the quantile is computed by ONE aggregate and attached
    as a one-row broadcast (never a driver collect); membership is then
    a per-row predicate. With ``accuracy=None`` the aggregate is Spark's
    EXACT ``percentile`` — a single-reduce agg that buffers the value
    multiset, fine to ~10^8 rows and what an oracle engine can
    reproduce; pass an ``approx_percentile`` accuracy (e.g. 10000) at
    real corpus scale, where the t-digest sketch merges map-side and the
    threshold stops being exactly reproducible (documented trade).

    Cross-engine contract: scores are already rounded (quality_score →
    4dp) and the threshold is rounded to 6dp before the comparison, so
    both engines compare identical bits — an interpolation last-ulp
    difference cannot flip boundary membership.

    Returns (id, quality) for the surviving documents."""
    from ..functions.text import quality_score

    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    scored = df.select(
        F.col(id_col), quality_score(F.col(text_col)).alias("quality")
    )
    if accuracy is None:
        pct = F.expr(f"percentile(quality, {q!r})")
    else:
        pct = F.expr(f"approx_percentile(quality, {q!r}, {int(accuracy)})")
    thr = scored.agg(F.round(pct, 6).alias("__thr"))
    return (
        scored.join(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("__thr"))
        .select(id_col, "quality")
    )
