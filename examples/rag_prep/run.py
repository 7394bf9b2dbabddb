"""RAG retrieval-index preparation on the config dialect (round 7):

  1. chunk — `dsirSelect` (round-8 fifth session: DSIR importance
     selection of the most target-like documents — hashed n-gram
     buckets, integer log-ratio scores) runs first as the in-domain
     curation pass, then `chunkDocuments` (64-token windows, 16
     overlap; pure JVM HOFs, zero shuffle) → stable chunk keys +
     xxhash64 fingerprints → `exactDedupSurvivors` drops repeated
     chunk text corpus-wide → per-corpus chunk stats.
  2. index — `invertedIndex` (df-banded postings, reducer state bounded
     by max_df) + `tfidfTopTerms` (top-3 descriptors per chunk) over
     the deduped chunks, then hybrid retrieval (round 8): `bm25Score`
     over a fixed query, a length-prior ranking, and `rrfFuse` — the
     integer reciprocal-rank combiner — producing the fused candidate
     set.

    cd /root/repo && python examples/rag_prep/run.py

The same configs run unchanged at corpus scale: chunking is row-local,
dedup is one hash-groupBy, and both index builds are single-scan
aggregations with map-side partials.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
    from_manifest,
)

DEMO = "/tmp/rag_prep_demo"


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="rag-prep-demo")

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    import duckdb

    n_chunks, n_docs, total_tokens = duckdb.sql(
        f"SELECT n_chunks, n_docs, total_tokens FROM '{DEMO}/chunk_stats/*.parquet'"
    ).fetchone()
    print(f"chunks: {n_chunks} over {n_docs} docs, {total_tokens} tokens")
    assert n_docs == 500 and n_chunks >= n_docs and total_tokens > 0

    # every chunk respects the window geometry and the overlap stitches:
    bad = duckdb.sql(
        f"SELECT COUNT(*) FROM '{DEMO}/chunks/*.parquet' WHERE n_tokens > 64 OR n_tokens <= 0"
    ).fetchone()[0]
    assert bad == 0

    # DSIR in-domain selection: the src18 target docs (doc_id % 20 = 18)
    # outrank the rest of the corpus under their own importance weights
    dsir = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN doc_id % 20 = 18 THEN 1 ELSE 0 END),"
        f" MIN(weight) FROM '{DEMO}/domain_docs/*.parquet'"
    ).fetchone()
    n_tgt = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.01/documents.parquet' "
        "WHERE source = 'src18'"
    ).fetchone()[0]
    print(f"dsir selection: {dsir[0]} docs, {dsir[1]}/{n_tgt} target docs kept")
    assert dsir[0] == 200 and dsir[1] == n_tgt  # every target doc selected

    postings = duckdb.sql(
        f"SELECT COUNT(*), MIN(df), MAX(df) FROM '{DEMO}/postings/*.parquet'"
    ).fetchone()
    print(f"postings: {postings[0]} terms, df in [{postings[1]}, {postings[2]}]")
    assert postings[0] > 0 and postings[1] >= 2

    terms = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT chunk_pk) FROM '{DEMO}/chunk_terms/*.parquet'"
    ).fetchone()
    print(f"tfidf descriptors: {terms[0]} rows over {terms[1]} chunks (top-3 each)")
    assert terms[0] <= 3 * n_chunks and terms[1] > 0

    # hybrid retrieval: BM25 top-50 fused with a length-prior top-50 via
    # integer reciprocal-rank fusion (round-8 steps bm25Score + rrfFuse)
    fused = duckdb.sql(
        f"""SELECT COUNT(*), MAX(n_lists), MIN(rrf_units)
            FROM '{DEMO}/fused/*.parquet'"""
    ).fetchone()
    print(f"fused candidates: {fused[0]} (max n_lists {fused[1]})")
    assert 50 <= fused[0] <= 100 and fused[1] == 2 and fused[2] > 0
    both = duckdb.sql(
        f"SELECT COUNT(*) FROM '{DEMO}/fused/*.parquet' WHERE n_lists = 2"
    ).fetchone()[0]
    print(f"chunks ranked by BOTH lists: {both}")
    print("rag_prep example OK")


if __name__ == "__main__":
    main()
