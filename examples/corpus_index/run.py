"""Corpus indexing + clustering on the config dialect (round-6 operators
as config steps — the retrieval/analysis counterpart of the
corpus_curation example):

  1. index   — TF-IDF top terms per doc, df-bounded inverted index,
               corpus-relative quality culling (top quartile), weighted
               priority sample (en 4x, de/fr 2x).
  2. cluster — exact trigram-Jaccard near-dup pairs → connected-component
               dup clusters; DataFrame-only k-means over the embedding
               table + cluster histogram.

    cd /root/repo && python examples/corpus_index/run.py

The two jobs are independent (concurrency 2 in the manifest). At 100 TB
the same configs run unchanged: df-band bounds posting-list state,
prefix filtering bounds the pair join, k-means assignment is an Arrow
map stage with k-row driver updates.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

DEMO = "/tmp/corpus_index_demo"


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="corpus-index-demo")

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    terms = spark.read.parquet(f"{DEMO}/doc_terms")
    index = spark.read.parquet(f"{DEMO}/term_index")
    quality = spark.read.parquet(f"{DEMO}/top_quality").count()
    sample = spark.read.parquet(f"{DEMO}/mixture_sample")
    print(f"doc_terms: {terms.count()} rows over {terms.select('doc_id').distinct().count()} docs")
    print(f"term_index: {index.count()} terms; top-quality docs kept: {quality}")
    assert terms.count() > 0 and index.count() > 0
    assert 125 <= quality <= 500  # >= because threshold ties all survive
    assert sample.count() == 100

    pairs = spark.read.parquet(f"{DEMO}/near_dup_pairs").count()
    clusters = spark.read.parquet(f"{DEMO}/dup_clusters")
    sizes = spark.read.parquet(f"{DEMO}/cluster_sizes")
    print(f"near-dup pairs: {pairs}; dup clusters over {clusters.count()} member docs")
    print("k-means cluster sizes:")
    sizes.orderBy("cluster").show()
    assert pairs > 0 and clusters.count() > 0
    assert sizes.agg({"n_vectors": "sum"}).first()[0] == 500


if __name__ == "__main__":
    main()
