"""Similarity-search pipeline on the config dialect — the round-6-late
vector operators as config steps over one embedding table:

  - pqTopk: product-quantization ANN (16-byte codes, ADC shortlist,
    exact rerank) — every vector's top-5 neighbors;
  - knnPagerank: centrality over the k-NN graph → the 25 most
    "representative" vectors (coreset selection);
  - quantizeEmbeddings: the int8 storage form written alongside.

    cd /root/repo && python examples/similarity_search/run.py

At 100 TB the same config runs unchanged: codebook training is m tiny
driver jobs, encoding is one Arrow map stage, ADC scoring reads 16-byte
codes (not raw vectors), and PageRank is a fixed count of equi-join +
grouped-sum rounds.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import (
    Orchestrator,
    get_session,
)

DEMO = "/tmp/similarity_search_demo"


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="similarity-search-demo")
    Orchestrator(spark).run(os.path.join(os.path.dirname(__file__), "search.json"))

    nn = spark.read.parquet(f"{DEMO}/pq_neighbors")
    reps = spark.read.parquet(f"{DEMO}/representatives")
    qt = spark.read.parquet(f"{DEMO}/quantized")
    n_q = nn.select("query_id").distinct().count()
    print(f"pq_neighbors: {nn.count()} rows over {n_q} queries")
    print(f"representatives: {reps.count()}; quantized: {qt.count()}")
    assert nn.count() == 500 * 5 and n_q == 500
    assert reps.count() == 25
    assert qt.count() == 500 and qt.columns == ["vec_id", "scale", "codes"]
    print("similarity_search example OK")


if __name__ == "__main__":
    main()
