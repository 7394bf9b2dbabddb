"""An LLM training-data curation pipeline on the config dialect: the
north-star counterpart of the shareprice example.

Three chained jobs (see manifest.json), every transformation a config
step — no hand-written driver code:

  1. curate  — NFC-normalize, redact PII, apply the C4/Gopher filter
               ledger; fan out kept docs + quarantined docs with reasons.
  2. dedup   — exact dedup, C4-style global span dedup, rejoin metadata,
               benchmark decontamination report (eval slice = doc_id%10=0).
  3. split   — deterministic hash split (90/5/5) partitioned-by-split
               corpus + Gopher repetition report.
  4. assemble — unigram-LM perplexity filter (drop the worst decile),
               exact-ratio domain mixture, BPE tokenization (round 5).

    cd /root/repo && python examples/corpus_curation/run.py

At 100 TB the same configs run unchanged: every operator step is a lazy
DataFrame program (broadcast eval grams, per-chunk windows, md5-keyed
splits), and the partitionBy sink lands the corpus split-partitioned for
downstream training readers.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

DEMO = "/tmp/corpus_curation_demo"


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="corpus-curation-demo")

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    corpus = spark.read.parquet(f"{DEMO}/corpus")
    kept = spark.read.parquet(f"{DEMO}/kept_docs").count()
    rejected = spark.read.parquet(f"{DEMO}/rejected_docs").count()
    contaminated = spark.read.parquet(f"{DEMO}/contamination_report").count()
    print(f"\nkept {kept} / rejected {rejected} (of 500 raw docs)")
    print(f"contaminated vs eval slice: {contaminated}")
    print("final corpus by split:")
    corpus.groupBy("split").count().orderBy("split").show()
    assert kept + rejected == 500
    assert corpus.count() > 0 and set(
        r["split"] for r in corpus.select("split").distinct().collect()
    ) <= {"train", "val", "test"}

    tokenized = spark.read.parquet(f"{DEMO}/tokenized")
    mixture = {r["source"]: r["n_docs"] for r in spark.read.parquet(f"{DEMO}/mixture_report").collect()}
    print(f"tokenized {tokenized.count()} docs; mixture: {mixture}")
    assert tokenized.count() > 0 and tokenized.first()["n_tokens"] > 0
    # exact 2:2:1:1 mixture at the largest feasible k
    k = mixture.get("src2", 0)
    assert k > 0 and mixture["src0"] == 2 * k and mixture["src3"] == k


if __name__ == "__main__":
    main()
