"""End-to-end: the corpus-curation example pipeline (curate → dedup →
split) run from its real JSON configs via the manifest runner, with the
demo paths rewritten to the test tmp dir."""

import json
import os

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

EXAMPLE_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "corpus_curation")


def _load_config(name: str, sf_dir: str, out: str) -> dict:
    with open(os.path.join(EXAMPLE_DIR, name)) as f:
        text = f.read()
    text = text.replace("/tmp/corpus_curation_demo", out)
    text = text.replace("/root/testdata/sf0.001", sf_dir)
    return json.loads(text)


def test_corpus_curation_pipeline(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curation")
    manifest = {
        "name": "corpus_curation",
        "concurrency": 2,
        "retries": 1,
        "tasks": [
            {"name": "curate", "config": _load_config("curate.json", sf_dir, out)},
            {
                "name": "dedup",
                "config": _load_config("dedup.json", sf_dir, out),
                "dependsOn": ["curate"],
            },
            {
                "name": "split",
                "config": _load_config("split.json", sf_dir, out),
                "dependsOn": ["dedup"],
            },
            {
                "name": "assemble",
                "config": _load_config("assemble.json", sf_dir, out),
                "dependsOn": ["split"],
            },
        ],
    }
    outcomes = from_manifest(spark, manifest).run()
    assert all(o.state == "success" for o in outcomes.values())

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    kept = spark.read.parquet(f"{out}/kept_docs").count()
    rejected = spark.read.parquet(f"{out}/rejected_docs").count()
    assert kept + rejected == raw
    # every quarantined row carries at least one reason
    rej = spark.read.parquet(f"{out}/rejected_docs")
    assert rej.filter(F.col("filter_reasons") == "").count() == 0

    corpus = spark.read.parquet(f"{out}/corpus")
    assert 0 < corpus.count() <= kept
    splits = {r["split"] for r in corpus.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # partitionBy(split) landed hive-style split=... directories
    assert any(d.startswith("split=") for d in os.listdir(f"{out}/corpus"))
    # redaction + curation preserved ids uniquely
    assert corpus.select("doc_id").distinct().count() == corpus.count()

    # assemble stage: perplexity-filtered, exactly-mixed, BPE-tokenized
    tokenized = spark.read.parquet(f"{out}/tokenized")
    assert tokenized.count() > 0
    row = tokenized.first()
    assert row["n_tokens"] > 0 and isinstance(row["tokens"], str)
    mixture = {
        r["source"]: r["n_docs"]
        for r in spark.read.parquet(f"{out}/mixture_report").collect()
    }
    k = mixture.get("src2", 0)
    assert k > 0 and mixture.get("src0") == 2 * k and mixture.get("src3") == k
