"""Config-dialect operator steps (operatorName alongside sqlQuery):
curation operators chained with SQL in one job config."""

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    OPERATORS,
    apply_operator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.engine import Orchestrator


def _curation_cfg(sf_dir, out):
    return {
        "configs": {
            "name": "config_curation",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "documents",
                    "path": f"{sf_dir}/documents.parquet",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {
                    "operatorName": "exactDedupSurvivors",
                    "inputDFName": "documents",
                    "operatorParams": {"text_col": "text", "id_col": "doc_id"},
                    "outputDFName": "unique_docs",
                },
                {
                    "operatorName": "textEnrich",
                    "inputDFName": "unique_docs",
                    "operatorParams": {"text_col": "text"},
                    "outputDFName": "enriched",
                },
                {
                    "functionName": "keep good english",
                    "sqlQuery": "SELECT doc_id, text, predicted_lang, quality "
                                "FROM enriched WHERE predicted_lang = 'en' AND quality >= 0.5",
                    "outputDFName": "kept",
                },
                {
                    "operatorName": "hashSplit",
                    "operatorParams": {"id_col": "doc_id",
                                       "weights": {"train": 0.9, "val": 0.1}},
                    "outputDFName": "final",
                },
            ],
        },
        "phase_3": {
            "target_record_insert": [
                {"dataTarget": "local", "dataFrameName": "final",
                 "loadType": "truncateInsert", "path": out,
                 "outputDataProperties": {"fileFormat": "parquet",
                                          "partitionBy": ["split"]}}
            ]
        },
    }


def test_config_curation_pipeline(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    res = Orchestrator(spark).run(_curation_cfg(sf_dir, out))
    written = spark.read.parquet(out)
    assert set(written.columns) >= {"doc_id", "quality", "split"}
    n = written.count()
    assert 0 < n <= 500
    splits = {r["split"] for r in written.select("split").distinct().collect()}
    assert splits <= {"train", "val"}
    # operator output matched the direct-API composite (corpus_curation)
    assert res.output_name == "final"


def test_operator_step_defaults_to_previous_output(spark, sf_dir):
    """An operator step with no inputDFName consumes the previous step's
    view (hashSplit above relies on this); first-step default is the
    primary input."""
    cfg = _curation_cfg(sf_dir, "/tmp/unused")
    del cfg["phase_3"]["target_record_insert"]
    step = cfg["phase_2"]["data_transformations"][0]
    step.pop("inputDFName")
    res = Orchestrator(spark).run(cfg)
    assert res.output.count() > 0


def test_unknown_operator_name_lists_available(spark, sf_dir):
    cfg = _curation_cfg(sf_dir, "/tmp/unused2")
    del cfg["phase_3"]["target_record_insert"]
    cfg["phase_2"]["data_transformations"] = [
        {"operatorName": "noSuchOp", "inputDFName": "documents", "outputDFName": "x"}
    ]
    with pytest.raises(KeyError, match="noSuchOp"):
        Orchestrator(spark).run(cfg)


def test_unknown_input_view_raises(spark, sf_dir):
    cfg = _curation_cfg(sf_dir, "/tmp/unused3")
    del cfg["phase_3"]["target_record_insert"]
    cfg["phase_2"]["data_transformations"] = [
        {"operatorName": "textEnrich", "inputDFName": "nope", "outputDFName": "x"}
    ]
    with pytest.raises(KeyError, match="unknown input view"):
        Orchestrator(spark).run(cfg)


def test_registry_covers_training_ops(spark, sf_dir):
    assert {"minhashNearDups", "nearDupClusters", "hashSplit",
            "stratifiedSample", "packSequential", "embeddingNearDups"} <= set(OPERATORS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = apply_operator("minhashNearDups", docs, {"id_col": "doc_id", "text_col": "text"})
    clusters = apply_operator("nearDupClusters", pairs, {})
    assert clusters.columns == ["doc_id", "cluster_rep"]


def test_registry_round5_ops_dispatch(spark, sf_dir):
    assert {"semanticDedup", "bloomIncrementalDedup", "domainMixSample",
            "lmCrossEntropy", "bpeTokenize", "sessionAggregate",
            "tumblingCounts", "streamingDedup"} <= set(OPERATORS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    kept = apply_operator(
        "semanticDedup", emb,
        {"id_col": "vec_id", "vec_col": "embedding", "n_clusters": "4", "threshold": "0.3"},
    )
    assert kept.columns == ["kept_id", "cluster_id"] and kept.count() > 0

    mixed = apply_operator(
        "domainMixSample", docs,
        {"strata_col": "source", "weights": {"src0": "2", "src1": "1"}, "id_col": "doc_id"},
    )
    assert mixed.count() > 0

    scored = apply_operator("lmCrossEntropy", docs, {"id_col": "doc_id", "text_col": "text"})
    assert "cross_entropy" in scored.columns

    uniq = apply_operator(
        "bloomIncrementalDedup",
        docs.selectExpr("doc_id", "substring(text, 1, 30) AS fp"),
        {"key_col": "fp", "new_predicate": "doc_id % 3 = 0"},
    )
    assert uniq.count() > 0

    toks = apply_operator(
        "bpeTokenize", docs.limit(30), {"id_col": "doc_id", "text_col": "text", "n_merges": "4"}
    )
    row = toks.first()
    assert row["n_tokens"] > 0 and isinstance(row["tokens"], str)

    sessions = apply_operator(
        "sessionAggregate",
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        {"ts_col": "ts", "key": "user_id", "gap": "30 minutes"},
    )
    assert {"session_start", "session_end", "n_events"} <= set(sessions.columns)


def test_similarity_ops_config_callable(spark, tables):
    """Round 6: the ANN/top-k family is reachable from JSON configs like
    every other operator — one input view, queries picked by predicate."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    emb = spark.table("embeddings")
    exact = apply_operator(
        "topkNeighbors", emb,
        {"id_col": "vec_id", "vec_col": "embedding",
         "query_predicate": "vec_id % 100 = 0", "k": "3"},
    )
    rows = exact.collect()
    assert rows and all(r["rank"] <= 3 for r in rows)

    ann = apply_operator(
        "annLshTopk", emb,
        {"id_col": "vec_id", "vec_col": "embedding", "dim": "64",
         "query_predicate": "vec_id % 100 = 0", "k": "3",
         "num_planes": "4", "num_tables": "2", "num_probes": "4"},
    )
    ann_rows = ann.collect()
    assert ann_rows and all(r["rank"] <= 3 for r in ann_rows)

    ivf = apply_operator(
        "ivfTopk", emb,
        {"id_col": "vec_id", "vec_col": "embedding",
         "query_predicate": "vec_id % 100 = 0", "k": "3",
         "n_centroids": "8", "n_probe": "3"},
    )
    assert ivf.collect()
