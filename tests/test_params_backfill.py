"""Parameterized job configs (``${name}`` placeholders resolved from
``configs.jobParams`` defaults + caller overrides) and the Airflow-style
daily ``backfill`` runner (``plans/schedule.py``) — the mechanism the
reference's Airflow DAG uses to pass run dates into job configs."""

import json

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
    JobConfig,
    substitute_params,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.engine import (
    Orchestrator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.schedule import (
    backfill,
)


def test_substitute_params_defaults_overrides_and_errors():
    raw = {
        "configs": {
            "name": "j",
            "jobParams": {"ds": "2024-01-01", "env": "dev"},
            "phase_1": {"input_data": {"path": "/data/${env}/events"}},
        },
        "phase_2": {
            "data_transformations": [
                {"sqlQuery": "SELECT * FROM t WHERE ds = '${ds}'", "n": 3}
            ]
        },
    }
    out = substitute_params(raw, {"ds": "2024-02-09"})
    assert out["configs"]["phase_1"]["input_data"]["path"] == "/data/dev/events"
    assert (
        out["phase_2"]["data_transformations"][0]["sqlQuery"]
        == "SELECT * FROM t WHERE ds = '2024-02-09'"
    )
    assert out["phase_2"]["data_transformations"][0]["n"] == 3  # non-strings kept
    assert "jobParams" not in out["configs"]  # template input, not config
    # a placeholder with no value is a hard error naming the key
    with pytest.raises(ValueError, match=r"\$\{missing\}"):
        substitute_params({"configs": {"phase_1": {"p": "${missing}"}}}, {})
    # un-templated configs pass through untouched
    plain = {"configs": {"phase_1": {"p": "/a/b"}}}
    assert substitute_params(plain, None) == plain


def test_parsed_jobconfig_rejects_late_params(spark):
    cfg = JobConfig.from_dict(
        {"configs": {"name": "j", "phase_1": {"input_data": {"path": "/x"}}}}
    )
    with pytest.raises(ValueError, match="raw config"):
        Orchestrator(spark).run(cfg, params={"ds": "2024-01-01"})


def _daily_config(sf_dir, out_root):
    return {
        "configs": {
            "name": "daily_events_${ds}",
            "jobParams": {"ds": "2024-01-01"},
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "events",
                    "path": f"{sf_dir}/events.parquet",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {
            "data_transformations": [
                {
                    "functionName": "one day",
                    "sqlQuery": "SELECT event_id, user_id, event_type FROM events "
                    "WHERE CAST(ts AS DATE) = DATE'${ds}'",
                    "outputDFName": "day_slice",
                }
            ]
        },
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "day_slice",
                    "loadType": "truncateInsert",
                    "path": out_root + "/ds=${ds}",
                    "outputDataProperties": {"fileFormat": "parquet"},
                }
            ]
        },
    }


def test_parameterized_daily_job_and_backfill(spark, sf_dir, tmp_path):
    import duckdb

    out_root = str(tmp_path / "daily")
    cfg = _daily_config(sf_dir, out_root)
    # jobParams default runs Jan 1; explicit params override to Jan 2
    Orchestrator(spark).run(cfg)
    Orchestrator(spark).run(cfg, params={"ds": "2024-01-02"})
    for ds in ("2024-01-01", "2024-01-02"):
        n = duckdb.sql(f"SELECT COUNT(*) FROM '{out_root}/ds={ds}/*.parquet'").fetchone()[0]
        exp = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' WHERE CAST(ts AS DATE) = DATE'{ds}'"
        ).fetchone()[0]
        assert n == exp and n > 0, (ds, n, exp)
    # a JSON file template works the same way (the Airflow-shaped path)
    path = str(tmp_path / "cfg.json")
    with open(path, "w") as fh:
        json.dump(cfg, fh)
    backfill(Orchestrator(spark), path, "2024-01-03", "2024-01-05")
    for ds in ("2024-01-03", "2024-01-04", "2024-01-05"):
        n = duckdb.sql(f"SELECT COUNT(*) FROM '{out_root}/ds={ds}/*.parquet'").fetchone()[0]
        exp = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' WHERE CAST(ts AS DATE) = DATE'{ds}'"
        ).fetchone()[0]
        assert n == exp and n > 0, (ds, n, exp)
    with pytest.raises(ValueError, match="precedes"):
        backfill(Orchestrator(spark), cfg, "2024-01-05", "2024-01-03")


def test_backfill_on_error_continue(spark, sf_dir, tmp_path):
    cfg = _daily_config(sf_dir, str(tmp_path / "d"))
    # sabotage: a template that needs a param backfill never supplies
    cfg["phase_2"]["data_transformations"][0]["sqlQuery"] += " AND '${never}' = ''"
    res = backfill(
        Orchestrator(spark), cfg, "2024-01-01", "2024-01-02", on_error="continue"
    )
    assert len(res) == 2 and all(isinstance(r, ValueError) for r in res)
    with pytest.raises(ValueError):
        backfill(Orchestrator(spark), cfg, "2024-01-01", "2024-01-02")


def test_metrics_sidecar_on_success_and_failure(spark, sf_dir, tmp_path):
    """configs.metricsPath: every run leaves one JSON record — phase
    timings, counts, writes — including FAILED runs (error recorded,
    exception still raised)."""
    import glob
    import json as _json

    mdir = str(tmp_path / "metrics")
    cfg = _daily_config(sf_dir, str(tmp_path / "out"))
    cfg["configs"]["metricsPath"] = mdir
    result = Orchestrator(spark).run(cfg, params={"ds": "2024-01-02"})
    files = glob.glob(f"{mdir}/daily_events_2024-01-02_*.json")
    assert len(files) == 1
    m = _json.load(open(files[0]))
    assert m["job_name"] == "daily_events_2024-01-02"
    assert m["error"] is None
    assert set(m["phase_secs"]) == {"ingest", "validate", "transform", "load"}
    assert m["total_secs"] >= sum(m["phase_secs"].values()) - 0.01
    assert m["output_name"] == "day_slice" and "day_slice" in m["views"]
    assert result.total_secs > 0
    # failure: bad SQL -> metrics record carries the error, run raises
    bad = _daily_config(sf_dir, str(tmp_path / "out2"))
    bad["configs"]["metricsPath"] = mdir
    bad["phase_2"]["data_transformations"][0]["sqlQuery"] = "SELECT nope FROM events"
    with pytest.raises(Exception):
        Orchestrator(spark).run(bad, params={"ds": "2024-01-03"})
    ffiles = glob.glob(f"{mdir}/daily_events_2024-01-03_*.json")
    assert len(ffiles) == 1
    fm = _json.load(open(ffiles[0]))
    assert fm["error"] and "nope" in fm["error"] or "AnalysisException" in fm["error"]
    assert "ingest" in fm["phase_secs"]  # got through phase 1


def test_pipeline_manifest_dag_level_params(spark, sf_dir, tmp_path):
    """One ${ds} parameterizes the whole manifest: a producer job lands
    the day slice, a dependent consumer aggregates it — both resolved
    from DAG-level jobParams (caller override wins)."""
    import duckdb

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
        from_manifest,
    )

    out_root = str(tmp_path / "p")
    producer = _daily_config(sf_dir, out_root)
    consumer = {
        "configs": {"name": "daily_counts_${ds}", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "slice",
            "path": out_root + "/ds=${ds}",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [{
            "functionName": "count",
            "sqlQuery": "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
                        "FROM slice GROUP BY event_type",
            "outputDFName": "counts"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "counts",
            "loadType": "truncateInsert", "path": out_root + "/counts/ds=${ds}",
            "outputDataProperties": {"fileFormat": "parquet"}}]},
    }
    manifest = {
        "name": "daily_dag",
        "jobParams": {"ds": "1999-01-01"},  # overridden by the caller
        "tasks": [
            {"name": "land", "config": producer},
            {"name": "aggregate", "config": consumer, "dependsOn": ["land"]},
        ],
    }
    outcomes = from_manifest(spark, manifest, params={"ds": "2024-01-04"}).run()
    assert {o.state for o in outcomes.values()} == {"success"}
    n_slice = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out_root}/ds=2024-01-04/*.parquet'"
    ).fetchone()[0]
    n_counts = duckdb.sql(
        f"SELECT SUM(n) FROM '{out_root}/counts/ds=2024-01-04/*.parquet'"
    ).fetchone()[0]
    exp = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' "
        f"WHERE CAST(ts AS DATE) = DATE'2024-01-04'"
    ).fetchone()[0]
    assert n_slice == n_counts == exp and exp > 0
