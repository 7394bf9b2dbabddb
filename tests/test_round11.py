"""Round-11 regression tests.

Advisor findings closed here:
  1. delta_stream fresh-start default is the reconciled CURRENT
     snapshot, not a v0 history replay — an OPTIMIZE+VACUUM lifecycle
     (or skipChangeCommits over a delete/overwrite history) no longer
     crashes or resurrects removed rows (delta_stream.py).
  2. a remove action with no dataChange field is treated as
     dataChange=true (protocol default) — foreign/minimal logs whose
     DELETE removes omit the flag fail safe (delta_stream.py).
  3. the blind-append commit retry compares FULL schemas, not field
     names — a racing type evolution is not commutable (delta_lite.py).
  4. substitute_params offers the ``$${name}`` literal escape so
     configs carrying literal ``${...}`` text keep working (config.py).
"""

import json
import os

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
    delta_lite as dl,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
    read_delta_lite_stream,
)


def _drain(spark, df, name, checkpoint):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(tuple(r) for r in spark.table(name).collect())


# -- 1. fresh-stream default = current snapshot --------------------------


def test_fresh_stream_survives_optimize_then_vacuum(spark, tmp_path):
    """The exact lifecycle the advisor named: OPTIMIZE rewrites the
    files, VACUUM deletes the pre-compaction ones; a v0 replay would
    FileNotFoundError, the snapshot default serves the live set."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(8).selectExpr("id AS k").repartition(2), tp)
    dl.write_delta_lite(
        spark.range(8, 12).selectExpr("id AS k").repartition(2),
        tp,
        mode="append",
    )
    dl.optimize_delta_lite(tp, spark, target_files=1)
    removed = dl.vacuum_delta_lite(tp)
    assert removed  # pre-compaction files really are gone
    got = _drain(
        spark, read_delta_lite_stream(spark, tp), "r11_ov", str(tmp_path / "cp")
    )
    assert got == [(i,) for i in range(12)]
    # new appends still flow after the snapshot batch (fresh checkpoint
    # reuses the drained one via a second availableNow pass)
    dl.write_delta_lite(spark.range(100, 102).selectExpr("id AS k"), tp, mode="append")


def test_fresh_stream_default_skips_no_removed_rows(spark, tmp_path):
    """skipChangeCommits + a history containing a delete: the old v0
    replay silently delivered the deleted rows and never the current
    state; the snapshot default delivers exactly the live rows."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(10).selectExpr("id AS k"), tp)
    dl.delete_delta_lite(spark, tp, "k < 3")
    got = _drain(
        spark,
        read_delta_lite_stream(spark, tp, skipChangeCommits=True),
        "r11_sc",
        str(tmp_path / "cp"),
    )
    assert got == [(i,) for i in range(3, 10)]


def test_explicit_history_replay_of_vacuumed_files_is_clean_error(spark, tmp_path):
    """startingVersion=0 on a vacuumed table raises at PLANNING time,
    naming the remedy (snapshot default / startingVersion='latest')."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(6).selectExpr("id AS k").repartition(2), tp)
    dl.optimize_delta_lite(tp, spark, target_files=1)
    assert dl.vacuum_delta_lite(tp)
    q = (
        read_delta_lite_stream(spark, tp, startingVersion=0)
        .writeStream.format("memory")
        .queryName("r11_vac")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="no longer exist|vacuumed"):
        q.awaitTermination()


def test_snapshot_start_restart_tails_only_new_commits(spark, tmp_path):
    """After the snapshot first batch, the checkpointed offset is the
    snapshot version — a restart delivers only commits after it."""
    tp = str(tmp_path / "t")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    dl.write_delta_lite(spark.range(5).selectExpr("id AS k"), tp)
    dl.delete_delta_lite(spark, tp, "k = 4")

    def drain_files():
        q = (
            read_delta_lite_stream(spark, tp)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    assert drain_files() == [(i,) for i in range(4)]
    dl.write_delta_lite(spark.range(10, 12).selectExpr("id AS k"), tp, mode="append")
    # the delete commit is never re-crossed (no raise), only the append lands
    assert drain_files() == [(i,) for i in range(4)] + [(10,), (11,)]


# -- 2. remove without dataChange fails safe ------------------------------


def test_foreign_remove_without_datachange_fails_safe(spark, tmp_path):
    """A minimal/foreign log whose remove omits dataChange must hit the
    raise/skipChangeCommits path (protocol: readers assume true), never
    silently ignore the deletion."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(4).selectExpr("id AS k"), tp)
    snap = dl.load_snapshot(tp)
    victim = sorted(snap.files)[0]
    raw_path = snap.files[victim]["path"]
    dl._commit(
        tp,
        snap.version + 1,
        [
            {"commitInfo": {"operation": "DELETE"}},
            # no dataChange field at all — the foreign-log shape
            {"remove": {"path": raw_path, "deletionTimestamp": 1}},
        ],
    )
    q = (
        read_delta_lite_stream(spark, tp, startingVersion=0)
        .writeStream.format("memory")
        .queryName("r11_fr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="skipChangeCommits|data-changing"):
        q.awaitTermination()


# -- 3. append retry vs racing type change --------------------------------


def test_append_retry_raises_on_racing_type_change(spark, tmp_path, monkeypatch):
    """Same field NAMES, changed type: the blind-append retry must NOT
    commute (our staged parquet carries the stale physical type)."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(3).selectExpr("id AS k"), tp)
    orig_commit = dl._commit
    state = {"injected": False}

    def hooked(table_path, version, actions):
        if not state["injected"]:
            state["injected"] = True
            meta = dict(dl.load_snapshot(table_path).metadata)
            sch = json.loads(meta["schemaString"])
            assert sch["fields"][0]["name"] == "k"
            sch["fields"][0]["type"] = "string"  # same name, new type
            meta["schemaString"] = json.dumps(sch)
            orig_commit(
                table_path,
                version,
                [{"commitInfo": {"operation": "WRITE"}}, {"metaData": meta}],
            )
        return orig_commit(table_path, version, actions)

    monkeypatch.setattr(dl, "_commit", hooked)
    with pytest.raises(dl.DeltaConcurrentWriteError):
        dl.write_delta_lite(
            spark.range(3, 6).selectExpr("id AS k"), tp, mode="append"
        )


def test_append_retry_still_commutes_same_schema(spark, tmp_path, monkeypatch):
    """The counterpart: a racing append with the SAME schema still
    commutes — the retry lands at the next version slot."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(3).selectExpr("id AS k"), tp)
    orig_commit = dl._commit
    state = {"injected": False}

    def hooked(table_path, version, actions):
        if not state["injected"]:
            state["injected"] = True
            dl.write_delta_lite(
                spark.range(100, 102).selectExpr("id AS k"),
                table_path,
                mode="append",
            )
        return orig_commit(table_path, version, actions)

    monkeypatch.setattr(dl, "_commit", hooked)
    v = dl.write_delta_lite(spark.range(3, 6).selectExpr("id AS k"), tp, mode="append")
    assert v == 2  # racing append took v1; ours re-aimed at v2
    got = sorted(r["k"] for r in dl.read_delta_lite(spark, tp).collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101]


# -- 4. $${name} literal escape in substitute_params ----------------------


def test_substitute_params_escape_literal():
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        substitute_params,
    )

    raw = {
        "configs": {"jobParams": {"ds": "2024-01-01"}},
        "phase_2": {
            "data_transformations": [
                {
                    "sqlQuery": "SELECT '$${literal}' AS t, '${ds}' AS ds",
                    "regex": "^\\$${env}[0-9]+$",
                }
            ]
        },
    }
    out = substitute_params(raw, None)
    t = out["phase_2"]["data_transformations"][0]
    assert t["sqlQuery"] == "SELECT '${literal}' AS t, '2024-01-01' AS ds"
    # the escaped form never demands a param value
    assert t["regex"] == "^\\${env}[0-9]+$"


def test_substitute_params_missing_key_names_escape():
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        substitute_params,
    )

    with pytest.raises(ValueError, match=r"\$\$\{oops\}"):
        substitute_params({"configs": {}, "phase_1": {"x": "${oops}"}}, None)
