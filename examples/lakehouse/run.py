"""Lakehouse lifecycle on delta-lite (round 8): the reference's flagship
format (``spark.json:19`` deltalake) driven end-to-end WITHOUT delta-spark
through the in-repo transaction-log implementation —

  1. batch appends through the config dialect (two ``simpleInsert`` jobs
     → two commits),
  2. a Structured Streaming file source landing EXACTLY-ONCE via
     ``streaming_delta_sink`` (foreachBatch + the protocol's ``txn``
     idempotence watermark),
  3. an ``scdType2Insert`` MERGE that rewrites only matched files,
  4. OPTIMIZE (dataChange=false compaction) + VACUUM, with time travel
     proving history until the files are reclaimed.

    cd /root/repo && python examples/lakehouse/run.py
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import (
    Orchestrator,
    get_session,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
    load_snapshot,
    optimize_delta_lite,
    read_delta_lite,
    streaming_delta_sink,
    vacuum_delta_lite,
)

DEMO = "/tmp/lakehouse_demo"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _run_cfg(spark, name, cfg):
    path = os.path.join(DEMO, "cfg", f"{name}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(cfg, fh)
    Orchestrator(spark).run(path)


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="lakehouse-demo")
    table = f"{DEMO}/orders_delta"
    scd = f"{DEMO}/parts_scd"

    # 1. two batch appends through the config dialect
    batch = {
        "configs": {"name": "orders_to_delta", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "orders",
            "path": f"{SF}/orders.parquet",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [{
            "functionName": "proj",
            "sqlQuery": "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders",
            "outputDFName": "proj"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "proj",
            "loadType": "simpleInsert", "path": table,
            "fileFormat": "deltalake"}]},
    }
    _run_cfg(spark, "b1", batch)
    _run_cfg(spark, "b2", batch)
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert read_delta_lite(spark, table).count() == 2 * n_orders
    assert read_delta_lite(spark, table, version=0).count() == n_orders
    print(f"batch: 2 commits, {2 * n_orders} rows, time travel to v0 = {n_orders}")

    # 2. streaming lands exactly once (txn watermark absorbs the replay)
    stream_src = f"{DEMO}/stream_src"
    spark.read.parquet(f"{SF}/orders.parquet").limit(100).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).write.parquet(stream_src)
    q = streaming_delta_sink(
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderpriority string"
        ).parquet(stream_src),
        table,
        app_id="orders-stream",
        checkpoint_location=f"{DEMO}/stream_cp",
    )
    q.processAllAvailable()
    q.stop()
    n_after_stream = read_delta_lite(spark, table).count()
    assert n_after_stream == 2 * n_orders + 100
    # replay batch 0 by hand — the txn action makes it a no-op
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
        write_delta_lite,
    )

    write_delta_lite(
        spark.read.parquet(stream_src),
        table,
        mode="append",
        txn=("orders-stream", 0),
    )
    assert read_delta_lite(spark, table).count() == n_after_stream
    print(f"streaming: +100 rows exactly-once (replay absorbed)")

    # 3. SCD2 MERGE through the config dialect
    for eff, where in (("2024-01-01 00:00:00", "TRUE"), ("2024-02-01 00:00:00", "p_partkey % 2 = 0")):
        _run_cfg(spark, f"scd_{eff[:7]}", {
            "configs": {"name": "parts_scd", "phase_1": {"input_data": {
                "dataSource": "local", "dataFrameName": "part",
                "path": f"{SF}/part.parquet",
                "fileProperties": {"fileFormat": "parquet"}}}},
            "phase_2": {"data_transformations": [{
                "functionName": "snap",
                "sqlQuery": "SELECT p_partkey, CASE WHEN " + where +
                            " THEN p_brand || '_X' ELSE p_brand END AS brand FROM part",
                "outputDFName": "snap"}]},
            "phase_3": {"target_record_insert": [{
                "dataTarget": "local", "dataFrameName": "snap",
                "loadType": "scdType2Insert", "path": scd,
                "fileFormat": "deltalake", "scd2Keys": ["p_partkey"],
                "scd2EffectiveCol": eff}]},
        })
    hist = read_delta_lite(spark, scd)
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    n_cur = hist.filter("is_current").count()
    n_closed = hist.filter("NOT is_current").count()
    assert n_cur == n_parts and n_closed == sum(
        1 for (k,) in spark.read.parquet(f"{SF}/part.parquet").select("p_partkey").collect()
        if k % 2 != 0
    )
    merge_commit = json.loads(
        open(os.path.join(scd, "_delta_log", "00000000000000000001.json")).readline()
    )
    print(f"scd2 merge: {n_cur} current / {n_closed} closed, "
          f"matchedFiles={merge_commit['commitInfo']['operationParameters']['matchedFiles']}")

    # 3b. row-level DML through the config dialect (round 10): a
    # deltaMerge step upserts a corrections feed into the orders table
    # and a deltaDelete step applies a retention cut — both data-skipped
    # by per-file stats, both chainable (the step output is the
    # post-DML snapshot)
    dml_table = f"{DEMO}/orders_dml"
    write_delta_lite(
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .limit(1000),
        dml_table,
    )
    _run_cfg(spark, "dml", {
        "configs": {"name": "orders_dml", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "orders",
            "path": f"{SF}/orders.parquet",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [
            {"functionName": "corrections feed",
             "sqlQuery": "SELECT o_orderkey, o_custkey, 'CORRECTED' AS o_orderpriority "
                         "FROM orders WHERE o_orderkey % 100 = 0 LIMIT 50",
             "outputDFName": "corrections"},
            {"operatorName": "deltaMerge", "inputDFName": "corrections",
             "operatorParams": {
                 "table_path": dml_table, "on_keys": "o_orderkey",
                 "when_matched_update_json":
                     "{\"o_orderpriority\": \"src_o_orderpriority\"}"},
             "outputDFName": "merged_snap"},
            {"operatorName": "deltaDelete", "inputDFName": "merged_snap",
             "operatorParams": {
                 "table_path": dml_table,
                 "condition": "o_orderpriority = '5-LOW'"},
             "outputDFName": "retained_snap"},
            {"functionName": "dml summary",
             "sqlQuery": "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
                         "CAST(SUM(CASE WHEN o_orderpriority = 'CORRECTED' THEN 1 ELSE 0 END) AS BIGINT) AS n_corrected "
                         "FROM retained_snap",
             "outputDFName": "dml_summary"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "dml_summary",
            "loadType": "truncateInsert", "path": f"{DEMO}/dml_summary",
            "outputDataProperties": {"fileFormat": "parquet"}}]},
    })
    final = read_delta_lite(spark, dml_table)
    assert final.filter("o_orderpriority = '5-LOW'").count() == 0
    n_corr = final.filter("o_orderpriority = 'CORRECTED'").count()
    assert n_corr > 0
    import duckdb as _duck

    s_rows, s_corr = _duck.sql(
        f"SELECT n_rows, n_corrected FROM '{DEMO}/dml_summary/*.parquet'"
    ).fetchone()
    assert (s_rows, s_corr) == (final.count(), n_corr)
    print(f"config DML: merge upserted (corrected={n_corr}), retention delete applied, "
          f"summary sink matches table ({s_rows} rows)")

    # 3c. RESTORE + timestamp time travel through the config dialect
    # (round 10 second wave): a config input reads the orders_dml table
    # AS OF the post-merge commit's timestamp (from DESCRIBE HISTORY),
    # and a deltaRestore step rolls the table back to its pre-DML v0 —
    # log-only (no data moves), pre-restore versions stay readable.
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
        history_delta_lite,
    )

    hist_dml = history_delta_lite(dml_table)
    assert [h["operation"] for h in hist_dml] == ["DELETE", "MERGE", "WRITE"]
    ts_merge = next(h["timestamp"] for h in hist_dml if h["version"] == 1)
    n_v0 = read_delta_lite(spark, dml_table, version=0).count()
    _run_cfg(spark, "restore", {
        "configs": {"name": "orders_restore", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "as_of_merge",
            "path": dml_table,
            "fileProperties": {"fileFormat": "deltalake"},
            "options": {"timestampAsOf": ts_merge}}}},
        "phase_2": {"data_transformations": [
            {"operatorName": "deltaRestore", "inputDFName": "as_of_merge",
             "operatorParams": {"table_path": dml_table, "version": 0},
             "outputDFName": "restored_snap"},
            {"functionName": "restore summary",
             "sqlQuery": "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM as_of_merge) AS n_as_of_merge, "
                         "(SELECT CAST(COUNT(*) AS BIGINT) FROM restored_snap) AS n_restored",
             "outputDFName": "restore_summary"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "restore_summary",
            "loadType": "truncateInsert", "path": f"{DEMO}/restore_summary",
            "outputDataProperties": {"fileFormat": "parquet"}}]},
    })
    r_as_of, r_restored = _duck.sql(
        f"SELECT n_as_of_merge, n_restored FROM '{DEMO}/restore_summary/*.parquet'"
    ).fetchone()
    # the merge updated matched rows in place AND inserted the unmatched
    # correction keys, so the as-of-merge count is v1's exactly
    assert r_as_of == read_delta_lite(spark, dml_table, version=1).count()
    assert r_restored == n_v0 == 1000
    post = read_delta_lite(spark, dml_table)
    assert post.filter("o_orderpriority = 'CORRECTED'").count() == 0  # DML undone
    assert post.filter("o_orderpriority = '5-LOW'").count() > 0  # deletes undone
    # pre-restore history still time-travelable; RESTORE rides the log
    assert read_delta_lite(spark, dml_table, version=2).filter(
        "o_orderpriority = '5-LOW'"
    ).count() == 0
    assert history_delta_lite(dml_table)[0]["operation"] == "RESTORE"
    print(f"config RESTORE: rolled back to v0 ({r_restored} rows, log-only), "
          f"timestampAsOf read saw the post-merge snapshot ({r_as_of} rows)")

    # 3d. DESCRIBE HISTORY as a config step + MERGE schema auto-evolution
    # (round 11): deltaHistory emits one row per commit (log-only, any
    # table size), and a deltaMerge with mergeSchema=true widens the
    # table additively in the SAME atomic commit — inserts carry the new
    # column, matched updates SET it, pre-existing rows read NULL.
    _run_cfg(spark, "evolve", {
        "configs": {"name": "orders_evolve", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "orders",
            "path": f"{SF}/orders.parquet",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [
            {"functionName": "widened corrections feed",
             "sqlQuery": "SELECT o_orderkey, o_custkey, 'AUDITED' AS o_orderpriority, "
                         "'r11' AS audit_tag FROM orders WHERE o_orderkey % 100 = 1 LIMIT 20",
             "outputDFName": "widened"},
            {"operatorName": "deltaMerge", "inputDFName": "widened",
             "operatorParams": {
                 "table_path": dml_table, "on_keys": "o_orderkey",
                 "when_matched_update_json":
                     "{\"o_orderpriority\": \"src_o_orderpriority\", "
                     "\"audit_tag\": \"src_audit_tag\"}",
                 "mergeSchema": "true"},
             "outputDFName": "evolved_snap"},
            {"operatorName": "deltaHistory", "inputDFName": "evolved_snap",
             "operatorParams": {"table_path": dml_table},
             "outputDFName": "history"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "history",
            "loadType": "truncateInsert", "path": f"{DEMO}/history",
            "outputDataProperties": {"fileFormat": "parquet"}}]},
    })
    evolved = read_delta_lite(spark, dml_table)
    assert "audit_tag" in evolved.columns
    n_tagged = evolved.filter("audit_tag = 'r11'").count()
    assert n_tagged > 0
    assert evolved.filter("audit_tag IS NULL").count() == evolved.count() - n_tagged
    ops = [r[0] for r in _duck.sql(
        f"SELECT operation FROM '{DEMO}/history/*.parquet' ORDER BY version DESC"
    ).fetchall()]
    assert ops == ["MERGE", "RESTORE", "DELETE", "MERGE", "WRITE"]
    print(f"config evolution: audit_tag evolved in one MERGE commit "
          f"({n_tagged} tagged, rest NULL); deltaHistory sink lists {ops}")

    # 3e. constraints + clone as config steps (round 11 second wave):
    # deltaConstraint guards every later write; deltaClone forks the
    # guarded table zero-copy and the fork diverges independently.
    clone_path = f"{DEMO}/orders_fork"
    _run_cfg(spark, "guard_fork", {
        "configs": {"name": "guard_fork", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "orders",
            "path": f"{SF}/orders.parquet",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [
            {"operatorName": "deltaConstraint", "inputDFName": "orders",
             "operatorParams": {"table_path": dml_table,
                                "name": "key_pos", "expr": "o_orderkey >= 0"},
             "outputDFName": "guarded"},
            {"operatorName": "deltaClone", "inputDFName": "guarded",
             "operatorParams": {"source_path": dml_table,
                                "table_path": clone_path},
             "outputDFName": "fork"}]},
    })
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
        delete_delta_lite,
        table_constraints,
        write_delta_lite as _wd,
    )

    assert table_constraints(dml_table) == {"key_pos": "o_orderkey >= 0"}
    assert table_constraints(clone_path) == {"key_pos": "o_orderkey >= 0"}
    n_src = read_delta_lite(spark, dml_table).count()
    try:  # the constraint holds on the CLONE too (it carried over)
        _wd(spark.sql("SELECT CAST(-1 AS BIGINT) AS o_orderkey, "
                      "CAST(1 AS BIGINT) AS o_custkey, 'X' AS o_orderpriority, "
                      "CAST(NULL AS STRING) AS audit_tag"),
            clone_path, mode="append")
        raise AssertionError("constraint did not carry to the clone")
    except ValueError:
        pass
    delete_delta_lite(spark, clone_path, "o_orderkey % 2 = 0")
    assert read_delta_lite(spark, dml_table).count() == n_src  # fork isolated
    print(f"config constraint+clone: key_pos guards source AND fork; "
          f"fork diverged, source still {n_src} rows")

    # 4. OPTIMIZE + VACUUM + the honest end of time travel
    files_before = len(load_snapshot(table).files)
    v_opt = optimize_delta_lite(table, spark, target_files=2)
    files_after = len(load_snapshot(table).files)
    assert files_after <= 2 < files_before
    assert read_delta_lite(spark, table).count() == n_after_stream
    removed = vacuum_delta_lite(table)
    assert len(removed) == files_before
    assert read_delta_lite(spark, table).count() == n_after_stream
    print(f"optimize: {files_before} -> {files_after} files (v{v_opt}); "
          f"vacuum reclaimed {len(removed)}")
    print("lakehouse example OK")


if __name__ == "__main__":
    main()
