"""Round-2 hardening: SFTP staged fetch (S11), SCD2 write safety + incoming
dedup (W5), reconciliation modes incl. append delta + value hash (V6),
excel sink OOM guard, thresholdLimit=0 semantics (V4), LSH-guarded
embedding near-dup (no accidental O(n²))."""

import os
import stat
import sys
import types

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
    InputSpec,
    JobConfig,
    TargetSpec,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.reconcile import (
    content_checksum,
    reconcile_counts,
    reconcile_hash,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
    scd2_initial,
    scd2_merge,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.engine import (
    Orchestrator,
    ThresholdExceeded,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks import writers
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks.writers import (
    write_target,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
    read_input,
)


# ---------------------------------------------------------------------------
# S11: sftp staged fetch (fake paramiko transport)
# ---------------------------------------------------------------------------


class _FakeSFTPClient:
    """Serves files from a local directory as if remote."""

    def __init__(self, root):
        self.root = root

    def stat(self, path):
        st = os.stat(os.path.join(self.root, path.lstrip("/")))
        out = types.SimpleNamespace(st_mode=st.st_mode)
        return out

    def listdir(self, path):
        return os.listdir(os.path.join(self.root, path.lstrip("/")))

    def get(self, remote, local):
        import shutil

        shutil.copy2(os.path.join(self.root, remote.lstrip("/")), local)

    def put(self, local, remote):
        import shutil

        shutil.copy2(local, os.path.join(self.root, remote.lstrip("/")))

    def mkdir(self, path):
        os.mkdir(os.path.join(self.root, path.lstrip("/")))

    def close(self):
        pass


def _fake_paramiko(served_root, connects):
    mod = types.ModuleType("paramiko")

    class Transport:
        def __init__(self, addr):
            connects.append(addr)

        def connect(self, **kw):
            connects.append(kw)

        def close(self):
            pass

    class SFTPClient:
        @staticmethod
        def from_transport(t):
            return _FakeSFTPClient(served_root)

    mod.Transport = Transport
    mod.SFTPClient = SFTPClient
    return mod


def test_sftp_fetch_stages_and_reads(spark, tmp_path, monkeypatch):
    src = tmp_path / "remote" / "drop"
    src.mkdir(parents=True)
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").toPandas().to_csv(
        src / "data.csv", index=False
    )
    connects = []
    monkeypatch.setitem(sys.modules, "paramiko", _fake_paramiko(str(tmp_path), connects))

    spec = InputSpec(
        data_source="sftp",
        dataframe_name="drop",
        sftp_host="vendor.example.com",
        remote_path="/remote/drop",
        file_format="csv",
        options={"port": "2022", "username": "u", "password": "p"},
    )
    df = read_input(spark, spec)
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    assert connects[0] == ("vendor.example.com", 2022)


def test_sftp_single_file_fetch(spark, tmp_path, monkeypatch):
    src = tmp_path / "remote2"
    src.mkdir()
    (src / "one.json").write_text('{"id": 7}\n')
    monkeypatch.setitem(sys.modules, "paramiko", _fake_paramiko(str(tmp_path), []))
    spec = InputSpec(
        data_source="sftp",
        sftp_host="h",
        remote_path="/remote2/one.json",
        file_format="json",
    )
    df = read_input(spark, spec)
    assert df.collect()[0]["id"] == 7


# ---------------------------------------------------------------------------
# W5: SCD2 write safety
# ---------------------------------------------------------------------------


def _scd2_spec(path, **kw):
    return TargetSpec(
        data_target="local",
        dataframe_name="out",
        load_type="scdType2Insert",
        path=path,
        file_format="parquet",
        scd2_keys=["k"],
        scd2_effective_col="2024-06-01 00:00:00",
        **kw,
    )


def test_scd2_refuses_non_scd2_target(spark, tmp_path):
    """An existing plain table at the target path must not be silently
    replaced by an initial load."""
    path = str(tmp_path / "plain")
    df = spark.createDataFrame([(1, "x")], "k int, v string")
    df.write.parquet(path)
    with pytest.raises(ValueError, match="lacks the SCD2 meta columns"):
        write_target(spark, df, _scd2_spec(path))
    # the original table is intact
    assert spark.read.parquet(path).count() == 1


def test_scd2_swap_leaves_no_staging(spark, tmp_path):
    path = str(tmp_path / "dim")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    write_target(spark, v1, _scd2_spec(path))
    v2 = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string")
    write_target(spark, v2, _scd2_spec(path))
    out = spark.read.parquet(path)
    assert out.filter("is_current").count() == 3  # k=1 new version, 2 carried, 3 inserted
    assert out.filter("k = 1").count() == 2  # closed + new
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_scd2_merge_dedups_duplicate_incoming_keys(spark):
    """Duplicate incoming keys must not fan out into several simultaneous
    current rows."""
    target = scd2_initial(
        spark.createDataFrame([(1, "a")], "k int, v string"), "2024-01-01 00:00:00"
    )
    incoming = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (2, "w")], "k int, v string"
    )
    merged = scd2_merge(target, incoming, keys=["k"], effective_ts="2024-06-01 00:00:00")
    current = merged.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in current)
    # deterministic survivor: greatest v per key
    vals = {r["k"]: r["v"] for r in merged.filter("is_current").collect()}
    assert vals == {1: "y", 2: "z"}


# ---------------------------------------------------------------------------
# V6: reconciliation modes
# ---------------------------------------------------------------------------


def test_reconcile_append_counts_delta(spark, tmp_path):
    path = str(tmp_path / "appends")
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    spec = TargetSpec(
        data_target="local", dataframe_name="out", load_type="simpleInsert",
        path=path, file_format="parquet", reconciliation=True,
    )
    r1 = write_target(spark, df, spec)
    assert r1["reconciliation"]["ok"] and r1["reconciliation"]["pre_existing"] == 0
    r2 = write_target(spark, df, spec)  # append onto non-empty target
    assert r2["reconciliation"]["ok"]
    assert r2["reconciliation"]["pre_existing"] == 10
    assert r2["reconciliation"]["written"] == 10  # the delta, not 20


def test_reconcile_hash_detects_value_drift(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id int, v string")  # reordered
    c = spark.createDataFrame([(1, "x"), (2, "Y")], "id int, v string")  # one value off
    assert reconcile_hash(a, b)["ok"]  # order-independent
    res = reconcile_hash(a, c)
    assert not res["ok"] and res["expected"] == res["written"] == 2


def test_reconcile_hash_mode_through_writer(spark, tmp_path):
    path = str(tmp_path / "hash_out")
    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, x double")
    spec = TargetSpec(
        data_target="local", dataframe_name="out", load_type="truncateInsert",
        path=path, file_format="parquet", reconciliation=True,
        reconciliation_mode="hash", save_mode="overwrite",
    )
    res = write_target(spark, df, spec)
    assert res["reconciliation"]["mode"] == "hash"
    assert res["reconciliation"]["ok"]


def test_content_checksum_column_order_invariant(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = a.select("v", "id")
    assert content_checksum(a) == content_checksum(b)
    assert reconcile_counts(5, 15, pre_existing=10)["ok"]
    assert not reconcile_counts(5, 14, pre_existing=10)["ok"]


# ---------------------------------------------------------------------------
# excel sink guard
# ---------------------------------------------------------------------------


def test_excel_sink_bounds_driver_collect(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(writers, "_EXCEL_MAX_ROWS", 5)
    df = spark.range(10).toDF("id")
    spec = TargetSpec(
        data_target="local", dataframe_name="out", load_type="simpleInsert",
        path=str(tmp_path / "big.xlsx"), file_format="excel",
    )
    with pytest.raises(ValueError, match="exceeds 5 rows"):
        write_target(spark, df, spec)


# ---------------------------------------------------------------------------
# V4: thresholdLimit semantics (0 = zero tolerance, absent = gate off)
# ---------------------------------------------------------------------------


def _validated_cfg(name, src, out, **extra):
    return {
        "configs": {
            "name": name,
            "phase_1": {
                "input_data": {
                    "dataSource": "local", "dataFrameName": "src", "path": src,
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
            **extra,
        },
        "phase_2": {
            "data_validation_required": "true",
            "data_validations": {
                "nullValueValidation": "true",
                "nullValueCheck": {"primaryKeys": ["pk"]},
            },
            "data_transformations": [
                {"functionName": "ident", "sqlQuery": "SELECT * FROM src",
                 "outputDFName": "out"}
            ],
        },
        "phase_3": {
            "target_record_insert": [
                {"dataTarget": "local", "dataFrameName": "out",
                 "loadType": "truncateInsert", "path": out,
                 "outputDataProperties": {"fileFormat": "parquet"}}
            ]
        },
    }


@pytest.fixture
def one_bad_src(spark, tmp_path):
    path = str(tmp_path / "one_bad")
    spark.createDataFrame([(None, "a"), (1, "b"), (2, "c")], "pk int, v string").write.parquet(path)
    return path


def test_threshold_zero_means_zero_tolerance(spark, tmp_path, one_bad_src):
    cfg = _validated_cfg("zero_tol", one_bad_src, str(tmp_path / "o1"), thresholdLimit="0%")
    with pytest.raises(ThresholdExceeded):
        Orchestrator(spark).run(cfg)


def test_threshold_absent_disables_gate(spark, tmp_path, one_bad_src):
    cfg = _validated_cfg("no_gate", one_bad_src, str(tmp_path / "o2"))
    res = Orchestrator(spark).run(cfg)
    assert res.bad_count == 1  # quarantine-only, no failure
    assert spark.read.parquet(str(tmp_path / "o2")).count() == 2


def test_threshold_absent_parses_to_none():
    # minimal-but-valid config: phase-less dicts are rejected outright
    # since round 6 (silent-no-op guard), so carry one empty-ish phase
    cfg = JobConfig.from_dict(
        {"configs": {"name": "x"}, "phase_2": {"data_transformations": []}}
    )
    assert cfg.threshold_limit is None


# ---------------------------------------------------------------------------
# LSH-guarded embedding near-dup: no cartesian in the default plan
# ---------------------------------------------------------------------------


def test_embedding_near_dups_default_is_equijoin(spark, sf_dir):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, dim=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    brute = embedding_near_dup_pairs(
        emb.limit(50), "vec_id", "embedding", threshold=0.4, brute_force=True
    )
    assert brute.count() >= 0  # opt-in path still works on bounded samples


def test_catalog_target_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """dataTarget=catalog + bucketBy: two tables bucketed alike on the
    join key join without an Exchange."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.engine import (
        Orchestrator,
    )

    def cfg(name, table, sql):
        return {
            "configs": {
                "name": name,
                "phase_1": {
                    "input_data": {
                        "dataSource": "local", "dataFrameName": "orders",
                        "path": f"{sf_dir}/orders.parquet",
                        "fileProperties": {"fileFormat": "parquet"},
                    }
                },
            },
            "phase_2": {
                "data_transformations": [
                    {"functionName": "t", "sqlQuery": sql, "outputDFName": "out"}
                ]
            },
            "phase_3": {
                "target_record_insert": [
                    {"dataTarget": "catalog", "dataFrameName": "out",
                     "tableName": table, "loadType": "truncateInsert",
                     "reconciliation": "true",
                     "outputDataProperties": {"fileFormat": "parquet",
                                              "savemode": "overwrite",
                                              "bucketBy": ["o_custkey"],
                                              "numBuckets": 8}}
                ]
            },
        }

    r1 = Orchestrator(spark).run(
        cfg("bk1", "bk_orders_a", "SELECT o_custkey, o_totalprice FROM orders")
    )
    r2 = Orchestrator(spark).run(
        cfg("bk2", "bk_orders_b", "SELECT o_custkey, o_orderdate FROM orders")
    )
    assert r1.write_results[0]["reconciliation"]["ok"]
    assert r2.write_results[0]["reconciliation"]["ok"]
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = (
            spark.table("bk_orders_a").join(spark.table("bk_orders_b"), "o_custkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_orders_a")
        spark.sql("DROP TABLE IF EXISTS bk_orders_b")
    assert "Exchange" not in plan


def test_typoed_load_type_raises_with_hint(spark, tmp_path):
    df = spark.range(3).toDF("id")
    spec = TargetSpec(
        data_target="local", dataframe_name="out", load_type="scdtype2insert",
        path=str(tmp_path / "typo_out"), file_format="parquet", scd2_keys=["id"],
    )
    with pytest.raises(ValueError, match="did you mean 'scdType2Insert'"):
        write_target(spark, df, spec)
    assert not os.path.exists(str(tmp_path / "typo_out"))


def test_archival_hadoop_path_with_delete(spark, tmp_path):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks.writers import (
        archive_input,
    )

    src = tmp_path / "drop.csv"
    src.write_text("a,b\n1,2\n")
    archive = str(tmp_path / "archive")
    archive_input(str(src), archive, delete_source=True, spark=spark)
    assert (tmp_path / "archive" / "drop.csv").exists()
    assert not src.exists()
