"""Round-3 fixes: SFTP sink (W9), Hadoop-FS single-file rename (W3),
catalog append reconciliation, Delta MERGE staging lanes, compact_files
Hadoop sizing, SFTP key/host-key hardening."""

from __future__ import annotations

import os
import sys
import types

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
    TargetSpec,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
    scd2_initial,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks.writers import (
    _scd2_merge_staging,
    _single_file_rename,
    write_target,
)

from conftest import spark  # noqa: F401 (fixture)


# ---------------------------------------------------------------------------
# fake paramiko with upload support
# ---------------------------------------------------------------------------


class _FakeSFTPClient:
    """Serves/accepts files against a local directory as if remote."""

    def __init__(self, root):
        self.root = root
        self.put_calls = []

    def _local(self, path):
        return os.path.join(self.root, path.lstrip("/"))

    def stat(self, path):
        st = os.stat(self._local(path))
        return types.SimpleNamespace(st_mode=st.st_mode)

    def listdir(self, path):
        return os.listdir(self._local(path))

    def get(self, remote, local):
        import shutil

        shutil.copy2(self._local(remote), local)

    def mkdir(self, path):
        os.makedirs(self._local(path), exist_ok=True)

    def put(self, local, remote):
        import shutil

        shutil.copy2(local, self._local(remote))
        self.put_calls.append((local, remote))

    def close(self):
        pass


def _fake_paramiko(served_root, connects):
    mod = types.ModuleType("paramiko")
    client = _FakeSFTPClient(served_root)

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
            return client

    mod.Transport = Transport
    mod.SFTPClient = SFTPClient
    mod._client = client
    return mod


# ---------------------------------------------------------------------------
# W9: sftp sink
# ---------------------------------------------------------------------------


def test_sftp_sink_pushes_staged_files(spark, tmp_path, monkeypatch):
    remote_root = tmp_path / "remote"
    remote_root.mkdir()
    connects = []
    fake = _fake_paramiko(str(tmp_path), connects)
    monkeypatch.setitem(sys.modules, "paramiko", fake)

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    spec = TargetSpec(
        data_target="sftp",
        dataframe_name="out",
        load_type="simpleInsert",
        sftp_host="vendor.example.com",
        remote_path="/remote/drop",
        file_format="csv",
        single_file=True,
        output_file_name_prefix="export",
        options={"port": "2022", "username": "u", "password": "p"},
    )
    write_target(spark, df, spec)

    dropped = os.listdir(remote_root / "drop")
    assert any(f.startswith("export") and f.endswith(".csv") for f in dropped), dropped
    content = (remote_root / "drop" / dropped[0]).read_text()
    assert "id" in content and "1,a" in content.replace("\r", "")
    assert connects[0] == ("vendor.example.com", 2022)


def test_sftp_sink_requires_host(spark, monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "paramiko", _fake_paramiko(str(tmp_path), []))
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="sftpServerName"):
        write_target(spark, df, TargetSpec(data_target="sftp", remote_path="/x"))


def test_sftp_key_loading_tries_modern_types(tmp_path):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sftp import (
        _load_private_key,
    )

    keyfile = tmp_path / "id"
    keyfile.write_text("fake")
    sentinel = object()
    mod = types.ModuleType("paramiko")

    class Ed25519Key:
        @staticmethod
        def from_private_key_file(path):
            raise ValueError("not an ed25519 key")

    class RSAKey:
        @staticmethod
        def from_private_key_file(path):
            return sentinel

    mod.Ed25519Key = Ed25519Key
    mod.RSAKey = RSAKey
    assert _load_private_key(mod, str(keyfile)) is sentinel


def test_sftp_host_key_path_must_exist():
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sftp import (
        _expected_host_key,
    )

    mod = types.ModuleType("paramiko")

    class HostKeys:
        def __init__(self, path):
            raise AssertionError("should not load a missing file")

    mod.HostKeys = HostKeys
    with pytest.raises(ValueError, match="does not exist"):
        _expected_host_key(mod, "h", "/nonexistent/known_hosts")


# ---------------------------------------------------------------------------
# W3: Hadoop-FS single-file rename
# ---------------------------------------------------------------------------


def test_single_file_rename_works_on_fs_uri(spark, tmp_path):
    out = tmp_path / "export"
    df = spark.createDataFrame([(i,) for i in range(5)], "id int")
    df.coalesce(1).write.mode("overwrite").csv(f"file://{out}", header=True)
    _single_file_rename(spark, f"file://{out}", "report")
    files = os.listdir(out)
    assert any(f.startswith("report") and f.endswith(".csv") for f in files), files
    assert not any(f.startswith("part-") for f in files)
    assert not any(f.endswith(".crc") for f in files)


def test_single_file_rename_refuses_silent_skip(spark, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(IOError, match="no part-"):
        _single_file_rename(spark, str(empty), "report")


# ---------------------------------------------------------------------------
# V6: catalog append reconciles the count delta
# ---------------------------------------------------------------------------


def test_catalog_append_reconciles_delta(spark):
    spark.sql("DROP TABLE IF EXISTS recon_append_t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    spec = TargetSpec(
        data_target="catalog",
        table_name="recon_append_t",
        load_type="simpleInsert",
        reconciliation=True,
    )
    first = write_target(spark, df, spec)
    assert first["reconciliation"]["ok"], first
    second = write_target(spark, df, spec)
    # pre-round-3: expected=2 vs written=FULL table (4) -> bogus failure
    assert second["reconciliation"]["ok"], second
    assert second["reconciliation"]["pre_existing"] == 2
    assert spark.table("recon_append_t").count() == 4
    spark.sql("DROP TABLE recon_append_t")


# ---------------------------------------------------------------------------
# W5: Delta MERGE staging lanes (contract test, no delta dependency)
# ---------------------------------------------------------------------------


def _staged_rows(spark, incoming_rows):
    target = scd2_initial(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, price double"),
        "2024-01-01 00:00:00",
    )
    incoming = spark.createDataFrame(incoming_rows, "k int, price double")
    staged, data_cols, compare = _scd2_merge_staging(target, incoming, ["k"], None)
    assert data_cols == ["k", "price"] and compare == ["price"]
    return staged.collect()


def test_delta_staging_unchanged_row_gets_only_keyed_lane(spark):
    rows = _staged_rows(spark, [(1, 10.0)])  # identical to current
    assert len(rows) == 1
    assert rows[0]["__mk_k"] == 1  # keyed lane only; nothing to insert


def test_delta_staging_changed_row_gets_both_lanes(spark):
    rows = _staged_rows(spark, [(1, 11.0)])
    keyed = [r for r in rows if r["__mk_k"] is not None]
    nullk = [r for r in rows if r["__mk_k"] is None]
    assert len(keyed) == 1 and keyed[0]["k"] == 1  # closes the old version
    assert len(nullk) == 1 and nullk[0]["price"] == 11.0  # inserts the new


def test_delta_staging_new_key_gets_single_insert_lane(spark):
    rows = _staged_rows(spark, [(9, 90.0)])
    # keyed lane matches nothing -> whenNotMatchedInsert; a second NULL-key
    # row would double-insert
    assert len(rows) == 1
    assert rows[0]["__mk_k"] == 9


def test_delta_staging_dedups_duplicate_incoming_keys(spark):
    rows = _staged_rows(spark, [(1, 11.0), (1, 12.0), (1, 12.0)])
    keyed = [r for r in rows if r["__mk_k"] is not None]
    # one row per key (greatest under the non-key total order), else the
    # MERGE aborts with multiple-source-rows-matched
    assert len(keyed) == 1 and keyed[0]["price"] == 12.0


# ---------------------------------------------------------------------------
# winnow-candidate near-dup (char-gram Jaccard, MOSS shape)
# ---------------------------------------------------------------------------


def test_winnow_near_dup_pairs_finds_shared_runs(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.dedup import (
        winnow_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),  # long shared run -> near-dup
            (3, "completely different content with nothing shared here at all"),
        ],
        "doc_id int, text string",
    )
    pairs = winnow_near_dup_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard_sim"] > 0.8


def test_winnow_near_dups_config_step(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    df = spark.createDataFrame(
        [(1, "shared shared shared shared text"), (2, "shared shared shared shared text")],
        "doc_id int, text string",
    )
    out = apply_operator(
        "winnowNearDups", df, {"id_col": "doc_id", "text_col": "text"}
    )
    assert out.count() == 1


# ---------------------------------------------------------------------------
# compact_files sizes through Hadoop FS
# ---------------------------------------------------------------------------


def test_compact_files_sizes_via_hadoop_fs(spark, tmp_path):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
        compact_files,
    )

    path = str(tmp_path / "t")
    spark.range(0, 10_000).repartition(16).write.parquet(path)
    assert len([f for f in os.listdir(path) if f.startswith("part-")]) == 16
    n = compact_files(spark, f"file://{path}", target_mb=128)
    assert n == 1  # tiny table -> one file, swap succeeded
    assert spark.read.parquet(path).count() == 10_000
