"""Round-6: execute the previously gated S7 (excel) path for real via the
vendored pure-stdlib SpreadsheetML codec, and pin the S10/W8 (JDBC)
option-wiring contract with a test double (no driver jar in the
container, so the exact options Spark would hand the datasource ARE the
testable surface: query pushdown, truncate-on-overwrite, batchsize
passthrough)."""

import os

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
    InputSpec,
    TargetSpec,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks import writers
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import readers
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.xlsx_lite import (
    read_xlsx,
    write_xlsx,
)


# -- xlsx codec --------------------------------------------------------------


def test_xlsx_lite_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    cols = ["name", "qty", "price", "ok"]
    rows = [("widget", 3, 1.5, True), ("a <&> b", 0, -2.25, False), ("", 7, 0.0, True)]
    write_xlsx(path, cols, rows)
    got_cols, got_rows = read_xlsx(path)
    assert got_cols == cols
    assert [tuple(r) for r in got_rows] == rows


def test_xlsx_lite_sparse_cells(tmp_path):
    path = str(tmp_path / "s.xlsx")
    write_xlsx(path, ["a", "b", "c"], [(None, "x", None), (1, None, 2)])
    _, rows = read_xlsx(path)
    assert rows == [[None, "x", None], [1, None, 2]]


def test_excel_source_and_sink_execute(spark, tmp_path):
    """S7 end-to-end through the engine's reader/writer entry points —
    the branch that was import-gated through round 5 now runs."""
    df = spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", -1.0)], "id long, name string, score double"
    )
    out = str(tmp_path / "out.xlsx")
    writers.write_target(
        spark,
        df,
        TargetSpec(data_target="local", file_format="excel", path=out, sort_by=["id"]),
    )
    assert os.path.exists(out)
    back = readers.read_input(
        spark,
        InputSpec(data_source="local", file_format="excel", path=out, dataframe_name="x"),
    )
    got = sorted(
        (int(r["id"]), r["name"], float(r["score"])) for r in back.collect()
    )
    assert got == [(1, "alpha", 10.5), (2, "beta", -1.0)]


def test_excel_sink_row_cap_still_enforced(spark, tmp_path):
    big = spark.range(writers._EXCEL_MAX_ROWS + 10).select(F.col("id"))
    with pytest.raises(ValueError, match="exceeds"):
        writers.write_target(
            spark,
            big,
            TargetSpec(
                data_target="local", file_format="excel", path=str(tmp_path / "big.xlsx")
            ),
        )


# -- JDBC contract doubles ---------------------------------------------------


class _FakeReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return ("loaded", self.fmt, dict(self.opts))


class _FakeSparkForRead:
    def __init__(self):
        self.reader = _FakeReader()

    @property
    def read(self):
        return self.reader


def test_jdbc_read_pushes_query_and_options():
    spark = _FakeSparkForRead()
    spec = InputSpec(
        data_source="database",
        dataframe_name="db_in",
        jdbc_url="jdbc:postgresql://host/db",
        table_query="SELECT id, amt FROM t WHERE amt > 0",
        jdbc_properties={"user": "u", "driver": "org.postgresql.Driver"},
        options={"fetchsize": "5000", "numPartitions": "8"},
    )
    tag, fmt, opts = readers._read_jdbc(spark, spec)
    assert tag == "loaded" and fmt == "jdbc"
    assert opts["url"] == "jdbc:postgresql://host/db"
    # tableQuery pushes the WHOLE statement to the source DB
    assert opts["query"] == "SELECT id, amt FROM t WHERE amt > 0"
    assert "dbtable" not in opts
    assert opts["fetchsize"] == "5000" and opts["numPartitions"] == "8"
    assert opts["user"] == "u" and opts["driver"] == "org.postgresql.Driver"


def test_jdbc_read_table_name_when_no_query():
    spark = _FakeSparkForRead()
    spec = InputSpec(
        data_source="database",
        jdbc_url="jdbc:h2:mem:x",
        table_name="public.orders",
    )
    _, _, opts = readers._read_jdbc(spark, spec)
    assert opts["dbtable"] == "public.orders"
    assert "query" not in opts


def test_jdbc_read_requires_url():
    with pytest.raises(ValueError, match="jdbcUrl"):
        readers._read_jdbc(_FakeSparkForRead(), InputSpec(data_source="database"))


class _FakeWriter:
    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.saved_mode = None
        self.saved = False

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def mode(self, m):
        self.saved_mode = m
        return self

    def save(self):
        self.saved = True


class _FakeDFForWrite:
    def __init__(self):
        self.writer = _FakeWriter()

    @property
    def write(self):
        return self.writer


def test_jdbc_write_truncate_insert_contract():
    df = _FakeDFForWrite()
    spec = TargetSpec(
        data_target="database",
        load_type="truncateInsert",
        jdbc_url="jdbc:postgresql://host/db",
        table_name="public.out",
        jdbc_properties={"batchsize": "10000", "user": "u"},
    )
    writers._write_jdbc(df, spec, mode="overwrite")
    w = df.writer
    assert w.saved and w.fmt == "jdbc" and w.saved_mode == "overwrite"
    # truncateInsert must map to overwrite+truncate so target DDL survives
    assert w.opts["truncate"] == "true"
    assert w.opts["dbtable"] == "public.out"
    assert w.opts["batchsize"] == "10000"


def test_jdbc_write_append_does_not_truncate():
    df = _FakeDFForWrite()
    spec = TargetSpec(
        data_target="database",
        load_type="simpleInsert",
        jdbc_url="jdbc:h2:mem:x",
        table_name="t",
    )
    writers._write_jdbc(df, spec, mode="append")
    assert df.writer.saved_mode == "append"
    assert "truncate" not in df.writer.opts


# -- config misshape guard ---------------------------------------------------


def test_empty_phase_config_rejected():
    """A config with none of the dialect's phase sections must raise, not
    parse to an empty job that runs as a silent no-op (found by driving a
    mis-keyed config through the Orchestrator in round 6)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        JobConfig,
    )

    with pytest.raises(ValueError, match="no phase_1/phase_2/phase_3"):
        JobConfig.from_dict(
            {"jobName": "oops", "inputs": [], "transformations": [], "targets": []}
        )


def test_phase_sections_still_accepted_in_either_placement():
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        JobConfig,
    )

    nested = JobConfig.from_dict(
        {"configs": {"name": "n", "phase_1": {"input_data": {
            "dataFrameName": "d", "path": "/tmp/x", 
            "fileProperties": {"fileFormat": "parquet"}}}}}
    )
    assert nested.primary_input is not None
    flat = JobConfig.from_dict(
        {"phase_2": {"data_transformations": [
            {"sqlQuery": "SELECT 1 AS x", "outputDFName": "o"}]}}
    )
    assert flat.transformations[0].output_df_name == "o"


# -- fuzzy join --------------------------------------------------------------


def test_deletion_variant_blocking_is_complete_vs_brute_force(spark):
    """Candidate completeness is the operator's whole contract: compare
    against brute-force levenshtein on a set covering substitution,
    insertion, deletion, transposition-as-2-edits, and no-match."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.fuzzy import (
        fuzzy_self_join,
    )

    rows = [
        (1, "kitten"), (2, "sitten"), (3, "kittens"), (4, "kitte"),
        (5, "mitten"), (6, "banana"), (7, "bananna"), (8, "abcdef"),
        (9, "ktiten"), (10, "kitten"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["edit_distance"])
            for r in fuzzy_self_join(df, "id", "name", max_distance=d).collect()
        }
        import itertools

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            return dp[-1]

        want = {
            (ia, ib, lev(na, nb))
            for (ia, na), (ib, nb) in itertools.combinations(rows, 2)
            if lev(na, nb) <= d
        }
        assert got == want, f"d={d}: {got ^ want}"


def test_fuzzy_join_two_sided_and_zero_distance(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.fuzzy import (
        fuzzy_join,
    )

    left = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, name string")
    right = spark.createDataFrame([(10, "alpha"), (11, "betta")], "id long, name string")
    exact = fuzzy_join(left, right, "id", "name", "id", "name", max_distance=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 10)}
    d1 = fuzzy_join(left, right, "id", "name", "id", "name", max_distance=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in d1} == {(1, 10), (2, 11)}


def test_fuzzy_self_join_config_callable(spark, tables):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    cust = spark.table("customer")
    out = apply_operator(
        "fuzzySelfJoin", cust,
        {"id_col": "c_custkey", "text_col": "c_name", "max_distance": "1"},
    )
    rows = out.collect()
    assert rows and all(r["edit_distance"] <= 1 and r["id_a"] < r["id_b"] for r in rows)


def test_sftp_sink_uploads_staged_files(spark, tmp_path, monkeypatch):
    """W9 executes end-to-end through the fake transport: write_target
    stages through the normal file writer, uploads the produced csv to
    the 'remote', and the remote copy reads back byte-faithful."""
    import csv as csvmod
    import sys

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        TargetSpec,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks.writers import (
        write_target,
    )
    from tests.test_round2_fixes import _fake_paramiko

    connects = []
    monkeypatch.setitem(sys.modules, "paramiko", _fake_paramiko(str(tmp_path), connects))
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    spec = TargetSpec(
        data_target="sftp",
        dataframe_name="outbox",
        sftp_host="vendor.example.com",
        remote_path="/outbox/run1",
        file_format="csv",
        single_file=True,
        output_file_name_prefix="export",
        options={"port": "2022", "username": "u", "password": "p"},
    )
    write_target(spark, df, spec)
    assert connects[0] == ("vendor.example.com", 2022)
    remote_dir = tmp_path / "outbox" / "run1"
    files = [p for p in remote_dir.iterdir() if p.name.startswith("export")]
    assert len(files) == 1 and files[0].suffix == ".csv"
    with open(files[0]) as f:
        rows = list(csvmod.DictReader(f))
    assert sorted(int(r["id"]) for r in rows) == [1, 2, 3]


def test_scd2_delta_merge_contract_double(spark):
    """S9/W5 Delta branch executes against a DeltaTable double: pins the
    exact MERGE contract — join condition, matched-update gating on the
    fingerprint, insert values — without delta-spark in the container
    (the JDBC contract-double precedent)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        TargetSpec,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
        EFF_END,
        EFF_START,
        IS_CURRENT,
        scd2_initial,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sinks.writers import (
        _scd2_delta_merge,
    )

    target = scd2_initial(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        effective_ts="2024-01-01 00:00:00",
    )
    incoming = spark.createDataFrame([(1, 11), (3, 30)], "k int, v int")

    class FakeDeltaTable:
        def __init__(self, df):
            self._df = df
            self.calls = {}

        def toDF(self):
            return self._df

        def alias(self, a):
            self.calls["alias"] = a
            return self

        def merge(self, staged, cond):
            self.calls["merge"] = (staged, cond)
            return self

        def whenMatchedUpdate(self, condition, set):
            self.calls["matched"] = (condition, set)
            return self

        def whenNotMatchedInsert(self, values):
            self.calls["insert"] = values
            return self

        def execute(self):
            self.calls["executed"] = True

    dt = FakeDeltaTable(target)
    spec = TargetSpec(
        data_target="local", load_type="scdType2Insert",
        scd2_keys=["k"], scd2_effective_col="2024-02-01 00:00:00",
    )
    _scd2_delta_merge(spark, dt, incoming, spec)

    assert dt.calls["executed"] is True
    staged, cond = dt.calls["merge"]
    assert cond == f"t.k = s.__mk_k AND t.{IS_CURRENT} = true"
    # two-lane staging: key 1 changed -> KEYED + NULL-key lanes; key 3 is
    # brand-new -> KEYED lane only (a second lane would double-insert)
    lanes = sorted(
        (r["k"], r["__mk_k"] is None) for r in staged.collect()
    )
    assert lanes == [(1, False), (1, True), (3, False)]
    matched_cond, matched_set = dt.calls["matched"]
    assert f"t.{IS_CURRENT} = true" in matched_cond and "__fp" in matched_cond
    assert set(matched_set) == {EFF_END, IS_CURRENT}
    insert_values = dt.calls["insert"]
    assert {EFF_START, EFF_END, IS_CURRENT} <= set(insert_values)
    assert "k" in insert_values and "v" in insert_values
