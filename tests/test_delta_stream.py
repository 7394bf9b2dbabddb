"""Streaming reads of delta-lite tables via the Spark 4 Python Data
Source API (``sources/delta_stream.py``): version-offset microbatches,
exactly-once restarts off the stream checkpoint, dataChange=false
(OPTIMIZE) commits skipped, change commits raise-or-skip per
``skipChangeCommits``, hive partition columns re-attached per file."""

import os
import tempfile

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
    delta_lite as dl,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
    read_delta_lite_stream,
)


def _drain(spark, df, name, checkpoint):
    """One availableNow pass into a memory sink (fresh checkpoint only —
    the memory sink cannot recover a checkpoint)."""
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


def _drain_files(spark, df, out, checkpoint):
    """One availableNow pass into a parquet sink (recoverable checkpoint)
    and the CUMULATIVE sorted rows of the output directory."""
    q = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_reads_appends_and_resumes_exactly_once(spark, tmp_path):
    tp = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    dl.write_delta_lite(spark.range(5).selectExpr("id AS k"), tp)
    dl.write_delta_lite(
        spark.range(5, 10).selectExpr("id AS k"), tp, mode="append"
    )
    got = _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    assert got == [(i,) for i in range(10)]
    # no new commits -> a restart delivers NOTHING new (offset persisted)
    got = _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    assert got == [(i,) for i in range(10)]
    # one more commit -> exactly its rows land, history NOT re-read
    dl.write_delta_lite(
        spark.range(10, 13).selectExpr("id AS k"), tp, mode="append"
    )
    got = _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    assert got == [(i,) for i in range(13)]


def test_optimize_commit_never_redelivers(spark, tmp_path):
    tp = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    dl.write_delta_lite(
        spark.range(20).selectExpr("id AS k").repartition(4), tp
    )
    assert len(
        _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    ) == 20
    # OPTIMIZE rewrites every file with dataChange=false — a pure layout
    # change; the stream must see zero new rows
    dl.optimize_delta_lite(tp, spark, target_files=1)
    got = _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    assert len(got) == 20
    # appends after the compaction still flow
    dl.write_delta_lite(
        spark.range(20, 22).selectExpr("id AS k"), tp, mode="append"
    )
    got = _drain_files(spark, read_delta_lite_stream(spark, tp), out, cp)
    assert got == [(i,) for i in range(22)]


def test_change_commit_raises_unless_skipped(spark, tmp_path):
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(10).selectExpr("id AS k"), tp)
    dl.delete_delta_lite(spark, tp, "k >= 8")
    # DEFAULT start: the first batch is the reconciled current snapshot
    # (deleted rows already gone) — no change commit is ever replayed,
    # so nothing raises and no stale row is delivered
    got = _drain(
        spark,
        read_delta_lite_stream(spark, tp),
        "ds_c0",
        str(tmp_path / "cp0"),
    )
    assert got == [(i,) for i in range(8)]
    # explicit history replay (startingVersion=0) DOES cross the DELETE
    # commit: append-only streaming breaks and the source raises
    q = (
        read_delta_lite_stream(spark, tp, startingVersion=0)
        .writeStream.format("memory")
        .queryName("ds_c1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp1"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises(Exception, match="skipChangeCommits") as excinfo:
        q.awaitTermination()
    assert isinstance(excinfo.value, PySparkException) or "data-changing" in str(
        excinfo.value
    )
    # replay + the option: the DELETE commit is skipped wholesale — the
    # stream delivers v0's adds only (delta's skipChangeCommits shape)
    out = str(tmp_path / "out2")
    got = _drain_files(
        spark,
        read_delta_lite_stream(
            spark, tp, skipChangeCommits=True, startingVersion=0
        ),
        out,
        str(tmp_path / "cp2"),
    )
    assert got == [(i,) for i in range(10)]
    # post-delete appends flow on the same checkpoint
    dl.write_delta_lite(
        spark.range(100, 102).selectExpr("id AS k"), tp, mode="append"
    )
    got = _drain_files(
        spark,
        read_delta_lite_stream(
            spark, tp, skipChangeCommits=True, startingVersion=0
        ),
        out,
        str(tmp_path / "cp2"),
    )
    assert got == [(i,) for i in range(10)] + [(100,), (101,)]


def test_partition_columns_reattached_with_types(spark, tmp_path):
    tp = str(tmp_path / "t")
    src = spark.createDataFrame(
        [(1, 10, "2024-01-01", "us"), (2, 20, "2024-01-02", "eu"), (3, 30, None, None)],
        "k int, n int, ds string, region string",
    ).selectExpr("k", "n", "CAST(ds AS DATE) AS ds", "region")
    dl.write_delta_lite(src, tp, partition_by=["ds", "region"])
    got = _drain(
        spark,
        read_delta_lite_stream(spark, tp),
        "ds_p1",
        str(tmp_path / "cp"),
    )
    assert got == _rows(dl.read_delta_lite(spark, tp))
    stream_df = read_delta_lite_stream(spark, tp)
    assert [f.simpleString() for f in stream_df.schema.fields] == [
        f.simpleString() for f in dl.load_snapshot(tp).schema.fields
    ]


def test_stream_then_transform_then_sink(spark, tmp_path):
    # the source composes with ordinary streaming transforms
    tp = str(tmp_path / "t")
    dl.write_delta_lite(
        spark.range(100).selectExpr("id AS k", "id % 3 AS g"), tp
    )
    df = read_delta_lite_stream(spark, tp)
    agg = df.groupBy("g").count()
    name = "ds_t1"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ds_cp_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["g"]: r["count"] for r in spark.table(name).collect()}
    assert got == {0: 34, 1: 33, 2: 33}


def test_config_streaming_input_reads_delta(spark, tmp_path):
    """The dialect's streaming flag composes with fileFormat deltalake:
    phase_1 input {streaming: true, fileFormat: deltalake} yields the
    version-offset stream (skipChangeCommits passed via options)."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import (
        InputSpec,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
        read_input,
    )

    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(7).selectExpr("id AS k"), tp)
    dl.delete_delta_lite(spark, tp, "k = 0")
    df = read_input(
        spark,
        InputSpec(
            path=tp,
            file_format="deltalake",
            streaming=True,
            options={"skipChangeCommits": "true"},
            select_columns=["k"],
        ),
    )
    assert df.isStreaming
    got = _drain(spark, df, "ds_cfg", str(tmp_path / "cp"))
    # default snapshot start: the reconciled table (k=0 already deleted),
    # NOT a stale v0 replay — skipChangeCommits only governs later commits
    assert got == [(i,) for i in range(1, 7)]


def test_timestamp_and_decimal_columns_roundtrip(spark, tmp_path):
    """Type-edge pin: INT96 parquet timestamps (Spark's default) come
    back from pyarrow as naive ns; the Arrow cast to the declared
    timestamp[us, tz=UTC] must preserve the INSTANT, and decimals their
    scale."""
    tp = str(tmp_path / "t")
    src = spark.createDataFrame(
        [(1, "2024-03-01 12:34:56.789", "12.34"), (2, "2024-03-02 00:00:00", "0.01")],
        "k int, ts string, amt string",
    ).selectExpr(
        "k", "CAST(ts AS TIMESTAMP) AS ts", "CAST(amt AS DECIMAL(10,2)) AS amt"
    )
    dl.write_delta_lite(src, tp)
    got = _drain(
        spark,
        read_delta_lite_stream(spark, tp),
        "ds_ty1",
        str(tmp_path / "cp"),
    )
    assert got == _rows(dl.read_delta_lite(spark, tp))
    assert got == _rows(src)


def test_starting_version_skips_backfill(spark, tmp_path):
    """delta-spark's startingVersion: 'latest' tails only commits after
    stream start (the 100-TB shape for long-lived tables — no backfill
    batch); an integer starts at that commit. Restarts still resume
    from the checkpoint, unaffected by the option."""
    tp = str(tmp_path / "t")
    for i in range(3):
        dl.write_delta_lite(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id AS k"),
            tp,
            mode="append" if i else "overwrite",
        )
    # startingVersion=latest: the 3 existing commits are NOT delivered
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    got = _drain_files(
        spark,
        read_delta_lite_stream(spark, tp, startingVersion="latest"),
        out,
        cp,
    )
    assert got == []
    # new commits after stream start DO flow, on the same checkpoint
    dl.write_delta_lite(
        spark.range(100, 103).selectExpr("id AS k"), tp, mode="append"
    )
    got = _drain_files(
        spark,
        read_delta_lite_stream(spark, tp, startingVersion="latest"),
        out,
        cp,
    )
    assert got == [(100,), (101,), (102,)]
    # integer form: start at commit 2 (versions 2..3)
    got2 = _drain(
        spark,
        read_delta_lite_stream(spark, tp, startingVersion=2),
        "ds_sv2",
        str(tmp_path / "cp2"),
    )
    assert got2 == [(i,) for i in range(20, 30)] + [(100,), (101,), (102,)]


def test_corrupt_log_line_is_clean_error(spark, tmp_path):
    """A garbage commit line surfaces as the module's one corrupt-input
    class (ValueError via JSONDecodeError) at PLANNING time — never a
    half-delivered batch."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(3).selectExpr("id AS k"), tp)
    dl.write_delta_lite(spark.range(3, 6).selectExpr("id AS k"), tp, mode="append")
    with open(os.path.join(tp, dl.LOG_DIR, f"{1:020d}.json"), "a") as fh:
        fh.write("{this is not json\n")
    # the corrupt line already fails SCHEMA resolution (load_snapshot
    # replay) — the stream never constructs, let alone half-delivers
    with pytest.raises(Exception, match="JSONDecodeError|Expecting property name"):
        read_delta_lite_stream(spark, tp).writeStream.format("memory").queryName(
            "ds_corrupt"
        ).outputMode("append").option(
            "checkpointLocation", str(tmp_path / "cp")
        ).trigger(availableNow=True).start()


def test_timestamp_arg_type_contract(spark, tmp_path):
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(1).selectExpr("id AS k"), tp)
    with pytest.raises(TypeError):
        dl.load_snapshot(tp, timestamp=True)  # bool is not a timestamp
    with pytest.raises(TypeError):
        dl.load_snapshot(tp, timestamp=[1, 2])
    with pytest.raises(ValueError):  # garbage ISO string
        dl.load_snapshot(tp, timestamp="not-a-date")
    # restore beyond the latest version names the missing commit
    with pytest.raises(ValueError, match="not available"):
        dl.restore_delta_lite(tp, version=99)


def test_registration_is_per_session(spark, tmp_path):
    """Review finding: Pipeline tasks run in spark.newSession(); the
    registration cache keyed on applicationId made the SECOND session
    skip registration and fail with DATA_SOURCE_NOT_FOUND. Now every
    distinct session registers (identity-weak cache)."""
    tp = str(tmp_path / "t")
    dl.write_delta_lite(spark.range(4).selectExpr("id AS k"), tp)
    got1 = _drain(
        spark, read_delta_lite_stream(spark, tp), "ds_s1", str(tmp_path / "cp1")
    )
    child = spark.newSession()
    got2 = _drain(
        child, read_delta_lite_stream(child, tp), "ds_s2", str(tmp_path / "cp2")
    )
    assert got1 == [(i,) for i in range(4)]
    # memory sink registers its table in the CHILD session's catalog
    assert sorted(
        tuple(r) for r in child.table("ds_s2").collect()
    ) == [(i,) for i in range(4)] or got2 == [(i,) for i in range(4)]
