"""phase_1 source readers: formats, header, projection, schema mapping,
SQL-from-file, gated optional deps (SURVEY.md §2.1)."""

import json

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import Orchestrator
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import InputSpec
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import read_input


def _spec(**kw):
    return InputSpec(**{"data_source": "local", "dataframe_name": "t", **kw})


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5)], "id int, name string, score double"
    )


def test_csv_header_and_projection(spark, sample_df, tmp_path):
    p = str(tmp_path / "csv_in")
    sample_df.write.option("header", "true").csv(p)
    out = read_input(spark, _spec(path=p, file_format="csv", header=True, select_columns=["id", "name"]))
    assert out.columns == ["id", "name"]
    assert out.count() == 3


def test_csv_schema_mapping(spark, sample_df, tmp_path):
    p = str(tmp_path / "csv_map")
    sample_df.write.option("header", "true").csv(p)
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps({"columns": [
        {"name": "id", "type": "bigint"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "decimal(10,2)"},
    ]}))
    spec = _spec(path=p, file_format="csv", data_mapping=True, metadata_path=str(meta),
                 options={"inferSchema": "false"})
    out = read_input(spark, spec)
    assert dict(out.dtypes)["id"] == "bigint"
    assert dict(out.dtypes)["score"] == "decimal(10,2)"


def test_json_orc_text_roundtrip(spark, sample_df, tmp_path):
    pj = str(tmp_path / "j")
    po = str(tmp_path / "o")
    sample_df.write.json(pj)
    sample_df.write.orc(po)
    assert read_input(spark, _spec(path=pj, file_format="json")).count() == 3
    assert read_input(spark, _spec(path=po, file_format="orc")).count() == 3

    pt = str(tmp_path / "t")
    sample_df.selectExpr("name AS value").write.text(pt)
    txt = read_input(spark, _spec(path=pt, file_format="text"))
    assert txt.columns == ["value"] and txt.count() == 3


def test_xml_source_native(spark, tmp_path):
    """Spark 4 ships the xml data source natively (S6)."""
    p = tmp_path / "data.xml"
    p.write_text(
        "<rows><row><id>1</id><name>a</name></row><row><id>2</id><name>b</name></row></rows>"
    )
    out = read_input(spark, _spec(path=str(p), file_format="xml", options={"rowTag": "row"}))
    assert out.count() == 2 and set(out.columns) == {"id", "name"}


def test_excel_gated(spark, tmp_path):
    """S7: excel bridges through pandas; without openpyxl it must fail with
    a clear NotImplementedError, not a stack-trace surprise."""
    p = tmp_path / "x.xlsx"
    p.write_bytes(b"not really an xlsx")
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        read_input(spark, _spec(path=str(p), file_format="excel"))
    assert "excel" in str(ei.value).lower() or "openpyxl" in str(ei.value).lower()


def test_spark_written_int96_timestamps_read_natively(spark, tmp_path):
    """Spark's default parquet timestamp is INT96, which pyarrow surfaces
    as timestamp[ns] — the nanos tolerance must NOT fire on it (it would
    apply div-1000 to a proper timestamp and break the read)."""
    import datetime

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import InputSpec
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import read_input

    path = str(tmp_path / "ts_int96")
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45)
    spark.createDataFrame([(1, ts)], "id int, ts timestamp").write.parquet(path)
    spec = InputSpec(data_source="local", dataframe_name="t", path=path, file_format="parquet")
    row = read_input(spark, spec).collect()[0]
    assert row["ts"] == ts


def test_sql_from_file(spark, sample_df, tmp_path):
    """S12: sqlQuery may be a .sql file path (spark.json:57)."""
    src = str(tmp_path / "src")
    sample_df.write.parquet(src)
    sql_file = tmp_path / "transform.sql"
    sql_file.write_text("SELECT id, UPPER(name) AS name_upper FROM t WHERE score > 2")
    cfg = {
        "configs": {
            "name": "sqlfile",
            "phase_1": {"input_data": {"dataSource": "local", "dataFrameName": "t",
                                       "path": src, "fileProperties": {"fileFormat": "parquet"}}},
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {"functionName": "f", "sqlQuery": str(sql_file), "outputDFName": "out"}
            ],
        },
        "phase_3": {},
    }
    res = Orchestrator(spark).run(cfg)
    rows = {r["name_upper"] for r in res.output.collect()}
    assert rows == {"BETA", "GAMMA"}


def test_multi_input_and_junk_removal(spark, sample_df, tmp_path):
    """S13 side inputs + P2 junk characters scrubbed on ingest."""
    dirty = spark.createDataFrame([(1, "cl\x01ean\x7f")], "id int, label string")
    p1, p2 = str(tmp_path / "main"), str(tmp_path / "side")
    dirty.write.parquet(p1)
    sample_df.write.parquet(p2)
    cfg = {
        "configs": {
            "name": "multi",
            "pre_execution_steps": {"junkCharacterRemoval": "true"},
            "phase_1": {"input_data": {"dataSource": "local", "dataFrameName": "main",
                                       "path": p1, "fileProperties": {"fileFormat": "parquet"}}},
            "additional_input_read": [
                {"dataSource": "local", "dataFrameName": "side", "path": p2,
                 "fileProperties": {"fileFormat": "parquet"}}
            ],
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {"functionName": "join", "outputDFName": "out",
                 "sqlQuery": "SELECT m.label, s.name FROM main m JOIN side s ON m.id = s.id"}
            ],
        },
        "phase_3": {},
    }
    res = Orchestrator(spark).run(cfg)
    row = res.output.collect()[0]
    assert row["label"] == "clean"  # junk chars stripped before transform


def test_read_parquet_tolerates_both_timestamp_encodings(spark, tmp_path):
    """Round-5 regression guard: the driver-generated fixtures flipped
    from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds and a
    hardcoded nanos conversion silently produced 1970-era timestamps.
    read_parquet (and the entry's _events_stream) must DETECT the
    encoding from the parquet footer, whichever it is."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
        read_parquet,
    )

    ts = datetime.datetime(2024, 3, 1, 12, 30, 0)
    for unit in ("us", "ns"):
        path = str(tmp_path / f"t_{unit}.parquet")
        table = pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "ts": pa.array([ts, ts], type=pa.timestamp(unit)),
            }
        )
        pq.write_table(table, path)
        got = read_parquet(spark, path).orderBy("id").collect()
        assert got[0]["ts"] == ts, (unit, got[0]["ts"])


def test_events_stream_detects_timestamp_encoding(spark, sf_dir):
    """The streaming reader must agree with the batch reader on event
    time — a unit mix-up collapses the stream into epoch-1970 windows."""
    import __spark_entry__ as em

    batch_min = (
        spark.read.parquet(f"{sf_dir}/events.parquet").agg({"ts": "min"}).first()[0]
    )
    stream = em._events_stream(spark, sf_dir)
    # drain one availableNow pass through a memory sink
    out = em._run_stream(stream.select("event_id", "ts"), "enc_check", "append")
    stream_min = out.agg({"ts": "min"}).first()[0]
    assert stream_min == batch_min
    assert stream_min.year >= 2020  # the 1970-collapse failure mode


def test_csv_corrupt_record_lane(spark, tmp_path):
    """Parse-level dirty data: PERMISSIVE mode + columnNameOfCorruptRecord
    routes malformed CSV rows into a corrupt column instead of failing
    the read — composing with the engine's error-lane model (V1/V2 handle
    semantic dirt; this handles rows that don't even parse). The schema
    comes through the S14 metadata mapping with the corrupt column
    declared, exactly how a user would wire it."""
    import json

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import InputSpec
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
        read_input,
    )

    src = tmp_path / "dirty.csv"
    src.write_text("id,price\n1,10.5\n2,not_a_number\n3,30.0\ngarbage_line_no_comma\n")
    meta = tmp_path / "schema.json"
    meta.write_text(
        json.dumps(
            {
                "fields": [
                    {"name": "id", "type": "integer"},
                    {"name": "price", "type": "double"},
                    {"name": "_corrupt_record", "type": "string"},
                ]
            }
        )
    )
    spec = InputSpec(
        data_source="local",
        dataframe_name="dirty",
        path=str(src),
        file_format="csv",
        header=True,
        data_mapping=True,
        metadata_path=str(meta),
        options={"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    df = read_input(spark, spec).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 2 and {r["id"] for r in good.collect()} == {1, 3}
    assert bad.count() == 2  # the unparsable number and the garbage line
    raws = {r["_corrupt_record"] for r in bad.collect()}
    assert any("not_a_number" in (x or "") for x in raws)
    df.unpersist()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on read: a directory whose newer files carry an
    extra column reads as the UNION schema with mergeSchema=true (nulls
    for old files) — the lakehouse append-with-new-column case, reachable
    through the engine's reader options passthrough."""
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.config import InputSpec
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.readers import (
        read_input,
    )

    src = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id int, s string").write.parquet(src)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id int, s string, score double"
    ).write.mode("append").parquet(src)
    spec = InputSpec(
        data_source="local",
        dataframe_name="evolving",
        path=src,
        file_format="parquet",
        options={"mergeSchema": "true"},
    )
    df = read_input(spark, spec)
    assert set(df.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}
