"""phase_1 source readers (SURVEY.md §2.1, S1-S14).

The reference supports ``dataSource: aws-s3|database|sftp|local`` and
``fileFormat: csv|parquet|orc|json|xml|excel|text|deltalake``
(``spark.json:15,19``), external schema mapping (``spark.json:21-22``),
ingest-time projection (``spark.json:23``), and side inputs with whole-query
pushdown to a source database (``spark.json:32-38``).

Scale notes:
  - Everything returns an untriggered DataFrame — the scan plan stays lazy
    so Catalyst can push filters/prune columns into the parquet/orc reader.
  - ``selectColumns`` is applied as an explicit ``select`` immediately after
    the read: free for columnar formats (pruning would do it anyway), a real
    win for csv/excel where it bounds the parsed width.
  - JDBC ``tableQuery`` is passed as the ``query`` option so the source DB
    executes it (pushdown), not Spark.
"""

from __future__ import annotations

import json
import os
from dataclasses import replace
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    from ..config import InputSpec

#: formats Spark reads natively with ``spark.read.format(...)``
_NATIVE_FORMATS = {"csv", "parquet", "orc", "json", "text"}


def _parquet_nanos_cols(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects outright (PARQUET_TYPE_ILLEGAL). Footer-only check."""
    import glob as _glob

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        cands = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not cands:
            return []
        f = cands[0]
    try:
        # Check the PARQUET schema, not the Arrow view of it: pyarrow
        # surfaces Spark's INT96 timestamps as timestamp[ns] too, and those
        # read natively — only true INT64/TIMESTAMP(NANOS) columns trip
        # Spark's reader and need the nanos-as-long conversion.
        md = pq.read_metadata(f).schema
        cols = []
        for i in range(len(md)):
            col = md.column(i)
            lt = str(col.logical_type)
            if col.physical_type == "INT64" and "Timestamp" in lt and "nano" in lt:
                cols.append(col.name)
        return cols
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str, options: dict[str, str] | None = None) -> DataFrame:
    """Parquet scan tolerant of TIMESTAMP(NANOS) columns: reads nanos as
    long (``spark.sql.legacy.parquet.nanosAsLong``) and converts to a
    microsecond timestamp with integer division — no double-precision loss
    on epoch-nanos magnitudes."""
    from pyspark.sql import functions as F

    ns_cols = _parquet_nanos_cols(path)
    reader = spark.read.options(**(options or {}))
    if not ns_cols:
        return reader.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = reader.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_schema_mapping(metadata_path: str) -> StructType:
    """S14: parse an external metadata file into a StructType.

    The dialect's ``dataMapping + metadataPath`` (spark.json:21-22) drives
    column naming/typing from a JSON schema file. We accept either Spark's
    own ``StructType.jsonValue()`` shape or a simple
    ``{"columns": [{"name": ..., "type": ...}, ...]}`` list.
    """
    with open(metadata_path) as f:
        meta = json.load(f)
    if isinstance(meta, dict) and "fields" in meta:
        return StructType.fromJson(meta)
    cols = meta["columns"] if isinstance(meta, dict) else meta
    from pyspark.sql.types import _parse_datatype_string  # public-ish helper

    fields = ", ".join(f"`{c['name']}` {c.get('type', 'string')}" for c in cols)
    return _parse_datatype_string(fields)


def _read_excel(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """S7: no core Spark excel reader — bridge through pandas when openpyxl
    is present, else through the vendored pure-stdlib SpreadsheetML subset
    codec (``xlsx_lite``), so the branch executes in any environment.
    Excel inputs are inherently single-machine-sized; the bridge is
    acceptable at any scale the format itself supports."""
    try:
        import pandas as pd

        pdf = pd.read_excel(spec.path, header=0 if spec.header else None)
        pdf.columns = [str(c) for c in pdf.columns]
        return spark.createDataFrame(pdf)
    except ImportError:
        from .xlsx_lite import read_xlsx

        cols, rows = read_xlsx(spec.path, header=spec.header)
        if not rows:
            raise ValueError(f"excel source '{spec.path}' has no data rows")
        # xlsx numbers are doubles; the codec reads whole ones as int. A
        # column mixing both would fail Spark's type merge — float it.
        for j in range(len(cols)):
            vals = [r[j] for r in rows]
            is_int = [isinstance(v, int) and not isinstance(v, bool) for v in vals]
            if any(isinstance(v, float) for v in vals) and any(is_int):
                for r, i in zip(rows, is_int):
                    if i:
                        r[j] = float(r[j])
        return spark.createDataFrame(rows, schema=cols)


def _read_delta(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """S9: Delta source. Prefer the delta-spark DSv2 reader when the
    package is installed (full protocol support); otherwise read through
    the in-repo ``delta_lite`` transaction-log implementation (public
    protocol ≤ (1,2): add/remove replay, checkpoints, hive-partitioned
    layout, ``versionAsOf`` time travel). Either way the scan is a plain
    parquet read underneath, so pushdown/pruning behave like S3."""
    try:
        import delta  # noqa: F401  pragma: no cover - not in this container

        return spark.read.options(**spec.options).format("delta").load(spec.path)
    except ImportError:
        pass
    from .delta_lite import read_delta_lite

    version = spec.options.get("versionAsOf")
    # options.predicate: stats/partition data skipping at FILE-LISTING
    # time (the layer below parquet row-group pushdown) — a config read
    # of one day from a date-keyed table opens that day's files only.
    # Result is identical to reading everything then filtering.
    # options.timestampAsOf: time travel to the version current at that
    # time (epoch-ms int or ISO string, same contract as delta-spark's).
    return read_delta_lite(
        spark,
        spec.path,
        version=int(version) if version is not None else None,
        predicate=spec.options.get("predicate"),
        timestamp=spec.options.get("timestampAsOf"),
    )


def _read_xml(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """S6: try the built-in xml source (Spark 4 ships one); fall back to a
    clear error mentioning the rowTag requirement."""
    row_tag = spec.options.get("rowTag", "row")
    try:
        return (
            spark.read.format("xml").options(**spec.options).option("rowTag", row_tag).load(spec.path)
        )
    except Exception as e:
        raise NotImplementedError(
            f"xml source unavailable in this Spark build ({e}); "
            "provide spark-xml or convert input"
        ) from e


def _sftp_download(sftp, remote_path: str, local_dir: str) -> str:
    """Back-compat alias — the staged fetch lives in the shared
    :mod:`..sftp` module now (the W9 sink shares it)."""
    from ..sftp import download

    return download(sftp, remote_path, local_dir)


def _read_sftp(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """S11 (``spark.json:15`` dataSource sftp): no native Spark connector —
    stage the remote file(s) to a local temp dir over SFTP, then delegate
    to the local reader so every fileFormat works unchanged. Gated behind
    paramiko (the only missing dependency; the fetch itself is real).

    Scale note: sftp is a single-stream protocol — it is inherently a
    small-file ingestion edge (the reference uses it for vendor drops),
    never the 100 TB path; staging through the driver's temp dir matches
    that reality."""
    try:
        import paramiko  # noqa: F401 — gate only; transport built in ..sftp
    except ImportError as e:
        raise NotImplementedError(
            "sftp source requires paramiko (not in this container); "
            "stage files locally and use dataSource=local"
        ) from e
    if not spec.sftp_host:
        raise ValueError(f"sftp input '{spec.dataframe_name}' needs sftpServerName")
    remote = spec.remote_path or spec.path
    if not remote:
        raise ValueError(f"sftp input '{spec.dataframe_name}' needs remoteDirPath")

    import tempfile

    from ..sftp import connect, download

    transport, sftp = connect(spec.sftp_host, spec.options)
    try:
        local = download(sftp, remote, tempfile.mkdtemp(prefix="sftp_stage_"))
    finally:
        sftp.close()
        transport.close()
    staged = replace(spec, data_source="local", path=local, remote_path=None)
    return read_input(spark, staged)


def _read_jdbc(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """S10: database source. ``tableQuery`` pushes the whole SQL down to the
    source DB (spark.json:36); ``tableName`` reads a table. Partitioned
    reads (partitionColumn/numPartitions) flow through ``options``."""
    if not spec.jdbc_url:
        raise ValueError(f"database input '{spec.dataframe_name}' needs jdbcUrl")
    reader = spark.read.format("jdbc").option("url", spec.jdbc_url)
    for k, v in {**spec.jdbc_properties, **spec.options}.items():
        reader = reader.option(k, v)
    if spec.table_query:
        q = spec.table_query
        if q.strip().lower().endswith(".sql") and os.path.exists(q.strip()):
            with open(q.strip()) as f:
                q = f.read()
        reader = reader.option("query", q)
    else:
        reader = reader.option("dbtable", spec.table_name)
    return reader.load()


def read_stream_input(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """Streaming twin of :func:`read_input` for file sources: the schema
    comes from the external mapping when given, else from a footer/sample
    inference batch read (readStream requires an explicit schema). The
    checkpoint (managed by the engine) makes repeated runs incremental —
    the streaming-native form of the dialect's duplicateRunCheck."""
    if spec.data_source in ("database", "sftp"):
        raise ValueError(f"streaming not supported for dataSource={spec.data_source}")
    if not spec.path:
        raise ValueError(f"streaming input '{spec.dataframe_name}' has no path")
    fmt = spec.file_format
    if fmt == "deltalake":
        # streaming READ of a delta-lite table: version-offset
        # microbatches via the Python Data Source in delta_stream.py
        # (append-only contract; options.skipChangeCommits passes through)
        from .delta_stream import read_delta_lite_stream

        df = read_delta_lite_stream(spark, spec.path, **spec.options)
        if spec.select_columns:
            df = df.select(*spec.select_columns)
        return df
    if fmt not in _NATIVE_FORMATS:
        raise ValueError(f"streaming not supported for fileFormat={fmt}")
    if spec.data_mapping and spec.metadata_path:
        schema = load_schema_mapping(spec.metadata_path)
    else:
        schema = read_input(
            spark, replace(spec, streaming=False)
        ).schema  # footer/sample read only — no data scan
    reader = spark.readStream.options(**spec.options).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", str(spec.header).lower())
    df = reader.format(fmt).load(spec.path)
    if spec.select_columns:
        df = df.select(*spec.select_columns)
    return df


def read_input(spark: SparkSession, spec: "InputSpec") -> DataFrame:
    """Read one phase_1 input per its spec and return the (lazy) DataFrame.

    Registration as a temp view (spark.json:16) happens in the engine so
    this stays reusable outside the config path.
    """
    if spec.streaming:
        return read_stream_input(spark, spec)
    src = spec.data_source

    if src == "database":
        df = _read_jdbc(spark, spec)
    elif src == "sftp":
        df = _read_sftp(spark, spec)
    else:
        # aws-s3 and local are both just paths to Spark (s3a:// vs file://).
        if not spec.path:
            raise ValueError(f"input '{spec.dataframe_name}' has no path")
        fmt = spec.file_format
        if fmt == "parquet" and not (spec.data_mapping and spec.metadata_path):
            df = read_parquet(spark, spec.path, spec.options)
        elif fmt in _NATIVE_FORMATS:
            reader = spark.read.options(**spec.options)
            if fmt == "csv":
                reader = reader.option("header", str(spec.header).lower()).option(
                    "inferSchema", spec.options.get("inferSchema", "true")
                )
            if spec.data_mapping and spec.metadata_path:
                reader = reader.schema(load_schema_mapping(spec.metadata_path))
            df = reader.format(fmt).load(spec.path)
        elif fmt == "deltalake":
            df = _read_delta(spark, spec)
        elif fmt == "xml":
            df = _read_xml(spark, spec)
        elif fmt == "excel":
            df = _read_excel(spark, spec)
        else:
            raise ValueError(f"unsupported fileFormat: {fmt}")

    # S14 post-read mapping for self-describing formats: rename/cast by
    # position-or-name without re-reading.
    if spec.data_mapping and spec.metadata_path and spec.file_format not in ("csv", "text"):
        target = load_schema_mapping(spec.metadata_path)
        if len(target.fields) == len(df.columns):
            from pyspark.sql import functions as F

            df = df.select(
                *[
                    F.col(old).cast(fld.dataType).alias(fld.name)
                    for old, fld in zip(df.columns, target.fields)
                ]
            )

    # P1: explicit ingest-time projection (spark.json:23).
    if spec.select_columns:
        df = df.select(*spec.select_columns)
    return df
