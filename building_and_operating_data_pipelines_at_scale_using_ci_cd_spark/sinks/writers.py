"""phase_3 sinks and load modes (SURVEY.md §2.5, W1-W13).

Reference surface: file sinks in every format with savemode
overwrite/append/scd2 (``spark.json:83-94``), single-file output with a
name prefix (``spark.json:77-78,89-90``), compression (``spark.json:93``),
JDBC sink (``spark.json:71,74``), load types
simpleInsert/scdType2Insert/truncateInsert (``spark.json:73``), multi-sink
fan-out (``spark.json:69-96``), error quarantine (``spark.json:97-101``),
input archival (``spark.json:10-12``).

Scale notes:
  - ``singleFile`` forces ``coalesce(1)`` — correct only for small exports;
    it is opt-in exactly as in the dialect and never a default.
  - partitioned writes (``partitionBy``) are exposed so big tables land
    partition-pruned for downstream scans.
  - SCD2 load reads the existing target, merges (one key-shuffle join),
    writes to a staging dir, then swaps — a file-sink emulation of Delta
    MERGE that stays atomic-per-run on a real object store via rename.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd2 import scd2_merge, SCD2_META_COLS

if TYPE_CHECKING:
    from ..config import ErrorSinkSpec, TargetSpec

_FORMAT_ALIASES = {"deltalake": "delta", "txt": "text"}


def _fmt(fmt: str) -> str:
    return _FORMAT_ALIASES.get(fmt, fmt)


def _single_file_rename(path: str, prefix: str | None) -> None:
    """W3: collapse the part-file to ``<prefix>.<ext>``, keeping the part
    file's real extension chain (e.g. ``.csv.gz`` under compression — a
    renamed file that drops the codec suffix reads back as garbage)."""
    parts = sorted(glob.glob(os.path.join(path, "part-*")))
    if not parts or not prefix:
        return
    base = os.path.basename(parts[0])
    ext = base.split(".", 1)[1] if "." in base else ""
    target = os.path.join(path, f"{prefix}.{ext}" if ext else prefix)
    shutil.move(parts[0], target)
    for leftover in parts[1:]:  # shouldn't exist after coalesce(1)
        os.remove(leftover)
    for crc in glob.glob(os.path.join(path, ".part-*.crc")):
        os.remove(crc)  # checksums reference the pre-rename file names


def _write_file(df: DataFrame, spec: "TargetSpec", mode: str) -> None:
    fmt = _fmt(spec.file_format)
    out = df.coalesce(1) if spec.single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", str(spec.header).lower())
    if spec.compression:
        writer = writer.option("compression", spec.compression)
    if spec.partition_by:
        writer = writer.partitionBy(*spec.partition_by)
    if fmt == "excel":
        # no core writer — pandas bridge, inherently single-file
        df.toPandas().to_excel(spec.path, index=False)
        return
    writer.format(fmt).save(spec.path)
    if spec.single_file:
        _single_file_rename(spec.path, spec.output_file_name_prefix)


def _write_jdbc(df: DataFrame, spec: "TargetSpec", mode: str) -> None:
    """W8 database sink; truncateInsert maps to overwrite+truncate so the
    DDL survives (``spark.json:73``)."""
    writer = df.write.format("jdbc").option("url", spec.jdbc_url).option(
        "dbtable", spec.table_name
    ).mode(mode)
    if mode == "overwrite" and spec.load_type == "truncateInsert":
        writer = writer.option("truncate", "true")
    for k, v in spec.jdbc_properties.items():
        writer = writer.option(k, v)
    writer.save()


def _scd2_write(spark: SparkSession, df: DataFrame, spec: "TargetSpec") -> None:
    """W5 as a load mode: merge incoming snapshot into the existing target
    path, then atomically swap via a staging directory."""
    fmt = _fmt(spec.file_format)
    keys = spec.scd2_keys
    if not keys:
        raise ValueError(f"scdType2Insert target '{spec.path}' needs scd2Keys")
    target = None
    if spec.path and os.path.exists(spec.path):
        existing = spark.read.format(fmt).load(spec.path)
        if set(SCD2_META_COLS) <= set(existing.columns):
            target = existing
    merged = scd2_merge(
        target,
        df,
        keys=keys,
        compare_cols=spec.scd2_compare_cols or None,
        effective_ts=spec.scd2_effective_col,
    )
    if not spec.path:
        raise ValueError("scdType2Insert needs a target path")
    staging = spec.path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").format(fmt).save(staging)
    if os.path.exists(spec.path):
        shutil.rmtree(spec.path)
    shutil.move(staging, spec.path)


def write_target(spark: SparkSession, df: DataFrame, spec: "TargetSpec") -> dict:
    """Write one target_record_insert entry; returns a reconciliation
    record (V6, ``spark.json:80``) when requested."""
    load = spec.load_type or "simpleInsert"
    mode = spec.save_mode or {"simpleInsert": "append", "truncateInsert": "overwrite"}.get(
        load, "overwrite"
    )
    if mode == "scd2" or load == "scdType2Insert":
        _scd2_write(spark, df, spec)
    elif spec.data_target == "database":
        _write_jdbc(df, spec, mode)
    elif spec.data_target == "sftp":
        raise NotImplementedError(
            "sftp sink requires paramiko (not in this container); "
            "write locally and push out-of-band"
        )
    else:
        _write_file(df, spec, mode)

    result: dict = {"path": spec.path, "loadType": load}
    if spec.reconciliation:
        # V6: source-vs-target count compare; cheap (metadata-only for
        # parquet) and catches partial writes.
        expected = df.count()
        written = (
            spark.read.format(_fmt(spec.file_format)).load(spec.path).count()
            if spec.path
            else expected
        )
        result["reconciliation"] = {
            "expected": expected,
            "written": written,
            "ok": (expected == written) if load != "scdType2Insert" else written >= expected,
        }
    return result


def write_error_records(
    spark: SparkSession, bad: DataFrame, spec: "ErrorSinkSpec", reason: str
) -> int:
    """W11: quarantine the error lane (``spark.json:97-101``), tagged with
    the failing validation."""
    from pyspark.sql import functions as F

    n = bad.count()
    if n == 0:
        return 0
    tagged = bad.withColumn("__error_reason", F.lit(reason))
    if spec.file_target == "database":
        raise NotImplementedError("database error sink needs jdbc config")
    tagged.write.mode("append").format(_fmt(spec.file_format)).save(spec.path)
    return n


def archive_input(path: str, archive_path: str, delete_source: bool) -> None:
    """W12 (``spark.json:10-12``): copy processed input to the archive,
    optionally removing the source. Local-FS implementation; on a cluster
    this is a Hadoop FS rename."""
    os.makedirs(archive_path, exist_ok=True)
    dest = os.path.join(archive_path, os.path.basename(path.rstrip("/")))
    if os.path.isdir(path):
        shutil.copytree(path, dest, dirs_exist_ok=True)
    else:
        shutil.copy2(path, dest)
    if delete_source:
        shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
