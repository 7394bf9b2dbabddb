"""V6: source-vs-target reconciliation (``spark.json:80`` "reconciliation").

Two levels, picked per target via ``reconciliationMode``:

  - ``count`` (default): row-count compare. For ``append`` loads onto a
    non-empty target the check compares the COUNT DELTA (target counted
    before and after the write), so pre-existing rows don't fail a
    perfectly good append.
  - ``hash``: value-level compare — row count plus an order-independent
    content checksum (sum of per-row xxhash64 over all columns, NULL-safe).
    Catches silent row corruption/truncation that a bare count can't.
    Valid for lossless formats (parquet/orc); csv/json round-trips can
    legitimately change float text forms, so stick to ``count`` there.

Both checks are one aggregate over each side — a single map-side-combined
pass, no shuffle beyond the final 1-row reduce, so they cost a scan (and
for parquet counts, metadata only) at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_checksum(df: DataFrame) -> tuple[int, int]:
    """(row_count, order-independent content checksum) in one pass.

    Per-row xxhash64 over every column (cast to string with a NULL
    sentinel, so NULL != 'NULL'), summed as decimal(38,0) to avoid bigint
    overflow on huge tables. Column order is fixed by sorting names so the
    checksum is stable across projections that reorder columns."""
    cols = sorted(df.columns)
    row_hash = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(row_hash.cast("decimal(38,0)")), F.lit(0)).alias("checksum"),
    ).collect()[0]
    return int(row["n"]), int(row["checksum"])


def reconcile_counts(expected: int, written: int, pre_existing: int = 0) -> dict:
    """Count-level check; ``pre_existing`` is the target's row count before
    an append load (0 for overwrite/new targets)."""
    delta = written - pre_existing
    return {
        "mode": "count",
        "expected": expected,
        "written": delta,
        "pre_existing": pre_existing,
        "ok": expected == delta,
    }


def reconcile_hash(source: DataFrame, written: DataFrame) -> dict:
    """Value-level check: counts and content checksums must both match.
    Compares the exact rows the job produced against what the sink reads
    back — any dropped, duplicated, or altered row flips the checksum."""
    n_src, sum_src = content_checksum(source)
    n_out, sum_out = content_checksum(written)
    return {
        "mode": "hash",
        "expected": n_src,
        "written": n_out,
        "source_checksum": sum_src,
        "target_checksum": sum_out,
        "ok": n_src == n_out and sum_src == sum_out,
    }
