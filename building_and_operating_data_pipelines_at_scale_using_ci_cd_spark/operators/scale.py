"""Scale disciplines: skew salting and bucketed co-located joins.

AQE's skew-join splitting (on by default, ``session.py``) handles most
skew at runtime by splitting oversized partitions. These helpers cover
the two cases AQE can't:

  - **salting** — when one join key is so hot that even a split partition
    is a straggler, explode the small side over a salt domain so the hot
    key's rows spread across ``salt`` reducers. Worth its constant-factor
    cost only for genuinely pathological keys; measure first
    (:func:`skewed_keys`).
  - **bucketing** — when the same large⋈large join runs repeatedly,
    pre-bucket both tables on the join key: every subsequent join is
    shuffle-free (bucket-local sort-merge), amortizing one write-time
    shuffle across all future reads. This is Spark's answer to
    co-located/partitioned joins in MPP warehouses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewed_keys(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Heavy-hitter diagnostic: per-key row counts, heaviest first. Run
    this (sampled, if need be) before reaching for :func:`salted_join`."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc())
        .limit(top_n)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys would straggle: the skewed
    side gets a deterministic row salt in ``[0, salt)``; ``other`` is
    exploded ``salt``× so every (key, salt) bucket finds its match. The
    shuffle key becomes (keys…, salt) — a hot key now spreads over
    ``salt`` reducers instead of one.

    Correctness is salt-agnostic (every other-side row exists in every
    salt bucket), so results equal the plain join for ``inner`` and
    ``left``. The ``salt``× duplication of ``other`` is the price — use
    only when ``other`` is much smaller than the skew cost, yet too big
    to broadcast outright.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (other sides don't skew here)")
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_l.join(salted_r, keys + ["__salt"], how)
    return out.drop("__salt")


def compact_files(
    spark, path: str, fmt: str = "parquet", target_mb: int = 128, sort_by: list[str] | None = None
) -> int:
    """Small-files compaction: rewrite a table directory into files of
    roughly ``target_mb`` each (sized from the current on-disk bytes),
    optionally range-sorted on ``sort_by`` so parquet min/max row-group
    stats become selective (data skipping for later scans). Returns the
    compacted table's scan partition count (≈ file count).

    The standard maintenance pass for streaming/append sinks whose
    micro-batches leave thousands of tiny files — at scale, file-listing
    and per-file open costs dominate reads long before data size does.
    Writes through a staging dir + the same crash-safe rename swap the
    SCD2 sink uses."""
    from ..sinks.writers import _swap_dirs

    # size through Hadoop FS, not os.walk: on s3a://hdfs:// paths a local
    # walk sees nothing, n_files collapses to 1, and the whole table gets
    # funneled through a single output partition — the exact object-store
    # targets compaction exists for
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, round(size_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    if sort_by:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_by]).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_files)
    staging = path.rstrip("/") + "__compact"
    out.write.mode("overwrite").format(fmt).save(staging)
    _swap_dirs(spark, staging, path)
    written = spark.read.format(fmt).load(path)
    return written.rdd.getNumPartitions()


def bucketed_write(
    df: DataFrame, table: str, keys: list[str], num_buckets: int = 32, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table in the
    session catalog. Two tables bucketed identically on their join key
    join with NO shuffle and (if sorted) NO sort — see
    ``tests/test_scale_ops.py`` asserting the Exchange-free plan."""
    writer = df.write.bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode("overwrite").format("parquet").saveAsTable(table)
