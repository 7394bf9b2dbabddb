"""Round-13 OPTIMIZATION guards.

Pins for this round's operator-internal changes (results must be
bit-identical to the forms they replaced):

1. phash's batched integer-DCT kernel (`_phash64_batch`) must equal the
   per-row `phash64` bit-for-bit on arbitrary rasters.
2. `_materialize_parquet` (graph.py) — the stats-keeping alternative to
   localCheckpoint documented in triangle_count — must round-trip rows
   exactly and come back as a parquet scan (so Catalyst size stats
   exist and downstream joins can still auto-broadcast).
3. `_stream_state_partitions` must pin the conf inside the block and
   restore it afterwards, including on failure.
4. delta-lite CHECK constraints are now enforced INSIDE the staging
   write (an Observation metrics node, not a per-row assert — task
   failures would retry-rewrite violating partitions maxFailures times
   on a real cluster) instead of a post-write re-read job: a violating
   write must still raise the same user-facing ValueError, leave the
   table directory untouched (no stray part files), and fail ZERO Spark
   tasks — behavior pinned here at the _stage_and_adds level
   (test_constraints_clone pins the end-to-end surface).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.phash import (
    PHASH_N,
    _phash64_batch,
    phash64,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.graph import (
    _materialize_parquet,
)


def test_phash_batch_equals_scalar():
    rng = np.random.RandomState(13)
    rasters = rng.randint(0, 256, size=(40, PHASH_N, PHASH_N)).astype(np.int64)
    # include degenerate rasters: constant (median ties) and extremes
    rasters[0][:] = 0
    rasters[1][:] = 255
    hi, lo, ones = _phash64_batch(rasters)
    for i in range(len(rasters)):
        shi, slo, sbits = phash64(rasters[i])
        assert (int(hi[i]), int(lo[i])) == (shi, slo)
        assert int(ones[i]) == sbits.count("1")


def test_materialize_parquet_roundtrip_keeps_rows_and_stats(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    out = _materialize_parquet(df, prefix="t13_mat_")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    # parquet scan => Catalyst has a real sizeInBytes (not the huge
    # RDD-scan default), so a small materialized side still broadcasts
    stats = out._jdf.queryExecution().optimizedPlan().stats()
    assert int(stats.sizeInBytes()) < 10 * 1024 * 1024


def test_stream_state_partitions_restores_conf(spark):
    import __spark_entry__ as entry

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with entry._stream_state_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with pytest.raises(RuntimeError):
        with entry._stream_state_partitions(spark, 4):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_package_has_no_cachemanager_sharing():
    """Round 13 closes the round-12 persist purge: NOTHING in the
    package registers CacheManager state (``.cache()`` / ``.persist(``)
    — the last holdout was the engine's validation split. A cached
    deterministic subtree is silently substituted into any identical
    later plan, which is cross-invocation result reuse; sharing must go
    through localCheckpoint."""
    import building_and_operating_data_pipelines_at_scale_using_ci_cd_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path, encoding="utf-8").read()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".cache()" in code or ".persist(" in code:
                offenders.append(f"{path}:{i}")
    assert not offenders, offenders


def test_rule_fold_refuses_stage_clean_no_failed_tasks(spark, tmp_path):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
        delta_lite as dl,
    )

    tp = str(tmp_path / "t")
    dl.write_delta_lite(
        spark.range(5).select("id", (F.col("id") % 3).alias("v")), tp
    )
    dl.add_check_constraint(spark, tp, "v_ok", "v >= 0")
    bad = spark.createDataFrame([(9, -1)], "id bigint, v bigint")
    import bench

    failed_before = bench._failed_tasks(spark.sparkContext)
    with pytest.raises(ValueError, match="violates v_ok CHECK"):
        dl.write_delta_lite(bad, tp, mode="append")
    failed_after = bench._failed_tasks(spark.sparkContext)
    # the violation must be detected by the observe metrics, not by
    # failing tasks (a task failure would retry-rewrite the partition
    # spark.task.maxFailures times on a real cluster)
    assert failed_after == failed_before
    # the violation aborted inside the hidden stage dir: the table holds
    # exactly the referenced file set and no stage leftovers
    snap = dl.load_snapshot(tp)
    assert snap.version == 1
    on_disk = {
        os.path.relpath(p, tp).replace(os.sep, "/")
        for p in glob.glob(os.path.join(tp, "**", "*.parquet"), recursive=True)
        if dl.LOG_DIR not in p
    }
    assert on_disk == set(snap.files)
    assert not glob.glob(os.path.join(tp, ".delta_stage_*"))
