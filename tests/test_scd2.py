"""W5 SCD2 property tests (SURVEY.md §5.4): new key / changed / unchanged,
idempotent re-run, ≤1 current row per key, non-overlapping intervals."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scd2 import (
    EFF_END,
    EFF_START,
    IS_CURRENT,
    scd2_initial,
    scd2_merge,
)

T0, T1, T2 = "2020-01-01 00:00:00", "2020-02-01 00:00:00", "2020-03-01 00:00:00"


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "attr", "val"]
    )


def test_initial_load_all_current(spark, base):
    t = scd2_initial(base, T0)
    rows = t.collect()
    assert all(r[IS_CURRENT] for r in rows)
    assert len(rows) == 3


def test_merge_new_changed_unchanged(spark, base):
    target = scd2_initial(base, T0)
    incoming = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged
         (2, "b", 25.0),      # changed
         (4, "d", 40.0)],     # new key
        ["id", "attr", "val"],
    )
    merged = scd2_merge(target, incoming, keys=["id"], effective_ts=T1).cache()

    current = {r["id"]: r for r in merged.filter(F.col(IS_CURRENT)).collect()}
    history = {r["id"]: r for r in merged.filter(~F.col(IS_CURRENT)).collect()}

    # key 3 absent from incoming → carried untouched
    assert current[3]["val"] == 30.0
    # unchanged key 1: still one current row, original start
    assert current[1]["val"] == 10.0 and str(current[1][EFF_START]).startswith("2020-01-01")
    # changed key 2: old closed at T1, new current with new value
    assert current[2]["val"] == 25.0 and str(current[2][EFF_START]).startswith("2020-02-01")
    assert history[2]["val"] == 20.0 and str(history[2][EFF_END]).startswith("2020-02-01")
    # new key 4 inserted current
    assert current[4]["val"] == 40.0
    assert merged.count() == 5  # 4 current + 1 closed


def test_merge_idempotent_rerun(spark, base):
    target = scd2_initial(base, T0)
    incoming = spark.createDataFrame([(2, "b", 25.0)], ["id", "attr", "val"])
    once = scd2_merge(target, incoming, keys=["id"], effective_ts=T1)
    twice = scd2_merge(once, incoming, keys=["id"], effective_ts=T2)
    assert twice.count() == once.count()
    # exactly one current row per key, always
    per_key = (
        twice.filter(F.col(IS_CURRENT)).groupBy("id").count().filter("count > 1").count()
    )
    assert per_key == 0


def test_intervals_non_overlapping(spark, base):
    target = scd2_initial(base, T0)
    inc1 = spark.createDataFrame([(1, "a", 11.0)], ["id", "attr", "val"])
    inc2 = spark.createDataFrame([(1, "a", 12.0)], ["id", "attr", "val"])
    t = scd2_merge(scd2_merge(target, inc1, ["id"], effective_ts=T1), inc2, ["id"], effective_ts=T2)
    rows = sorted(t.filter(F.col("id") == 1).collect(), key=lambda r: r[EFF_START])
    assert len(rows) == 3
    for a, b in zip(rows, rows[1:]):
        assert a[EFF_END] == b[EFF_START]  # contiguous, non-overlapping
    assert rows[-1][IS_CURRENT] and not rows[0][IS_CURRENT]


def test_null_safe_change_detection(spark):
    target = scd2_initial(
        spark.createDataFrame([(1, None, 1.0)], "id int, attr string, val double"), T0
    )
    same = spark.createDataFrame([(1, None, 1.0)], "id int, attr string, val double")
    merged = scd2_merge(target, same, keys=["id"], effective_ts=T1)
    assert merged.count() == 1  # NULL == NULL for change detection
