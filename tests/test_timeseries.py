"""resample_ffill (operators/timeseries.py): grid extent, forward-fill
semantics, last-in-slot tie-breaks, and leading-slot behavior."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
    resample_ffill,
)


@pytest.fixture
def series(spark):
    rows = [
        # key "a": observations at 00, 03 (gap 01-02), two ties at 03
        ("a", datetime(2024, 1, 1, 0, 15), 10.0, 1),
        ("a", datetime(2024, 1, 1, 3, 5), 30.0, 2),
        ("a", datetime(2024, 1, 1, 3, 5), 31.0, 3),  # same ts, higher id wins
        # key "b": single observation -> single-slot grid
        ("b", datetime(2024, 1, 2, 12, 0), 7.0, 4),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, value double, eid int")


def _rows(df):
    return {(r["k"], r["slot"].hour, r["slot"].day): (r["value_ffill"], r["is_observed"]) for r in df.collect()}


def test_grid_extent_and_ffill(spark, series):
    out = resample_ffill(series, "k", "ts", "value", step="1 hour", tie_cols=["eid"])
    got = _rows(out)
    # a: slots 00..03 on day 1 — 4 rows; b: one slot on day 2
    assert len(got) == 5
    assert got[("a", 0, 1)] == (10.0, True)
    assert got[("a", 1, 1)] == (10.0, False)  # gap filled from 00
    assert got[("a", 2, 1)] == (10.0, False)
    assert got[("a", 3, 1)] == (31.0, True)  # tie broken by eid desc
    assert got[("b", 12, 2)] == (7.0, True)


def test_no_cross_key_leakage(spark, series):
    out = resample_ffill(series, "k", "ts", "value", step="1 hour", tie_cols=["eid"])
    b_rows = out.filter(F.col("k") == "b").collect()
    assert len(b_rows) == 1 and b_rows[0]["value_ffill"] == 7.0


def test_daily_step_and_bad_step(spark, series):
    out = resample_ffill(series, "k", "ts", "value", step="1 day", tie_cols=["eid"])
    a = {r["slot"].day: r["value_ffill"] for r in out.filter(F.col("k") == "a").collect()}
    assert a == {1: 31.0}  # one daily slot, last value of the day
    with pytest.raises(ValueError):
        resample_ffill(series, "k", "ts", "value", step="7 weeks")


def test_interpolation_blends_gaps(spark, series):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
        resample_interpolate,
    )

    out = resample_interpolate(series, "k", "ts", "value", step="1 hour", tie_cols=["eid"])
    got = {
        (r["k"], r["slot"].hour): (r["value_interp"], r["is_observed"])
        for r in out.filter(F.col("k") == "a").collect()
    }
    # a: observed 10.0 at hour 0, 31.0 at hour 3 -> linear blend between
    assert got[("a", 0)] == (10.0, True)
    assert got[("a", 1)] == (17.0, False)   # 10 + (31-10)*1/3
    assert got[("a", 2)] == (24.0, False)   # 10 + (31-10)*2/3
    assert got[("a", 3)] == (31.0, True)


def test_registry_step(spark, series):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        apply_operator,
    )

    out = apply_operator(
        "resampleFfill",
        series,
        {"key_col": "k", "ts_col": "ts", "value_col": "value", "tie_cols": ["eid"]},
    )
    assert out.columns == ["k", "slot", "value_ffill", "is_observed"]
    assert out.count() == 5
