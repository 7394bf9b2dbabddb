"""Golden end-to-end: the reference's 4-job shareprice pipeline shape
(fetch → calculate_daily_range → register → scd2 merge,
``example-shareprice.py:148-153``) rebuilt on synthetic data via the
manifest runner, with SCD2 history invariants checked after a second run."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest


def _manifest(sf_dir: str, out: str, cutoff: str, eff_ts: str) -> dict:
    fetch = {
        "configs": {
            "name": "fetch_prices",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "raw_prices",
                    "path": f"{sf_dir}/lineitem.parquet",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {
                    "functionName": "project price ticks",
                    "sqlQuery": f"""
                        SELECT l_partkey AS instrument, CAST(l_shipdate AS DATE) AS trade_date,
                               l_extendedprice AS price
                        FROM raw_prices WHERE l_shipdate < TIMESTAMP '{cutoff}'
                    """,
                    "outputDFName": "prices",
                }
            ],
        },
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "prices",
                    "loadType": "truncateInsert",
                    "path": f"{out}/prices",
                    "outputDataProperties": {"fileFormat": "parquet", "savemode": "overwrite"},
                }
            ]
        },
    }
    calc = {
        "configs": {
            "name": "calculate_daily_range",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "prices",
                    "path": f"{out}/prices",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {
                    "functionName": "daily range per instrument",
                    "sqlQuery": """
                        SELECT instrument, MIN(price) AS low, MAX(price) AS high
                        FROM prices GROUP BY instrument
                    """,
                    "outputDFName": "daily_ranges",
                }
            ],
        },
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "daily_ranges",
                    "loadType": "truncateInsert",
                    "path": f"{out}/daily_ranges",
                    "outputDataProperties": {"fileFormat": "parquet", "savemode": "overwrite"},
                }
            ]
        },
    }
    register = {
        "configs": {
            "name": "register",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "daily_ranges",
                    "path": f"{out}/daily_ranges",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
            "additional_input_read": [
                {
                    "dataSource": "local",
                    "dataFrameName": "part",
                    "path": f"{sf_dir}/part.parquet",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            ],
        },
        "phase_2": {
            "data_transformation_required": "true",
            "data_transformations": [
                {
                    "functionName": "conform against registered instruments",
                    "sqlQuery": """
                        SELECT d.instrument, p.p_name AS instrument_name, d.low, d.high
                        FROM daily_ranges d JOIN part p ON p.p_partkey = d.instrument
                    """,
                    "outputDFName": "registered_ranges",
                }
            ],
        },
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "registered_ranges",
                    "loadType": "truncateInsert",
                    "path": f"{out}/registered_ranges",
                    "outputDataProperties": {"fileFormat": "parquet", "savemode": "overwrite"},
                }
            ]
        },
    }
    scd2 = {
        "configs": {
            "name": "scd2_daily_ranges",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "registered_ranges",
                    "path": f"{out}/registered_ranges",
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {"data_transformation_required": "false"},
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "registered_ranges",
                    "loadType": "scdType2Insert",
                    "path": f"{out}/price_history",
                    "scd2Keys": ["instrument"],
                    "scd2EffectiveCol": eff_ts,
                    "outputDataProperties": {"fileFormat": "parquet"},
                }
            ]
        },
    }
    return {
        "name": "shareprice",
        "retries": 1,
        "tasks": [
            {"name": "fetch_prices", "config": fetch},
            {"name": "calculate_daily_range", "config": calc, "dependsOn": ["fetch_prices"]},
            {"name": "register", "config": register, "dependsOn": ["calculate_daily_range"]},
            {"name": "scd2_daily_ranges", "config": scd2, "dependsOn": ["register"]},
        ],
    }


@pytest.mark.slow
def test_shareprice_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path)

    # run 1: history up to 1998 becomes the initial SCD2 load
    m1 = _manifest(sf_dir, out, "1998-01-01 00:00:00", "1998-01-01 00:00:00")
    outcomes = from_manifest(spark, m1).run()
    assert all(o.state == "success" for o in outcomes.values()), {
        k: (v.state, v.error) for k, v in outcomes.items()
    }
    hist1 = spark.read.parquet(f"{out}/price_history")
    n1 = hist1.count()
    assert n1 > 0
    assert hist1.filter(~F.col("is_current")).count() == 0  # initial: all current

    # run 2: full history → changed extremes close old versions
    m2 = _manifest(sf_dir, out, "2002-01-01 00:00:00", "2000-06-01 00:00:00")
    outcomes2 = from_manifest(spark, m2).run()
    assert all(o.state == "success" for o in outcomes2.values())
    hist2 = spark.read.parquet(f"{out}/price_history")

    # invariants: exactly one current row per instrument; closed rows end
    # at the merge timestamp; history only grows
    dup_current = (
        hist2.filter(F.col("is_current")).groupBy("instrument").count().filter("count > 1").count()
    )
    assert dup_current == 0
    closed = hist2.filter(~F.col("is_current"))
    assert closed.count() > 0
    assert closed.filter(F.col("eff_end_ts") != F.lit("2000-06-01 00:00:00").cast("timestamp")).count() == 0
    assert hist2.count() >= n1
