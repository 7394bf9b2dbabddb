"""The reference's 4-stage shareprice pipeline, rebuilt on the engine.

Mirrors `example-shareprice.py:148-153` in /root/reference: fetch →
daily-range aggregation → SCD2 history merge, orchestrated from a
deploy.yaml-shaped manifest with retries and always-run cleanup.

    cd /root/repo && python examples/shareprice/run.py
"""

import datetime
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

DEMO = "/tmp/shareprice_demo"


def make_raw_prices(spark):
    """Synthetic tick data with a duplicate and a null PK to exercise the
    validation lanes."""
    ts = datetime.datetime(2024, 1, 1, 10, 0)
    rows = []
    seq = 0
    for inst in ["BHP", "CBA", "CSL"]:
        for minute in range(0, 300, 30):
            seq += 1
            rows.append(
                (inst, ts + datetime.timedelta(minutes=minute), 100.0 + seq % 17, seq)
            )
    rows.append(("BHP", ts, 999.0, 9998))  # duplicate (instrument, trade_ts)
    rows.append((None, ts, 1.0, 9999))  # null PK
    spark.createDataFrame(
        rows, "instrument string, trade_ts timestamp, price double, ingest_seq int"
    ).write.mode("overwrite").parquet(f"{DEMO}/raw_prices.parquet")


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="shareprice-demo")
    make_raw_prices(spark)

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    history = spark.read.parquet(f"{DEMO}/daily_range_history")
    print("\nSCD2 history table:")
    history.orderBy("instrument", "trade_date", "eff_start_ts").show(truncate=False)
    errors = spark.read.parquet(f"{DEMO}/errors")
    print(f"quarantined rows: {errors.count()} (1 dup + 1 null PK expected)")


if __name__ == "__main__":
    main()
