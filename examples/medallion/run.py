"""Medallion architecture on delta-lite (round 10): the canonical
lakehouse layering — now expressible END TO END because the repo has
both halves of the streaming contract:

  landing files ──readStream──▶ BRONZE delta table
      (streaming_delta_sink: foreachBatch + txn exactly-once)
  BRONZE ──delta_lite_stream──▶ filter/derive ──▶ SILVER delta table
      (the round-10 Python Data Source tails bronze's transaction log)
  SILVER ──batch──▶ GOLD aggregate (plain config job over the snapshot)

Run 1 lands a first batch of events and pushes it through all three
layers; run 2 drops NEW files in the landing zone and re-runs the same
pipelines — each hop must deliver exactly the increment (no re-reads,
no duplicates), which is asserted against closed-form counts.

    cd /root/repo && python examples/medallion/run.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_lite import (
    history_delta_lite,
    read_delta_lite,
    streaming_delta_sink,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources.delta_stream import (
    read_delta_lite_stream,
)

DEMO = "/tmp/medallion_demo"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

LANDING = f"{DEMO}/landing"
BRONZE = f"{DEMO}/bronze_events"
SILVER = f"{DEMO}/silver_events"
GOLD = f"{DEMO}/gold_hourly"
EVENT_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double"


def land(spark, lo: int, hi: int) -> None:
    """Drop one batch of raw event files into the landing zone."""
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(f"event_id >= {lo} AND event_id < {hi}")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .coalesce(1)
        .write.mode("append")
        .parquet(LANDING)
    )


def bronze_hop(spark) -> None:
    """Landing files -> bronze delta, exactly-once via the txn action."""
    q = streaming_delta_sink(
        spark.readStream.schema(EVENT_SCHEMA).parquet(LANDING),
        BRONZE,
        app_id="bronze-events",
        checkpoint_location=f"{DEMO}/cp_bronze",
    )
    q.processAllAvailable()
    q.stop()


def silver_hop(spark) -> None:
    """Bronze's transaction log -> cleaned/derived silver delta. The
    stream tails bronze by log version, so a re-run only sees bronze's
    NEW commits; the silver writes are themselves txn-idempotent."""
    stream = read_delta_lite_stream(spark, BRONZE)
    cleaned = (
        stream.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .withColumn("event_hour", F.date_trunc("hour", F.col("ts")))
        .withColumn("value_cents", F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .drop("value")
    )
    q = streaming_delta_sink(
        cleaned,
        SILVER,
        app_id="silver-events",
        checkpoint_location=f"{DEMO}/cp_silver",
    )
    q.processAllAvailable()
    q.stop()


def gold_job(spark) -> None:
    """Silver snapshot -> gold hourly aggregate (full recompute — the
    gold table is small; an incremental variant would stream silver the
    same way silver streams bronze)."""
    (
        read_delta_lite(spark, SILVER)
        .groupBy("event_hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("sum_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .write.mode("overwrite")
        .parquet(GOLD)
    )


def counts(spark) -> tuple:
    b = read_delta_lite(spark, BRONZE).count()
    s = read_delta_lite(spark, SILVER).count()
    g = spark.read.parquet(GOLD).count()
    return b, s, g


def main() -> None:
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="medallion-demo")
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    cut = 600

    # ---- run 1: first landing batch through all three layers
    land(spark, 0, cut)
    n1 = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(f"event_id < {cut}")
        .count()
    )
    bronze_hop(spark)
    silver_hop(spark)
    gold_job(spark)
    b, s, g = counts(spark)
    assert b == n1, (b, n1)
    assert s <= b  # null-cleaning only removes
    print(f"run 1: landed {n1} events -> bronze {b}, silver {s}, gold {g} groups")

    # ---- run 2: NEW files land; every hop moves exactly the increment
    land(spark, cut, 10**9)
    bronze_hop(spark)
    silver_hop(spark)
    gold_job(spark)
    b2, s2, g2 = counts(spark)
    assert b2 == total, (b2, total)
    # silver grew by exactly bronze's increment minus cleaned nulls —
    # recompute the expectation directly from bronze's latest commit
    silver_expected = (
        read_delta_lite(spark, BRONZE)
        .filter("event_type IS NOT NULL AND ts IS NOT NULL")
        .count()
    )
    assert s2 == silver_expected, (s2, silver_expected)
    # each hop committed exactly one new data version in run 2
    b_ops = [h["operation"] for h in history_delta_lite(BRONZE)]
    s_ops = [h["operation"] for h in history_delta_lite(SILVER)]
    assert b_ops.count("WRITE") == 2 and s_ops.count("WRITE") == 2, (b_ops, s_ops)
    print(f"run 2: +{total - n1} landed -> bronze {b2} (+{b2 - b}), "
          f"silver {s2} (+{s2 - s}), gold {g2} groups; "
          f"one new WRITE per layer (exactly-once)")

    # ---- replay robustness: re-running with nothing new moves nothing
    bronze_hop(spark)
    silver_hop(spark)
    b3, s3, _ = counts(spark)
    assert (b3, s3) == (b2, s2)
    assert [h["operation"] for h in history_delta_lite(BRONZE)].count("WRITE") == 2
    print("run 3 (no new data): zero new commits, zero new rows — idempotent")
    print("medallion example OK")


if __name__ == "__main__":
    main()
