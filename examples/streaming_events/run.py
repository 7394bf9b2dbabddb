"""The streaming face of the config dialect, end-to-end: an events
directory watched as a file stream, deduplicated and sessionized with
watermarks, landed incrementally through the checkpointed foreachBatch
sink — all declared in JSON (see sessions.json), no hand-written driver
code.

What this demonstrates (the reference's cron-batch posture, spark.json:
8-12, upgraded to exactly-once incremental processing):

  1. drop a first batch of event files → run the manifest → only those
     files are read; closed sessions (watermark passed) land in parquet;
  2. drop a second batch → SAME manifest run → the checkpoint makes the
     stream process only the unseen files and the state store carries
     dedup + open-session state across runs;
  3. run a third time with nothing new → zero new rows (exactly-once).

    cd /root/repo && python examples/streaming_events/run.py

At scale the same config runs continuously (drop the availableNow
trigger) — watermarks bound the dedup and session state, so state size
tracks the active-user window, not stream history.
"""

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

DEMO = "/tmp/streaming_events_demo"
INCOMING = f"{DEMO}/incoming"
SESSIONS = f"{DEMO}/sessions"


def run_manifest(spark):
    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    assert all(o.state == "success" for o in outcomes.values()), outcomes
    files = glob.glob(f"{SESSIONS}/*.parquet")
    return spark.read.parquet(SESSIONS).count() if files else 0


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    os.makedirs(INCOMING)
    spark = get_session(app_name="streaming-events-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cutoff = events.selectExpr("percentile_approx(ts, 0.5) AS c").first()["c"]

    # batch 1: first half of the stream arrives
    events.filter(events.ts <= cutoff).coalesce(2).write.json(f"{DEMO}/b1")
    for i, f in enumerate(glob.glob(f"{DEMO}/b1/part-*")):
        shutil.copy(f, f"{INCOMING}/batch1_{i}.json")
    n1 = run_manifest(spark)
    print(f"after batch 1: {n1} closed sessions landed")
    assert n1 > 0, "first batch should close at least one session"

    # batch 2: the rest arrives; checkpoint processes ONLY the new files
    events.filter(events.ts > cutoff).coalesce(2).write.json(f"{DEMO}/b2")
    for i, f in enumerate(glob.glob(f"{DEMO}/b2/part-*")):
        shutil.copy(f, f"{INCOMING}/batch2_{i}.json")
    n2 = run_manifest(spark)
    print(f"after batch 2: {n2} sessions (+{n2 - n1})")
    assert n2 > n1, "second batch should close more sessions"

    # run 3: nothing new — exactly-once means zero new rows
    n3 = run_manifest(spark)
    print(f"after empty re-run: {n3} sessions (+{n3 - n2})")
    assert n3 == n2, "re-run without new files must process nothing"

    # sanity: no event counted twice across sessions of one user
    total_events = spark.read.parquet(SESSIONS).groupBy().sum("n_events").first()[0]
    print(f"events covered by landed sessions: {total_events}")


if __name__ == "__main__":
    main()
