"""End-to-end: the streaming-events example run from its real JSON config
via the manifest runner — file-stream source, config-declared watermark +
dedup + session windows, checkpointed foreachBatch sink, incremental
re-runs processing only unseen files."""

import glob
import json
import os
import shutil

EXAMPLE_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "streaming_events")


def _manifest(out: str) -> dict:
    with open(os.path.join(EXAMPLE_DIR, "sessions.json")) as f:
        cfg = json.loads(f.read().replace("/tmp/streaming_events_demo", out))
    return {
        "name": "streaming_events",
        "concurrency": 1,
        "retries": 1,
        "tasks": [{"name": "sessions", "config": cfg}],
    }


def test_streaming_pipeline_incremental(spark, sf_dir, tmp_path):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import from_manifest

    out = str(tmp_path / "stream")
    incoming = f"{out}/incoming"
    os.makedirs(incoming)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cutoff = events.selectExpr("percentile_approx(ts, 0.5) AS c").first()["c"]

    def land(df, tag):
        staged = f"{out}/_{tag}"
        df.coalesce(1).write.json(staged)
        for i, f in enumerate(glob.glob(f"{staged}/part-*")):
            shutil.copy(f, f"{incoming}/{tag}_{i}.json")

    def run():
        outcomes = from_manifest(spark, _manifest(out)).run()
        assert all(o.state == "success" for o in outcomes.values())
        if glob.glob(f"{out}/sessions/*.parquet"):
            return spark.read.parquet(f"{out}/sessions").count()
        return 0

    land(events.filter(events.ts <= cutoff), "batch1")
    n1 = run()
    assert n1 > 0  # watermark passed → closed sessions landed

    land(events.filter(events.ts > cutoff), "batch2")
    n2 = run()
    assert n2 > n1  # only the new files were processed, state carried over

    n3 = run()
    assert n3 == n2  # nothing new → exactly-once, zero rows appended

    # landed sessions are well-formed and keyed
    sess = spark.read.parquet(f"{out}/sessions")
    row = sess.first()
    assert {"session_start", "session_end", "user_id", "n_events"} <= set(sess.columns)
    assert row["n_events"] >= 1
