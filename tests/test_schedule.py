"""O4 executed: cron evaluation + the tick scheduler (plans/schedule.py).

All clock-free — `tick(now)` takes explicit times, so schedule semantics
(the POSIX dom/dow OR rule, startdate gating, pause, catchup collapse,
DST edges, restart dedup) are unit-tested without sleeping.
"""

import json
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.schedule import (
    ScheduleSpec,
    Scheduler,
    cron_matches,
    next_fire,
    parse_cron,
)


def dt(*a, tz=None):
    return datetime(*a, tzinfo=tz)


def test_parse_fields():
    c = parse_cron("*/15 9-17 1,15 */3 1-5")
    assert c["minute"] == frozenset({0, 15, 30, 45})
    assert c["hour"] == frozenset(range(9, 18))
    assert c["dom"] == frozenset({1, 15})
    assert c["month"] == frozenset({1, 4, 7, 10})
    assert c["dow"] == frozenset({1, 2, 3, 4, 5})


def test_parse_rejects_garbage():
    for bad in ("* * * *", "61 * * * *", "* 25 * * *", "* * 0 * *",
                "*/0 * * * *", "* * * * 8-9"):
        with pytest.raises(ValueError):
            parse_cron(bad)


def test_dow_seven_is_sunday():
    c = parse_cron("0 0 * * 7")
    assert cron_matches(c, dt(2024, 1, 7, 0, 0))   # a Sunday
    assert not cron_matches(c, dt(2024, 1, 8, 0, 0))


def test_reference_cron_weekdays_at_noon():
    """deploy.yaml:13 — '0 12 * * 1-5' from a Saturday fires Monday."""
    got = next_fire("0 12 * * 1-5", dt(2024, 1, 6, 8, 0))  # Sat
    assert got == dt(2024, 1, 8, 12, 0)  # Monday
    # from Monday 12:00 EXACTLY, strictly-after gives Tuesday
    assert next_fire("0 12 * * 1-5", dt(2024, 1, 8, 12, 0)) == dt(2024, 1, 9, 12, 0)


def test_posix_dom_dow_or_rule():
    """Both dom and dow restricted: a day matching EITHER fires."""
    c = parse_cron("0 0 13 * 5")  # the 13th OR any Friday
    assert cron_matches(c, dt(2024, 9, 13, 0, 0))  # Friday the 13th
    assert cron_matches(c, dt(2024, 9, 6, 0, 0))   # a Friday, not the 13th
    assert cron_matches(c, dt(2024, 8, 13, 0, 0))  # the 13th, a Tuesday
    assert not cron_matches(c, dt(2024, 9, 7, 0, 0))  # Saturday the 7th


def test_sparse_cron_resolves_fast():
    # Feb 29 only — the day-skip walk must cross years without 2M iterations
    got = next_fire("30 6 29 2 *", dt(2025, 3, 1, 0, 0))
    assert got == dt(2028, 2, 29, 6, 30)


def test_never_firing_cron_raises():
    with pytest.raises(ValueError, match="never fires"):
        next_fire("0 0 31 2 *", dt(2024, 1, 1))  # Feb 31


def test_dst_spring_forward_fires_once_after_gap():
    ny = ZoneInfo("America/New_York")
    got = next_fire("30 2 * * *", dt(2026, 3, 8, 0, 0, tz=ny))  # gap day
    assert (got.hour, got.minute) == (2, 30)
    # the fold-0 reading of the skipped wall time = the first real
    # instant after the gap (03:30 EDT == 07:30 UTC)
    assert got.astimezone(timezone.utc) == dt(2026, 3, 8, 7, 30, tz=timezone.utc)
    # and the day's schedule advances normally afterwards
    nxt = next_fire("30 2 * * *", got)
    assert nxt.day == 9


def test_dst_fall_back_fires_once():
    ny = ZoneInfo("America/New_York")
    first = next_fire("30 1 * * *", dt(2026, 11, 1, 0, 0, tz=ny))  # repeat day
    nxt = next_fire("30 1 * * *", first)
    assert first.day == 1 and nxt.day == 2  # 01:30 fires once, not twice


def _spec(**kw):
    base = dict(cron="0 12 * * *", timezone="UTC")
    base.update(kw)
    return ScheduleSpec(**base)


def test_due_fires_catchup_collapse():
    spec = _spec()
    utc = timezone.utc
    last = dt(2024, 1, 1, 12, 0, tz=utc)
    now = dt(2024, 1, 10, 13, 0, tz=utc)
    assert spec.due_fires(last, now) == [dt(2024, 1, 10, 12, 0, tz=utc)]
    spec_catchup = _spec(catchup=True)
    fires = spec_catchup.due_fires(last, now)
    assert len(fires) == 9 and fires[0] == dt(2024, 1, 2, 12, 0, tz=utc)


def test_due_fires_startdate_and_pause():
    utc = timezone.utc
    spec = _spec(startdate=dt(2024, 6, 1, 12, 0, tz=utc), catchup=True)
    fires = spec.due_fires(None, dt(2024, 6, 3, 13, 0, tz=utc))
    assert fires[0] == dt(2024, 6, 1, 12, 0, tz=utc) and len(fires) == 3
    assert _spec(state="pause").due_fires(None, dt(2024, 6, 3, tz=utc)) == []


def test_from_manifest_shape():
    spec = ScheduleSpec.from_manifest(
        {
            "schedule": {
                "state": "unpause",
                "concurrency": 4,
                "startdate": "2020-01-01 00:00",
                "cron": "0 12 * * 1-5",
            }
        }
    )
    assert spec.cron == "0 12 * * 1-5" and not spec.paused
    assert spec.startdate == dt(2020, 1, 1, 0, 0, tz=ZoneInfo("UTC"))
    assert ScheduleSpec.from_manifest({"tasks": []}) is None


def test_scheduler_tick_and_restart_dedup(tmp_path):
    utc = timezone.utc
    state = str(tmp_path / "sched_state.json")
    ran = []
    spec = _spec(startdate=dt(2024, 1, 1, 0, 0, tz=utc), catchup=True)
    s = Scheduler(spec, ran.append, state_path=state)
    assert s.tick(dt(2024, 1, 2, 12, 30, tz=utc)) == [
        dt(2024, 1, 1, 12, 0, tz=utc),
        dt(2024, 1, 2, 12, 0, tz=utc),
    ]
    assert s.tick(dt(2024, 1, 2, 12, 45, tz=utc)) == []  # nothing new
    # restart: a NEW scheduler over the same state file must not re-fire
    s2 = Scheduler(spec, ran.append, state_path=state)
    assert s2.tick(dt(2024, 1, 2, 13, 0, tz=utc)) == []
    assert s2.tick(dt(2024, 1, 3, 12, 0, tz=utc)) == [dt(2024, 1, 3, 12, 0, tz=utc)]
    assert len(ran) == 3
    assert json.load(open(state))["last_fire"].startswith("2024-01-03T12:00")


def test_scheduler_runs_pipeline_manifest(spark, tmp_path):
    """E2E: a manifest with a schedule block ticks a real pipeline run."""
    import json as _json
    import os

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
        from_manifest,
    )

    out = str(tmp_path / "out")
    cfg = {
        "configs": {"name": "j", "phase_1": {"input_data": {
            "dataSource": "local", "dataFrameName": "nation",
            "path": "/root/testdata/sf0.001/nation.parquet",
            "fileProperties": {"fileFormat": "parquet"}}}},
        "phase_2": {"data_transformations": [{
            "functionName": "t", "sqlQuery": "SELECT COUNT(*) AS n FROM nation",
            "outputDFName": "t"}]},
        "phase_3": {"target_record_insert": [{
            "dataTarget": "local", "dataFrameName": "t",
            "loadType": "truncateInsert", "path": out,
            "outputDataProperties": {"fileFormat": "parquet"}}]},
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as fh:
        _json.dump(cfg, fh)
    manifest = {
        "name": "demo",
        "schedule": {"cron": "0 12 * * *", "startdate": "2024-01-01 00:00"},
        "tasks": [{"name": "job", "config": cfg_path}],
    }
    spec = ScheduleSpec.from_manifest(manifest)
    runs = []

    def run_pipeline(fire):
        outcomes = from_manifest(spark, manifest).run()
        assert all(o.state == "success" for o in outcomes.values())
        runs.append(fire)

    s = Scheduler(spec, run_pipeline)
    fired = s.tick(datetime(2024, 1, 5, 12, 30, tzinfo=ZoneInfo("UTC")))
    assert len(fired) == 1 and runs == fired  # catchup=False: one run
    assert os.path.isdir(out)
