"""O4 executed: the deploy manifest's schedule block as a real scheduler.

The reference records ``schedule: {state, concurrency, startdate, cron}``
in its deploy manifest (reference ``deploy.yaml:9-13``; Airflow runs it).
Rounds 1-7 parsed the block as data; this module EVALUATES it — a
dependency-free 5-field cron engine plus a tick loop with an injectable
clock, so schedule semantics are unit-testable without sleeping:

  - :func:`parse_cron` — minute hour day-of-month month day-of-week;
    ``*``, lists, ranges, ``*/step`` and ``a-b/step``; dow 0-7 with both
    0 and 7 meaning Sunday. Standard-cron OR rule: when BOTH
    day-of-month and day-of-week are restricted, a day matching EITHER
    fires (the POSIX crontab quirk everyone forgets).
  - :func:`next_fire` — the first matching minute strictly after a
    given time, skipping day-at-a-time then hour-at-a-time so sparse
    crons (Feb-29-only) resolve in microseconds, with a 5-year horizon
    error instead of an infinite loop for never-matching specs.
  - :class:`Scheduler` — ``tick(now)`` runs the manifest's pipeline for
    fire times due since the last run: paused state runs nothing,
    ``startdate`` gates the first fire, and missed windows collapse to
    ONE catch-up run by default (Airflow's catchup=False), because
    re-running a daily batch 90 times after a long outage is almost
    never what anyone wants. Last-run state optionally persists to a
    JSON sidecar so restarts don't re-fire.

Timezone: fire times are computed in the schedule's IANA timezone
(``timezone`` key, default UTC) with ``zoneinfo``. The evaluator works
on the naive wall clock and re-attaches the zone (PEP 495 fold-0), so a
slot that spring-forward skips (02:30 on a gap day) fires at the first
real instant after the gap (its pre-transition-offset reading), and a
fall-back-repeated slot fires once — both pinned by test.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

__all__ = ["parse_cron", "cron_matches", "next_fire", "ScheduleSpec", "Scheduler"]

_FIELDS = [
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),
]


def _parse_field(spec: str, lo: int, hi: int, name: str) -> frozenset:
    out: set = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                raise ValueError(f"bad cron step in {name}: {step_s!r}")
            step = int(step_s)
        if part == "*" or part == "":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        if name == "dow":  # 7 is Sunday too
            a, b = (0 if a == 7 else a), (0 if b == 7 else b)
            if a == 0 and b == 0 and part not in ("*", ""):
                out.add(0)
                continue
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise ValueError(f"cron {name} value out of range: {part!r}")
        out.update(range(a, b + 1, step))
    return frozenset(out)


def parse_cron(expr: str) -> dict:
    """5-field cron → {field: frozenset of allowed values} plus the
    restricted-ness markers the dom/dow OR rule needs."""
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron needs 5 fields, got {len(parts)}: {expr!r}")
    parsed = {}
    for raw, (name, lo, hi) in zip(parts, _FIELDS):
        parsed[name] = _parse_field(raw, lo, hi, name)
    parsed["dom_star"] = parts[2] == "*"
    parsed["dow_star"] = parts[4] == "*"
    return parsed


def _day_matches(c: dict, dt: datetime) -> bool:
    month_ok = dt.month in c["month"]
    dom_ok = dt.day in c["dom"]
    # cron dow: 0=Sunday; python weekday(): 0=Monday
    dow_ok = ((dt.weekday() + 1) % 7) in c["dow"]
    if not month_ok:
        return False
    if c["dom_star"] and c["dow_star"]:
        return True
    if c["dom_star"]:
        return dow_ok
    if c["dow_star"]:
        return dom_ok
    return dom_ok or dow_ok  # the POSIX OR rule


def cron_matches(c: dict, dt: datetime) -> bool:
    return (
        dt.minute in c["minute"]
        and dt.hour in c["hour"]
        and _day_matches(c, dt)
    )


def next_fire(cron: dict | str, after: datetime) -> datetime:
    """First wall-clock minute STRICTLY after ``after`` matching the
    cron, in ``after``'s timezone (naive datetimes stay naive)."""
    c = parse_cron(cron) if isinstance(cron, str) else cron
    tz = after.tzinfo
    # work on a naive wall clock; re-attach tz at the end so DST-skipped
    # local times naturally never match (they never appear on the wall)
    cur = after.replace(tzinfo=None, second=0, microsecond=0) + timedelta(minutes=1)
    horizon = cur + timedelta(days=366 * 5)
    while cur < horizon:
        if not _day_matches(c, cur):
            cur = (cur + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if cur.hour not in c["hour"]:
            nxt = [h for h in sorted(c["hour"]) if h > cur.hour]
            if nxt:
                cur = cur.replace(hour=nxt[0], minute=0)
            else:
                cur = (cur + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if cur.minute not in c["minute"]:
            nxt = [m for m in sorted(c["minute"]) if m > cur.minute]
            if nxt:
                cur = cur.replace(minute=nxt[0])
            else:
                cur = (cur.replace(minute=0) + timedelta(hours=1))
            continue
        return cur.replace(tzinfo=tz) if tz else cur
    raise ValueError("cron never fires within 5 years — check the expression")


@dataclass
class ScheduleSpec:
    """The manifest's schedule block (reference ``deploy.yaml:9-13``)."""

    cron: str
    state: str = "unpause"
    startdate: datetime | None = None
    timezone: str = "UTC"
    catchup: bool = False
    concurrency: int = 4

    @classmethod
    def from_manifest(cls, manifest: dict) -> "ScheduleSpec | None":
        s = manifest.get("schedule")
        if not s or not s.get("cron"):
            return None
        start = s.get("startdate")
        tz = str(s.get("timezone", "UTC"))
        if isinstance(start, str):
            start = datetime.strptime(start, "%Y-%m-%d %H:%M").replace(
                tzinfo=ZoneInfo(tz)
            )
        return cls(
            cron=str(s["cron"]),
            state=str(s.get("state", "unpause")).lower(),
            startdate=start,
            timezone=tz,
            catchup=bool(s.get("catchup", False)),
            concurrency=int(s.get("concurrency", 4)),
        )

    @property
    def paused(self) -> bool:
        return self.state in ("pause", "paused")

    def due_fires(self, last_fire: datetime | None, now: datetime) -> list:
        """Fire times in (max(last_fire, startdate-ε), now], oldest
        first. With ``catchup=False`` (default) a backlog collapses to
        the single most-recent fire."""
        if self.paused:
            return []
        cron = parse_cron(self.cron)
        after = last_fire
        if self.startdate is not None:
            floor = self.startdate - timedelta(minutes=1)
            after = floor if after is None else max(after, floor)
        if after is None:
            # no startdate, never fired: only the most recent slot counts
            after = now - timedelta(days=366)
        fires = []
        cur = after
        while True:
            cur = next_fire(cron, cur)
            if cur > now:
                break
            fires.append(cur)
        if not self.catchup and len(fires) > 1:
            return fires[-1:]
        return fires


class Scheduler:
    """Tick-driven runner: call :meth:`tick` with the current time (a
    real clock in production, an explicit value in tests) and every due
    fire runs ``runner(fire_time)`` once. Last-run state lives in memory
    and, when ``state_path`` is given, in a JSON sidecar so a restarted
    scheduler doesn't re-fire completed slots (the duplicate-run ledger
    pattern, V5, applied to the scheduler itself)."""

    def __init__(self, spec: ScheduleSpec, runner, state_path: str | None = None):
        self.spec = spec
        self.runner = runner
        self.state_path = state_path
        self._last_fire: datetime | None = None
        if state_path and os.path.exists(state_path):
            with open(state_path, encoding="utf-8") as fh:
                raw = json.load(fh).get("last_fire")
            if raw:
                self._last_fire = datetime.fromisoformat(raw)

    def tick(self, now: datetime | None = None) -> list:
        """Run every due fire; returns the fire times executed."""
        if now is None:  # pragma: no cover - production clock
            now = datetime.now(ZoneInfo(self.spec.timezone))
        ran = []
        for fire in self.spec.due_fires(self._last_fire, now):
            self.runner(fire)
            self._last_fire = fire
            self._save()
            ran.append(fire)
        return ran

    def _save(self) -> None:
        if self.state_path and self._last_fire is not None:
            tmp = self.state_path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump({"last_fire": self._last_fire.isoformat()}, fh)
            os.replace(tmp, self.state_path)


def backfill(
    orchestrator,
    config,
    start_date: str,
    end_date: str,
    param: str = "ds",
    extra_params: dict | None = None,
    on_error: str = "raise",
) -> list:
    """Airflow-style backfill: run one parameterized job per calendar
    day in [start_date, end_date] (inclusive, ISO dates, oldest first),
    passing the day as ``${param}`` to the templated config. ``config``
    must be raw (dict or JSON path) so each day resolves its own
    placeholders. ``on_error='raise'`` stops at the first failing day
    (completed days stay landed — re-running skips duplicates if the
    config carries duplicateRunCheck); ``'continue'`` records the
    exception in the result list and proceeds.

    Returns one entry per day: the JobResult, or the exception when
    ``on_error='continue'``."""
    from datetime import date, timedelta

    d0, d1 = date.fromisoformat(start_date), date.fromisoformat(end_date)
    if d1 < d0:
        raise ValueError(f"end_date {end_date} precedes start_date {start_date}")
    if on_error not in ("raise", "continue"):
        raise ValueError("on_error must be 'raise' or 'continue'")
    results = []
    for i in range((d1 - d0).days + 1):
        ds = (d0 + timedelta(days=i)).isoformat()
        try:
            results.append(
                orchestrator.run(config, params={param: ds, **(extra_params or {})})
            )
        except Exception as exc:  # noqa: BLE001 - routed per on_error
            if on_error == "raise":
                raise
            results.append(exc)
    return results
