"""Multi-job pipeline runner (SURVEY.md §2.6, O1-O9).

The reference orchestrates jobs as an Airflow DAG — dependency chain
``start >> fetch >> calculate >> register >> scd2 >> terminate``
(``example-shareprice.py:153``), 3 retries with delay
(``example-shareprice.py:60-64``), always-run cleanup
(``trigger_rule="all_done"``, ``example-shareprice.py:140``), inter-task
values via XCom (``example-shareprice.py:79,134``), and a deploy.yaml
manifest (``deploy.yaml:1-21``).

Here: a topologically-ordered in-process runner over one SparkSession.
Cluster provisioning (O5) is out of local scope — cluster shape maps to
SparkSession confs applied by the caller.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any, Callable

from pyspark.sql import SparkSession

from ..config import JobConfig
from .engine import JobResult, Orchestrator


@dataclass
class PipelineTask:
    name: str
    config: JobConfig | dict | str | None = None
    # escape hatch for non-job tasks (the reference's bash/cfn steps)
    fn: Callable[[dict], Any] | None = None
    depends_on: list[str] = field(default_factory=list)
    retries: int = 0  # reference default 3 (deploy.yaml:19)
    retry_delay_sec: float = 0.0  # reference 1 min (example-shareprice.py:64)
    always_run: bool = False  # trigger_rule="all_done" semantics


@dataclass
class TaskOutcome:
    name: str
    state: str  # success|failed|skipped
    attempts: int = 0
    result: Any = None
    error: str | None = None


class Pipeline:
    """DAG execution with retries, always-run cleanup, and bounded task
    concurrency (reference: 4 parallel slots, ``deploy.yaml:11``,
    ``example-shareprice.py:73``). Independent branches run in parallel
    threads against the shared SparkSession — Spark's scheduler accepts
    concurrent job submission; a failure skips only its downstream
    (Airflow ``all_success`` semantics), not unrelated branches."""

    def __init__(
        self,
        spark: SparkSession,
        tasks: list[PipelineTask],
        concurrency: int = 4,
        params: dict[str, Any] | None = None,
    ):
        self.spark = spark
        self.tasks = {t.name: t for t in tasks}
        self.concurrency = max(1, concurrency)
        #: O9 XCom equivalent: shared context dict tasks can read/write
        self.context: dict[str, Any] = {}
        #: DAG-level ``${...}`` values applied to every raw job config —
        #: one run date parameterizes the whole manifest, so a DAG
        #: backfill is ``backfill`` over a Pipeline-running closure
        self.params = dict(params) if params else None
        if self.params:
            for t in tasks:
                if isinstance(t.config, JobConfig):
                    raise ValueError(
                        f"task '{t.name}' carries a parsed JobConfig; "
                        f"pipeline params need raw configs (dict or path)"
                    )

    def run(self) -> dict[str, TaskOutcome]:
        from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait

        ts = TopologicalSorter({t.name: set(t.depends_on) for t in self.tasks.values()})
        ts.prepare()
        outcomes: dict[str, TaskOutcome] = {}
        running: dict[Future, str] = {}
        with ThreadPoolExecutor(max_workers=self.concurrency) as pool:
            while ts.is_active():
                for name in ts.get_ready():
                    task = self.tasks[name]
                    dep_bad = any(
                        d in outcomes and outcomes[d].state != "success"
                        for d in task.depends_on
                    )
                    if dep_bad and not task.always_run:
                        outcomes[name] = TaskOutcome(name=name, state="skipped")
                        ts.done(name)
                    else:
                        running[pool.submit(self._run_one, task)] = name
                if not running:
                    continue  # ready set was all skips; new nodes just freed
                finished, _ = wait(running, return_when=FIRST_COMPLETED)
                for f in finished:
                    n = running.pop(f)
                    outcomes[n] = f.result()
                    ts.done(n)
        return outcomes

    def _run_one(self, task: PipelineTask) -> TaskOutcome:
        attempts = 0
        last_err: Exception | None = None
        while attempts <= task.retries:
            attempts += 1
            try:
                if task.fn is not None:
                    res: Any = task.fn(self.context)
                elif task.config is None:
                    res = None  # marker/cleanup task with no job: no-op success
                else:
                    # Each job gets its own child session (shared
                    # SparkContext, isolated temp-view catalog + SQLConf):
                    # concurrent jobs that use the same dataFrameName /
                    # outputDFName (e.g. the defaults 'input'/'output')
                    # would otherwise clobber each other's views, and
                    # per-job sparkConfig would leak across tasks.
                    res = Orchestrator(self.spark.newSession()).run(
                        task.config, params=self.params
                    )
                    if isinstance(res, JobResult):
                        self.context[task.name] = res
                return TaskOutcome(name=task.name, state="success", attempts=attempts, result=res)
            except Exception as e:  # noqa: BLE001 - retry loop
                last_err = e
                if attempts <= task.retries and task.retry_delay_sec:
                    time.sleep(task.retry_delay_sec)
        return TaskOutcome(
            name=task.name, state="failed", attempts=attempts, error=str(last_err)
        )


def from_manifest(
    spark: SparkSession, manifest: dict, params: dict[str, Any] | None = None
) -> Pipeline:
    """Entry point C: a deploy.yaml-shaped manifest → Pipeline.

    Recognized shape (dialect of ``deploy.yaml:1-21``)::

        {"name": ..., "schedule": {...},          # recorded, not enforced
         "jobParams": {...},                      # DAG-level ${...} defaults
         "tasks": [{"name": ..., "config": <path|dict>,
                    "dependsOn": [...], "retries": 3}]}

    ``params`` override the manifest's ``jobParams``; the merged dict is
    applied to every task's raw job config (each config's own
    ``configs.jobParams`` still fills anything neither supplies)."""
    merged = {**(manifest.get("jobParams") or {}), **(params or {})}
    tasks = [
        PipelineTask(
            name=t["name"],
            config=t.get("config"),
            depends_on=list(t.get("dependsOn") or []),
            retries=int(t.get("retries", manifest.get("retries", 0))),
            retry_delay_sec=float(t.get("retryDelaySec", 0)),
            always_run=bool(t.get("alwaysRun", False)),
        )
        for t in manifest.get("tasks", [])
    ]
    return Pipeline(
        spark,
        tasks,
        concurrency=int(manifest.get("concurrency", 4)),
        params=merged or None,
    )
