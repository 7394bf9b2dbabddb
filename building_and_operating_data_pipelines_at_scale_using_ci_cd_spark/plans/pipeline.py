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
    #: per-attempt wall-clock limit (reference ``execution_timeout=
    #: timedelta(minutes=30)``, example-shareprice.py:132). A hung attempt
    #: is failed with TimeoutError — which consumes a retry like any other
    #: failure — and its Spark jobs are cancelled so the slot frees.
    execution_timeout_sec: float | None = None
    #: alerting hook (reference ``email_on_failure=True``,
    #: example-shareprice.py:60-62): called ONCE per TERMINAL failure
    #: (after retries are exhausted, never per retried attempt) with
    #: ``{"task", "error", "attempts", "context"}``. Overrides the
    #: pipeline-level default when both are set.
    on_failure: Callable[[dict], Any] | None = None


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
        on_failure: Callable[[dict], Any] | None = None,
    ):
        self.spark = spark
        self.tasks = {t.name: t for t in tasks}
        self.concurrency = max(1, concurrency)
        #: pipeline-level default failure callback (Airflow default_args
        #: ``on_failure_callback`` shape); a task's own hook overrides it
        self.on_failure = on_failure
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
                res = self._attempt_with_timeout(task)
                return TaskOutcome(name=task.name, state="success", attempts=attempts, result=res)
            except Exception as e:  # noqa: BLE001 - retry loop
                last_err = e
                if attempts <= task.retries and task.retry_delay_sec:
                    time.sleep(task.retry_delay_sec)
        outcome = TaskOutcome(
            name=task.name, state="failed", attempts=attempts, error=str(last_err)
        )
        self._fire_on_failure(task, outcome)
        return outcome

    def _attempt(self, task: PipelineTask) -> Any:
        if task.fn is not None:
            return task.fn(self.context)
        if task.config is None:
            return None  # marker/cleanup task with no job: no-op success
        # Each job gets its own child session (shared SparkContext,
        # isolated temp-view catalog + SQLConf): concurrent jobs that use
        # the same dataFrameName / outputDFName (e.g. the defaults
        # 'input'/'output') would otherwise clobber each other's views,
        # and per-job sparkConfig would leak across tasks.
        res = Orchestrator(self.spark.newSession()).run(task.config, params=self.params)
        if isinstance(res, JobResult):
            self.context[task.name] = res
        return res

    def _attempt_with_timeout(self, task: PipelineTask) -> Any:
        """One attempt, bounded by ``execution_timeout_sec`` when set. The
        attempt runs in a daemon thread under its own Spark job group; on
        timeout the group is cancelled (interrupt-on-cancel), so hung
        SPARK work is actually stopped — a pure-Python hang inside a
        ``fn`` task cannot be killed, but the daemon thread no longer
        holds a pool slot or blocks interpreter exit."""
        if not task.execution_timeout_sec:
            return self._attempt(task)
        import threading

        group = f"pipeline-task-{task.name}-{threading.get_ident()}-{time.monotonic_ns()}"
        box: dict[str, Any] = {}

        def target():
            try:
                self.spark.sparkContext.setJobGroup(
                    group, f"pipeline task {task.name}", interruptOnCancel=True
                )
                box["res"] = self._attempt(task)
            except BaseException as e:  # noqa: BLE001 - ferried to caller
                box["err"] = e

        th = threading.Thread(target=target, daemon=True, name=f"pipeline-{task.name}")
        th.start()
        th.join(task.execution_timeout_sec)
        if th.is_alive():
            try:
                self.spark.sparkContext.cancelJobGroup(group)
            except Exception:
                pass
            raise TimeoutError(
                f"task '{task.name}' exceeded execution timeout of "
                f"{task.execution_timeout_sec}s"
            )
        if "err" in box:
            raise box["err"]
        return box.get("res")

    def _fire_on_failure(self, task: PipelineTask, outcome: TaskOutcome) -> None:
        """Alerting hook: the task's callback, else the pipeline default.
        A callback exception must never take the DAG down with it — the
        failure is already recorded; the alert is best-effort (the same
        contract Airflow's on_failure_callback has)."""
        cb = task.on_failure or self.on_failure
        if cb is None:
            return
        try:
            cb(
                {
                    "task": task.name,
                    "error": outcome.error,
                    "attempts": outcome.attempts,
                    "context": self.context,
                }
            )
        except Exception as e:  # noqa: BLE001 - alert must not kill the DAG
            import sys

            print(
                f"WARNING: on_failure callback for task '{task.name}' raised: {e}",
                file=sys.stderr,
            )


def from_manifest(
    spark: SparkSession,
    manifest: dict,
    params: dict[str, Any] | None = None,
    on_failure: Callable[[dict], Any] | None = None,
) -> Pipeline:
    """Entry point C: a deploy.yaml-shaped manifest → Pipeline.

    Recognized shape (dialect of ``deploy.yaml:1-21``)::

        {"name": ..., "schedule": {...},          # recorded, not enforced
         "jobParams": {...},                      # DAG-level ${...} defaults
         "executionTimeoutSec": 1800,             # default per-attempt cap
         "tasks": [{"name": ..., "config": <path|dict>,
                    "dependsOn": [...], "retries": 3,
                    "executionTimeoutSec": 600}]}

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
            execution_timeout_sec=(
                float(t["executionTimeoutSec"])
                if t.get("executionTimeoutSec") is not None
                else (
                    float(manifest["executionTimeoutSec"])
                    if manifest.get("executionTimeoutSec") is not None
                    else None
                )
            ),
        )
        for t in manifest.get("tasks", [])
    ]
    return Pipeline(
        spark,
        tasks,
        concurrency=int(manifest.get("concurrency", 4)),
        params=merged or None,
        on_failure=on_failure,
    )
