"""Pipeline runner: topo order, retries, skip-on-failure, always-run."""

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
    Pipeline,
    PipelineTask,
    from_manifest,
)


def test_topo_order_and_context(spark):
    ran = []

    def mk(name):
        def fn(ctx):
            ran.append(name)
            ctx[name] = f"{name}_result"
            return name

        return fn

    p = Pipeline(
        spark,
        [
            PipelineTask(name="c", fn=mk("c"), depends_on=["b"]),
            PipelineTask(name="a", fn=mk("a")),
            PipelineTask(name="b", fn=mk("b"), depends_on=["a"]),
        ],
    )
    outcomes = p.run()
    assert ran == ["a", "b", "c"]
    assert all(o.state == "success" for o in outcomes.values())
    assert p.context["a"] == "a_result"


def test_retries_then_success(spark):
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline(spark, [PipelineTask(name="flaky", fn=flaky, retries=3)])
    out = p.run()["flaky"]
    assert out.state == "success" and out.attempts == 3


def test_failure_skips_downstream_but_runs_cleanup(spark):
    ran = []

    def boom(ctx):
        raise RuntimeError("boom")

    def note(name):
        def fn(ctx):
            ran.append(name)

        return fn

    p = Pipeline(
        spark,
        [
            PipelineTask(name="ingest", fn=boom),
            PipelineTask(name="transform", fn=note("transform"), depends_on=["ingest"]),
            PipelineTask(name="teardown", fn=note("teardown"), depends_on=["transform"], always_run=True),
        ],
    )
    outcomes = p.run()
    assert outcomes["ingest"].state == "failed"
    assert outcomes["transform"].state == "skipped"
    assert outcomes["teardown"].state == "success"  # trigger_rule=all_done
    assert ran == ["teardown"]


def test_failure_skips_only_downstream_branch(spark):
    """Airflow all_success semantics: an unrelated branch still runs."""

    def boom(ctx):
        raise RuntimeError("boom")

    p = Pipeline(
        spark,
        [
            PipelineTask(name="bad", fn=boom),
            PipelineTask(name="bad_child", fn=lambda ctx: "x", depends_on=["bad"]),
            PipelineTask(name="other", fn=lambda ctx: "ok"),
            PipelineTask(name="other_child", fn=lambda ctx: "ok2", depends_on=["other"]),
        ],
    )
    outcomes = p.run()
    assert outcomes["bad"].state == "failed"
    assert outcomes["bad_child"].state == "skipped"
    assert outcomes["other"].state == "success"
    assert outcomes["other_child"].state == "success"


def test_independent_tasks_run_concurrently(spark):
    """Two tasks that each block until the other has started can only
    both succeed when the runner overlaps them (concurrency ≥ 2)."""
    import threading

    started = {"x": threading.Event(), "y": threading.Event()}

    def mk(me, other):
        def fn(ctx):
            started[me].set()
            assert started[other].wait(30), f"{other} never started — tasks ran serially"
            return me

        return fn

    p = Pipeline(
        spark,
        [
            PipelineTask(name="x", fn=mk("x", "y")),
            PipelineTask(name="y", fn=mk("y", "x")),
        ],
        concurrency=4,
    )
    outcomes = p.run()
    assert all(o.state == "success" for o in outcomes.values())


def test_from_manifest_shape(spark):
    manifest = {
        "name": "shareprice",
        "retries": 2,
        "tasks": [
            {"name": "fetch", "config": {"configs": {"name": "fetch"}}},
            {"name": "calc", "config": {"configs": {"name": "calc"}}, "dependsOn": ["fetch"]},
        ],
    }
    p = from_manifest(spark, manifest)
    assert p.tasks["calc"].depends_on == ["fetch"]
    assert p.tasks["calc"].retries == 2


def test_on_failure_fires_once_per_terminal_failure(spark):
    """Reference parity (example-shareprice.py:60-62 email_on_failure):
    the alert hook fires ONCE when retries are exhausted — never for a
    retried-then-recovered task, never per attempt — and a raising
    callback cannot take the DAG down."""
    alerts = []
    attempts = {"flaky": 0}

    def flaky(ctx):
        attempts["flaky"] += 1
        if attempts["flaky"] < 2:
            raise RuntimeError("transient")
        return "ok"

    def always_bad(ctx):
        raise RuntimeError("hard failure")

    p = Pipeline(
        spark,
        [
            PipelineTask(name="recovers", fn=flaky, retries=3),
            PipelineTask(name="dies", fn=always_bad, retries=2),
            PipelineTask(name="down", fn=lambda ctx: "x", depends_on=["dies"]),
        ],
        on_failure=lambda info: alerts.append(info),
    )
    outcomes = p.run()
    assert outcomes["recovers"].state == "success"
    assert outcomes["dies"].state == "failed"
    assert outcomes["down"].state == "skipped"  # skip is not a failure: no alert
    assert len(alerts) == 1
    assert alerts[0]["task"] == "dies"
    assert alerts[0]["attempts"] == 3  # 1 + 2 retries
    assert "hard failure" in alerts[0]["error"]
    # task-level hook overrides the pipeline default; a raising callback
    # is swallowed (failure already recorded, alert is best-effort)
    task_alerts = []
    p2 = Pipeline(
        spark,
        [
            PipelineTask(
                name="dies2", fn=always_bad,
                on_failure=lambda info: task_alerts.append(info) or 1 / 0,
            ),
        ],
        on_failure=lambda info: alerts.append(("default", info)),
    )
    outcomes2 = p2.run()
    assert outcomes2["dies2"].state == "failed"
    assert len(task_alerts) == 1 and len(alerts) == 1  # default not called


def test_execution_timeout_fails_hung_task(spark):
    """Reference parity (example-shareprice.py:132 execution_timeout):
    a hung attempt is failed with TimeoutError, the timeout consumes
    retries like any other failure, downstream skips, and always_run
    cleanup still runs."""
    import threading
    import time as _t

    release = threading.Event()
    ran = []

    def hangs(ctx):
        ran.append("attempt")
        release.wait(30)  # deliberately hung until the test releases it

    def quick(ctx):
        ran.append("quick")
        return "q"

    def cleanup(ctx):
        ran.append("cleanup")

    alerts = []
    p = Pipeline(
        spark,
        [
            PipelineTask(
                name="hung", fn=hangs, execution_timeout_sec=0.5, retries=1,
            ),
            PipelineTask(name="down", fn=quick, depends_on=["hung"]),
            PipelineTask(
                name="end", fn=cleanup, depends_on=["down"], always_run=True,
            ),
        ],
        on_failure=lambda info: alerts.append(info),
    )
    t0 = _t.time()
    outcomes = p.run()
    elapsed = _t.time() - t0
    release.set()  # let the daemon threads drain
    assert outcomes["hung"].state == "failed"
    assert "timeout" in outcomes["hung"].error.lower()
    assert outcomes["hung"].attempts == 2  # timeout consumed the retry
    assert ran.count("attempt") == 2
    assert outcomes["down"].state == "skipped"
    assert outcomes["end"].state == "success"  # always_run cleanup ran
    assert "cleanup" in ran and "quick" not in ran
    assert elapsed < 10  # the 30s hang did not block the DAG
    assert len(alerts) == 1 and alerts[0]["task"] == "hung"
    # a task under the timeout budget is untouched by the machinery
    p2 = Pipeline(
        spark,
        [PipelineTask(name="fast", fn=lambda ctx: 42, execution_timeout_sec=20)],
    )
    assert p2.run()["fast"].result == 42


def test_execution_timeout_cancels_spark_jobs(spark):
    """The timeout must CANCEL the hung attempt's Spark jobs (job-group
    cancel), not just abandon the thread — otherwise a hung stage keeps
    executor slots occupied forever."""
    import time as _t

    def spark_hang(ctx):
        # each row sleeps: a job that would run ~100s without cancellation
        spark.range(200).repartition(4).foreach(lambda r: _t.sleep(2))

    p = Pipeline(
        spark,
        [PipelineTask(name="stuck", fn=spark_hang, execution_timeout_sec=3.0)],
    )
    t0 = _t.time()
    outcomes = p.run()
    elapsed = _t.time() - t0
    assert outcomes["stuck"].state == "failed"
    assert "timeout" in outcomes["stuck"].error.lower()
    assert elapsed < 30  # cancelled, not run to completion
    # the session is still healthy for later tasks
    assert spark.range(5).count() == 5


def test_from_manifest_execution_timeout(spark):
    manifest = {
        "name": "p",
        "executionTimeoutSec": 7,
        "tasks": [
            {"name": "a"},
            {"name": "b", "executionTimeoutSec": 3, "dependsOn": ["a"]},
        ],
    }
    p = from_manifest(spark, manifest)
    assert p.tasks["a"].execution_timeout_sec == 7  # manifest default
    assert p.tasks["b"].execution_timeout_sec == 3  # task override
