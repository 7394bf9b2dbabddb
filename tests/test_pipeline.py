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
