"""Capture formatted physical plans (and optionally isolated timings) for
declared queries.

Usage:
    python tools/plan_probe.py --suffix before [names...]   # plans only
    python tools/plan_probe.py --time [names...]            # min-of-3 noop timings
    python tools/plan_probe.py --time --runs 5 q1_pricing_summary

Plans go to plans/<round>/<name>_<suffix>.txt (--round, default r13). With no names, captures every
bench HEADLINE query. Timing uses the same methodology as bench.py (warm
run, then N timed noop-sink runs, report median+min) but for a hand-picked
subset, so an optimization can be measured in isolation without paying a
full bench sweep.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod
import __spark_entry__ as entry_mod
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--suffix", default=None, help="write plans/<round>/<name>_<suffix>.txt")
    ap.add_argument("--round", default="r13", help="plans subdir (r12, r13, ...)")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        app_name="pipelines-spark-plan-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entry_mod.queries())
    qs["scd2_incremental"] = bench_mod._scd2_incremental
    names = args.names or list(bench_mod.HEADLINE)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", args.round)
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        build = time.time() - t0
        if args.suffix:
            path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(formatted_plan(df))
            print(f"{name}: plan -> {path} (build {build:.2f}s)")
        if args.time:
            spark.sparkContext.setJobDescription(f"probe-warm: {name}")
            df.write.format("noop").mode("overwrite").save()
            samples = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"probe-{i}: {name}")
                t0 = time.time()
                df2 = qs[name](spark, sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            print(
                f"TIME {name}: min={min(samples):.3f}s "
                f"median={statistics.median(samples):.3f}s "
                f"all={[round(s, 3) for s in samples]}"
            )


if __name__ == "__main__":
    main()
