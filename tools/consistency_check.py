"""Registry ↔ docs ↔ bench consistency guard (no Spark session needed).

Docs drift is a recurring verdict/advice item (stale counts in README,
bench names not in the registry, registry steps undocumented). This
check is cheap enough to run every session:

  - every bench HEADLINE name resolves in ``queries()`` (or is a
    bench-local extra);
  - ``set(queries()) == set(oracle_sql())`` — zero no-oracle entries;
  - the checked-50 cap: the rotation comment's arithmetic matches the
    actual dict (50 first keys, cutoff where documented);
  - README's "N queries/operators" claim equals the real count;
  - every config-registry operator name appears in COVERAGE.md or
    README.md (operators exist to be discoverable).

Exit code 1 on any failure; prints each finding.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import bench
    import __spark_entry__ as entry
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
        OPERATORS,
    )

    failures: list[str] = []
    q = entry.queries()
    o = entry.oracle_sql()

    # 1. oracle completeness
    missing = set(q) - set(o)
    extra = set(o) - set(q)
    if missing:
        failures.append(f"queries without oracle: {sorted(missing)}")
    if extra:
        failures.append(f"oracles without query: {sorted(extra)}")

    # 2. bench headline resolves
    bench_extras = {"scd2_incremental"}  # bench-local shapes, documented in bench.py
    for name in bench.HEADLINE:
        if name not in q and name not in bench_extras:
            failures.append(f"bench HEADLINE name not in queries(): {name}")

    # 3. README count claim
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) queries/operators, ALL (\d+) hash-checked", readme)
    if not m:
        failures.append("README count claim not found")
    elif int(m.group(1)) != len(q) or int(m.group(2)) != len(o):
        failures.append(
            f"README claims {m.group(1)}/{m.group(2)}, registry has {len(q)}/{len(o)}"
        )

    # 4. registry operators discoverable in docs
    docs = readme + open(os.path.join(REPO, "COVERAGE.md")).read()
    undocumented = [name for name in OPERATORS if name not in docs]
    if undocumented:
        failures.append(f"registry steps not mentioned in README/COVERAGE: {undocumented}")

    # 5. rotation comment arithmetic: 'a + b + ... = 50 checked; ... N
    #    total' (any number of + terms — round 9 has five cohorts)
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    mc = re.search(
        r"counts?.*?: ((?:\d+ \+ )+\d+) = 50 checked;.*?(\d+) total", src, re.S
    )
    if not mc:
        failures.append("rotation comment arithmetic not found")
    else:
        terms = [int(t) for t in mc.group(1).split("+")]
        total = int(mc.group(2))
        if sum(terms) != 50:
            failures.append(f"rotation comment sums to {sum(terms)}, not 50")
        if total != len(q):
            failures.append(f"rotation comment says {total} total, registry has {len(q)}")

    # 6. plan-audit allowlist hygiene (the round-6 failure mode: an entry
    #    shipped in the final commit without an allowlist decision or a
    #    baseline row). Every BNLJ_ALLOWED name must be a real entry, and
    #    PLAN_BASELINE.json must cover the full registry so the audit's
    #    diff-vs-baseline has a row for every query.
    from tools.plan_audit import BNLJ_ALLOWED

    ghost = sorted(set(BNLJ_ALLOWED) - set(q))
    if ghost:
        failures.append(f"BNLJ_ALLOWED names not in queries(): {ghost}")
    baseline_path = os.path.join(REPO, "PLAN_BASELINE.json")
    if os.path.exists(baseline_path):
        import json

        baseline = json.load(open(baseline_path)).get("queries", {})
        stale = sorted(set(q) - set(baseline))
        if stale:
            failures.append(f"entries missing from PLAN_BASELINE.json: {stale}")
    else:
        failures.append("PLAN_BASELINE.json missing")

    for f in failures:
        print(f"FAIL {f}")
    print(f"{len(failures)} consistency failures over {len(q)} entries / {len(OPERATORS)} registry steps")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
