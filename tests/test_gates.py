"""Repo-health gates as FAILING tests, not advisory tools.

Round-6 lesson: ``weighted_pagerank`` shipped in the final commit
without a plan-audit allowlist decision, so ``tools/plan_audit.py``
exited 1 at HEAD while the round notes claimed "0 flags" — the audit
was a tool someone had to remember to run. These tests make both
guards part of ``pytest tests/``:

- ``tools/consistency_check.py`` — registry/docs/bench/allowlist/
  baseline coherence (cheap, no Spark session).
- ``tools/plan_audit.py`` — every entry query's physical plan scanned
  for CartesianProduct / undocumented BNLJ / row-at-a-time Python
  UDFs. Heavy (builds all 128 plans, executes the streaming proofs),
  so it runs once as its own subprocess with a generous timeout.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str], timeout: int) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
        check=False,
    )


def test_consistency_check_green_at_head():
    proc = _run(["tools/consistency_check.py"], timeout=120)
    assert proc.returncode == 0, (
        "consistency_check failed:\n" + proc.stdout + proc.stderr[-2000:]
    )


def test_plan_audit_green_at_head():
    proc = _run(
        ["tools/plan_audit.py", "/root/testdata/sf0.001"], timeout=900
    )
    tail = "\n".join(proc.stdout.splitlines()[-6:])
    assert proc.returncode == 0, (
        "plan_audit flagged queries (add a documented allowlist entry or "
        "fix the plan):\n" + tail + "\n" + proc.stderr[-2000:]
    )
