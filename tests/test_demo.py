"""Smoke test for the README quickstart: examples/demo_project.py must run
end-to-end on a fresh interpreter and print the documented milestones.
Executed as a subprocess (its own SparkSession, like a first-time user)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_project_end_to_end():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "demo_project.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # the documented quickstart milestones, in order; exact counts are
    # deterministic at sf0.001 (hash splits, decimal-routed sums)
    for marker in [
        "fct_daily_revenue: 1094 days",
        "events_latest: 1000 rows",
        "events_history: 1000 versions",
        "clean corpus: 337 docs",
        "pretrain corpus: 99 docs packed",
        "leakage-safe split:",
        "ivf index: queried 20 vectors, 60 neighbors",
        "catalog:",
    ]:
        assert marker in out, f"missing {marker!r} in demo output:\n{out}"
    # the DQ report passed both checks
    assert out.count("|pass") >= 2
