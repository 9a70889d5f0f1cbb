"""bench.py fault isolation: one broken query must never erase the other
timings (round 3 lost the entire bench to a single AnalysisException).

Runs the real bench as a subprocess at the smallest sf with the
self-test hook (SPARK_GRAFT_BENCH_BREAK) swapping one headline query for
one that raises, and asserts rc=0 + an errors key + timings for the
rest.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # subprocess/fuzz/e2e tier - see pytest.ini

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_broken_query_does_not_erase_bench():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPS="1",
        SPARK_GRAFT_RAW_LAYOUT="1",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_BREAK="q1_pricing_summary",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert "q1_pricing_summary" in out.get("errors", {}), out
    assert "deliberately broken" in out["errors"]["q1_pricing_summary"], out
    # the other headline queries still produced timings
    assert "q1_pricing_summary" not in out["queries"], out
    assert len(out["queries"]) >= 10, out
    assert all(v > 0 for v in out["queries"].values()), out
