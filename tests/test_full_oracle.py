"""Opt-in full-registry oracle sweep as a pytest entry point.

The driver's correctness gate covers only the first 50 registry
entries; queries rotated below the fold must retain automated
verification (round-4 advice). ``tools/check_oracle.py`` is that
verification — this wrapper makes it runnable from the test harness:

    RUN_FULL_ORACLE=1 python -m pytest tests/test_full_oracle.py -q

Skipped by default: it re-executes all 126 registered queries against
DuckDB at sf0.01 (minutes), which would dominate the unit suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("RUN_FULL_ORACLE") != "1",
    reason="full sweep is opt-in: RUN_FULL_ORACLE=1 (run per round)",
)
def test_full_registry_oracle_sweep():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=3600,
    )
    assert proc.returncode == 0 and "0 failures" in proc.stdout, (
        proc.stdout[-3000:] + proc.stderr[-1000:]
    )
