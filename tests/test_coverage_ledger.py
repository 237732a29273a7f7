"""The last-green ledger must never silently lag the newest driver
artifact (r9 verdict: the r8-generated ledger went stale the moment the
driver dropped CORRECTNESS_r09.json and the r10 rotation planning
depended on it). The full suite now fails loudly instead."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_last_green_ledger_is_current():
    r = subprocess.run(
        [sys.executable, os.path.join("tools", "coverage_rounds.py"), "--check"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, (
        "COVERAGE.md ledger is stale vs the newest CORRECTNESS_r*.json — "
        "run `python tools/coverage_rounds.py` and commit.\n"
        + r.stdout + r.stderr
    )
