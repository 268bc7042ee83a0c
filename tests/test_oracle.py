"""Pytest entry for the DuckDB-oracle comparator (tools/check_oracle.py
holds the implementation; the driver runs the same comparison per-round).

The full sweep costs ~3 minutes, so it only runs when explicitly asked:

    SPARK_GRAFT_ORACLE=1 python -m pytest tests/test_oracle.py -q

Without the env var the test is skipped (the fast suite stays fast; the
sweep still runs in /verify and in the driver's own gate).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_ORACLE"),
    reason="full oracle sweep is opt-in: set SPARK_GRAFT_ORACLE=1",
)
def test_all_queries_match_duckdb_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py")],
        capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "FAIL" not in proc.stdout, proc.stdout[-2000:]
    assert "matched" in tail
