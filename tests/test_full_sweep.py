"""Round-3 VERDICT ask #9: a CI-runnable FULL oracle sweep.

The driver's correctness gate samples a fixed 50 of the registry entries, so
rot in the other ~90 could hide.  This test shells tools/check_oracle.py over
EVERY entry at sf0.001 in a fresh process (the sweep owns its own Spark
session + DuckDB connection) and fails on any FAIL line.

Deselected by default (pytest.ini adds -m "not slow"); run with:

    python -m pytest -m slow -q
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_oracle_sweep():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    tail = "\n".join(r.stdout.splitlines()[-160:])
    assert r.returncode == 0, f"sweep rc={r.returncode}\n{tail}\n{r.stderr[-2000:]}"
    assert "ALL PASS" in r.stdout, tail
    assert "FAIL" not in r.stdout, tail
