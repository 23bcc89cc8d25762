"""Docs-vs-artifacts consistency gate (VERDICT r4 next-step #2).

Every performance number README/STATUS quote must exist in a committed
artifact. tools/claims_check.py holds the claim manifest (doc regex ->
artifact JSON path); this test makes `pytest` fail on drift, so a bench
re-run that moves a number forces the doc update in the same commit.
"""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_claims_match_committed_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "claims_check.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"README/STATUS cite numbers their artifacts contradict:\n"
        f"{proc.stderr}\n{proc.stdout}")
