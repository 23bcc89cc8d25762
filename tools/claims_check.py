#!/usr/bin/env python
"""Fail when README/STATUS cite performance numbers that are absent from
(or disagree with) committed artifacts (VERDICT r4 next-step #2: "zero
claims in STATUS/README that a reader cannot find in a committed file").

Each claim pins (document, regex-with-one-capture-group) to (artifact
JSON file, dotted path). The doc must quote the artifact verbatim (exact
string match after float parsing, tolerance 0.5% for rounding). Run via
`make claims` or tests/test_claims.py.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (doc, regex, artifact, dotted_path)
# Keep every README/STATUS headline-ish number here. When a bench re-run
# moves a number, regenerate the artifact AND the doc together.
CLAIMS: list[tuple[str, str, str, str]] = [
    # headline
    ("README.md", r"pipelined depth-2[^|]*\|\s*96\s*\|\s*\*\*(\d+)\*\*",
     "artifacts/bench_r5.json", "value"),
    # serve closed-loop burst
    ("README.md", r"serve burst[^:]*: e2e \*\*([\d.]+)\*\*",
     "artifacts/bench_r5.json", "rows.serve.e2e_rtfx"),
    ("README.md", r"serve burst[^:]*: e2e \*\*[\d.]+\*\* / busy ([\d.]+)",
     "artifacts/bench_r5.json", "rows.serve.busy_rtfx"),
    # serve open-loop
    ("README.md", r"open-loop [\d.]+x offered: e2e ([\d.]+)",
     "artifacts/bench_r5.json", "rows.serve_openloop.e2e_rtfx"),
    ("README.md", r"open-loop [\d.]+x offered: e2e [\d.]+, p95 ([\d.]+) s",
     "artifacts/bench_r5.json", "rows.serve_openloop.latency_p95_s"),
    # continuous batching
    ("README.md", r"\*\*([\d.]+)x\*\* over wave scheduling",
     "artifacts/bench_r5.json",
     "rows.continuous_batching.overlap_speedup_vs_sync"),
    ("README.md", r"([\d.]+)x? of the length-matched fixed-token",
     "artifacts/bench_r5.json", "rows.continuous_batching.overlap_vs_equiv"),
    # streaming
    ("README.md", r"steady state \*\*([\d.]+)\*\* aggregate",
     "artifacts/bench_r5.json", "rows.streaming_steady.aggregate_rtfx"),
    ("README.md", r"2 s cadence \*\*([\d.]+)\*\*",
     "artifacts/bench_r5.json", "rows.streaming_steady_2s.aggregate_rtfx"),
    # longform
    ("README.md", r"longform \*\*([\d.]+)\*\* RTFx",
     "artifacts/bench_r5.json", "rows.longform.rtfx"),
]


def _resolve(doc: dict, path: str):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def check(verbose: bool = True) -> list[str]:
    errors = []
    artifacts: dict[str, dict | None] = {}
    for doc_name, pattern, art_name, path in CLAIMS:
        doc_path = os.path.join(ROOT, doc_name)
        with open(doc_path) as f:
            text = f.read()
        m = re.search(pattern, text)
        if not m:
            errors.append(f"{doc_name}: claim pattern not found: {pattern}")
            continue
        claimed = float(m.group(1))
        if art_name not in artifacts:
            ap = os.path.join(ROOT, art_name)
            artifacts[art_name] = (json.load(open(ap))
                                   if os.path.exists(ap) else None)
        art = artifacts[art_name]
        if art is None:
            errors.append(f"{art_name}: artifact missing (claimed "
                          f"{claimed} in {doc_name})")
            continue
        actual = _resolve(art, path)
        if actual is None:
            errors.append(f"{art_name}:{path}: key missing (claimed "
                          f"{claimed} in {doc_name})")
            continue
        actual = float(actual)
        tol = max(abs(actual) * 0.005, 0.01)
        if abs(actual - claimed) > tol:
            errors.append(f"{doc_name} claims {claimed} but {art_name}:"
                          f"{path} = {actual}")
        elif verbose:
            print(f"ok: {doc_name} {claimed} == {art_name}:{path}")
    return errors


def main() -> int:
    errors = check()
    if errors:
        for e in errors:
            print(f"CLAIM MISMATCH: {e}", file=sys.stderr)
        return 1
    print(f"claims_check: {len(CLAIMS)} claims verified against "
          f"committed artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
