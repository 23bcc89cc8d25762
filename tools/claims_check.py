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
BENCH = "artifacts/bench_r5.json"
PRESETS = "artifacts/presets.json"
CLAIMS: list[tuple[str, str, str, str]] = [
    ("README.md", r"Headline[^|]*\| \*\*(\d+)\*\* RTFx", BENCH, "value"),
    ("README.md", r"per-batch fenced, batch 96 \| (\d+) RTFx",
     BENCH, "rows.fenced.rtfx"),
    ("README.md", r"to EOT[^|]*\| (\d+) RTFx",
     BENCH, "rows.real_decode.rtfx"),
    ("README.md", r"overlapped host loop \| (\d+) RTFx",
     BENCH, "rows.continuous_batching.cb_overlap_rtfx"),
    ("README.md", r"\*\*([\d.]+)×\*\* over wave scheduling",
     BENCH, "rows.continuous_batching.overlap_speedup_vs_sync"),
    ("README.md", r"([\d.]+) of the length-matched fixed-token",
     BENCH, "rows.continuous_batching.overlap_vs_equiv"),
    ("README.md", r"`fixed_equiv_rtfx` (\d+)",
     BENCH, "rows.continuous_batching.fixed_equiv_rtfx"),
    ("README.md", r"steady state \*\*([\d.]+)\*\* aggregate RTFx",
     BENCH, "rows.streaming_steady.aggregate_rtfx"),
    ("README.md", r"tick p50 (\d+) ms",
     BENCH, "rows.streaming_steady.tick_p50_ms"),
    ("README.md", r"2 s cadence \*\*([\d.]+)\*\* aggregate",
     BENCH, "rows.streaming_steady_2s.aggregate_rtfx"),
    ("README.md", r"longform \*\*([\d.]+)\*\* RTFx recorded",
     BENCH, "rows.longform.rtfx"),
    ("README.md", r"e2e \*\*([\d.]+)\*\* / busy",
     BENCH, "rows.serve.e2e_rtfx"),
    ("README.md", r"e2e \*\*[\d.]+\*\* / busy ([\d.]+) RTFx",
     BENCH, "rows.serve.busy_rtfx"),
    ("README.md", r"open-loop 60x offered: e2e ([\d.]+)",
     BENCH, "rows.serve_openloop.e2e_rtfx"),
    ("README.md", r"open-loop 60x offered: e2e [\d.]+, p50 (\d+) ms",
     BENCH, "rows.serve_openloop.latency_p50_ms"),
    ("README.md", r"p50 \d+ ms, p95 (\d+) ms",
     BENCH, "rows.serve_openloop.latency_p95_ms"),
    ("README.md", r"\| (\d+) RTFx = [\d.]+× headline",
     BENCH, "rows.cross_kv_pool2_lossy.rtfx"),
    ("README.md", r"\| \d+ RTFx = ([\d.]+)× headline",
     BENCH, "rows.cross_kv_pool2_lossy.vs_headline"),
    ("README.md", r"presets\.json: ([\d.]+)\) \| 64 \| 439",
     PRESETS, "rows.medium_int4_kv8.rtfx"),
    ("README.md", r"presets\.json: ([\d.]+)\) \| 48 \| 347",
     PRESETS, "rows.largev3_s50_int8_ckv4.rtfx"),
    ("README.md", r"presets\.json: ([\d.]+)\) \| 64 \| 357",
     PRESETS, "rows.turbo_int8.rtfx"),
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
