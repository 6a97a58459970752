#!/usr/bin/env python
"""Doc-number drift checker (VERDICT r4 weak #1 / next #6).

Round 4 shipped a README whose headline ("432 MPix/s") undersold the
round artifact (BENCH_r04: 504.77) because the last kernel win landed
after the README refresh. This checker makes that drift impossible to
miss: it extracts every load-bearing number the prose docs cite and
diffs each against its machine-readable source of truth
(``BENCH_r*.json`` newest file for the headline, ``BENCH_MATRIX.json``
rows for the rest). Rounding in prose is fine (1.5% relative
tolerance); drift beyond that fails the check.

Run it in the round-end flow, after refreshing the matrix:

    python tools/doc_numbers_check.py          # exit 0 = consistent
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REL_TOL = 0.015
# The headline's source (newest BENCH_r*.json) is re-measured by the
# driver each round and the tunnel swings sessions ±10% (documented
# degradation windows); the staleness this checker exists to catch was
# 17% (round 4's README). So the headline row gets a wider band while
# matrix-sourced rows stay tight.
HEADLINE_TOL = 0.12


def _sources() -> dict:
    src = {}
    bench = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if bench:
        with open(bench[-1]) as fh:
            data = json.load(fh)
        parsed = data.get("parsed") or data
        src["headline"] = float(parsed["value"])
        src["_headline_file"] = os.path.basename(bench[-1])
    with open(os.path.join(ROOT, "BENCH_MATRIX.json")) as fh:
        matrix = json.load(fh)
    for row in matrix["rows"]:
        # "1_srcnn_9-1-5_1080p_inference" -> key "row1"
        src["row" + row["metric"].split("_", 1)[0]] = float(row["value"])
    return src


# (file, human label, regex with ONE capture group, source key).
# Patterns use re.S so a number split from its context by a line wrap
# still matches; when a pattern matches multiple times the LAST match
# is checked (docs append newest-round rows at the bottom).
CHECKS = [
    ("README.md", "headline 1080p 9-5-5 throughput",
     r"\*\*([\d.]+) MPix/s\*\* end-to-end 1080p", "headline"),
    ("README.md", "9-1-5 throughput",
     r"\*\*([\d.]+) MPix/s\*\*\s+on the 9-1-5", "row1"),
    ("README.md", "7-layer RGB throughput",
     r"\*\*([\d.]+) MPix/s\*\*\s+on the\s+7-layer", "row5"),
    ("README.md", "training epochs/s (HIGHEST)",
     r"\*\*([\d.]+) epochs/s\*\* training", "row3"),
    ("README.md", "training epochs/s (mixed precision)",
     r"~([\d.]+) epochs/s with opt-in", "row3b"),
    ("COVERAGE.md", "latest round-additions headline",
     r"headline [\d.]+(?:\s*→\s*| to )\*\*([\d.]+) MPix/s\*\*",
     "headline"),
]


def main() -> int:
    src = _sources()
    failures = []
    for fname, label, pattern, key in CHECKS:
        path = os.path.join(ROOT, fname)
        with open(path) as fh:
            text = fh.read()
        matches = list(re.finditer(pattern, text, re.S))
        if key not in src:
            print(f"SKIP  {fname}: {label} (no source '{key}')")
            continue
        want = src[key]
        if not matches:
            failures.append((fname, label, "pattern not found", want))
            print(f"FAIL  {fname}: {label} — pattern not found "
                  f"(source {want:g})")
            continue
        # FIRST match: COVERAGE/README keep newest-round sections on
        # top, so the first occurrence is the current claim and later
        # ones are historical round records (which legitimately cite
        # older headlines — taking the last match flagged round-4
        # history against the round-5 artifact)
        cited = float(matches[0].group(1))
        tol = HEADLINE_TOL if key == "headline" else REL_TOL
        ok = abs(cited - want) <= tol * abs(want)
        status = "ok" if ok else "FAIL"
        if not ok:
            failures.append((fname, label, cited, want))
        print(f"{status:5s} {fname}: {label} — cites {cited:g}, "
              f"source {want:g}")
    hf = src.get("_headline_file", "?")
    print(f"\nsources: {hf} headline={src.get('headline', '?')}, "
          f"BENCH_MATRIX.json ({len(src) - 2} rows)")
    if failures:
        print(f"{len(failures)} doc-number check(s) FAILED — refresh the "
              "prose or re-run the benchmarks.")
        return 1
    print("all doc-number checks consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
