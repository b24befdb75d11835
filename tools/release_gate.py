#!/usr/bin/env python
"""One-command release gate: every check that caught (or would have
caught) a shipped bug class, in sequence, fail-fast.

1. full pytest suite (CI green — the driver runs it too)
2. property gate: Hypothesis suites under fresh random seeds + one
   raised-example-budget pass (caught the r4 batched-BPE bug class)
3. plan audit: 0 hazards — BNLJ/cartesian lowerings, row-at-a-time
   Python, unlisted Python stages (regenerates PLANS.md)
4. correctness, driver window, sf0.01 (cell-exact vs DuckDB)
5. correctness, registry tail, with the committed artifact refreshed
6. correctness on a VANILLA SparkSession (the driver's environment —
   catches hidden session-conf dependencies)

Usage:  python tools/release_gate.py [--fast]

``--fast`` drops the pytest pass and runs the correctness gates at
sf0.001 (mid-round loop); the full gate is the pre-release bar.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    print(f"== release gate: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    ok = proc.returncode == 0
    print(
        f"== release gate: {label}: {'PASS' if ok else 'FAIL'}"
        f" ({time.time() - t0:.0f}s)",
        flush=True,
    )
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--fast",
        action="store_true",
        help="skip pytest and use sf0.001 for the correctness gates",
    )
    args = ap.parse_args()
    py = sys.executable
    sf = "/root/testdata/sf0.001" if args.fast else "/root/testdata/sf0.01"

    steps: list[tuple[str, list[str]]] = []
    if not args.fast:
        steps.append(("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"]))
    steps += [
        ("property gate", [py, "tools/property_gate.py"]),
        ("plan audit", [py, "tools/plan_audit.py"]),
        ("correctness (window)", [py, "tools/check_correctness.py", sf]),
        (
            "correctness (tail)",
            [
                py,
                "tools/check_correctness.py",
                "--tail",
                "--json",
                "CORRECTNESS_TAIL.json",
                sf,
            ],
        ),
        ("correctness (vanilla)", [py, "tools/check_correctness.py", "--vanilla", sf]),
    ]
    for label, cmd in steps:
        if not run(label, cmd):
            return 1
    print("== release gate: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
