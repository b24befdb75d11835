#!/usr/bin/env python
"""Pre-release hygiene gate for the randomized property tests.

The round-4 batched-BPE bug shipped because a Hypothesis test passed at
commit time under one seed and failed later under another.  This gate
reruns every Hypothesis-based test module with N fresh random seeds,
then one final pass with a raised example budget
(``SPARK_GRAFT_HYPO_EXAMPLES``), and exits non-zero on the first red
run.  Referenced from README's release checklist; run before declaring
a round done:

    python tools/property_gate.py            # 3 seeds + 1 thorough pass
    python tools/property_gate.py --seeds 5 --examples 400
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

PROPERTY_TESTS = [
    "tests/test_bpe.py",
    "tests/test_refs_property.py",
    "tests/test_porter.py",
    "tests/test_fulltext.py",
    "tests/test_plan_properties.py",
    # funnel: chained-min-ts construction vs the sequential-scan model
    "tests/test_temporal.py::test_funnel_matches_sequential_model",
    # classifier gate: fuzzed Spark==DuckDB parity (tokenizer edges +
    # integral division)
    "tests/test_classifier_plans.py::test_linear_gate_parity_property",
    # winnowing: SIGMOD'03 shared-substring guarantee + selection
    # soundness on the pure-Python reference the Spark plan is pinned to
    "tests/test_winnow.py",
    # dq audit: fuzzed star schemas (NULL FKs, dup pks, two-direction
    # orphans, NULL/out-of-range domains) vs the engine-free Python spec
    "tests/test_audit_plans.py::test_audit_matches_python_property",
]


def run(extra_args: list[str], env_overrides: dict[str, str], label: str) -> bool:
    env = dict(os.environ, **env_overrides)
    cmd = [sys.executable, "-m", "pytest", "-q", *PROPERTY_TESTS, *extra_args]
    print(f"== property gate: {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, env=env)
    ok = proc.returncode == 0
    print(f"== property gate: {label}: {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3,
                    help="number of fresh-random-seed passes")
    ap.add_argument("--examples", type=int, default=200,
                    help="raised example budget for the final thorough pass")
    args = ap.parse_args()

    for i in range(args.seeds):
        if not run(["--hypothesis-seed=random"], {}, f"fresh seed {i + 1}/{args.seeds}"):
            return 1
    if not run(
        ["--hypothesis-seed=random"],
        {"SPARK_GRAFT_HYPO_EXAMPLES": str(args.examples)},
        f"thorough ({args.examples} examples)",
    ):
        return 1
    print("== property gate: ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
