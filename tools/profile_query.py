"""Execution profile for a registry query: wall time plus the final
adaptive physical plan (post-AQE: real partition counts, join
strategies chosen at runtime) and a structural summary — the evidence
behind the scale claims (what broadcast, what shuffled, how often).

Usage:  python tools/profile_query.py QUERY_NAME [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_plans()[name]
    df = q.builder(spark, sf_dir)
    t0 = time.time()
    n = len(df.collect())  # execute THIS plan (AQE finalizes it)
    wall = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()

    counts = {
        "shuffle exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcast exchanges": plan.count("BroadcastExchange"),
        "sort-merge joins": plan.count("SortMergeJoin"),
        "broadcast joins": plan.count("BroadcastHashJoin"),
        "parquet scans": plan.count("Scan parquet"),
        "whole-stage codegen spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python (Arrow) stages": plan.count("MapInPandas")
        + plan.count("ArrowEval"),
    }
    print(f"{name}: {n} rows in {wall:.2f}s at {sf_dir}")
    for k, v in counts.items():
        print(f"  {k}: {v}")
    print("\n--- final adaptive plan ---")
    print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
