"""Dump ``explain("formatted")`` for registry queries to files.

Round-12 optimization evidence: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters, Python stages)
against committed ``plans/<round>/<query>_<tag>.txt`` files (round dir
from $SPARK_GRAFT_PLANS_ROUND, default r13).

Usage:  python tools/explain_dump.py TAG QUERY [QUERY ...]
        python tools/explain_dump.py TAG --all
        # TAG is 'before' or 'after'; files land in plans/$ROUND/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_plans()
    if names == ["--all"]:
        names = [q.name for q in registry if q.oracle is not None]
    for name in names:
        df = registry[name].builder(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(text)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
