"""Time a subset of registry queries with the bench methodology.

Same measurement discipline as bench.py (noop sink, one sf0.001 +
one target-SF untimed warm pass, then two timed passes, min-of-2) so
per-query numbers here are comparable to the full bench — used to
iterate on optimizations without paying the full 158-query run.

Usage:  python tools/bench_subset.py QUERY [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-subset", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_plans()

    smallest = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = smallest if os.path.isdir(smallest) else sf_dir
    from bench import _drop_leftover_rdd_blocks

    for d in (warm_dir, sf_dir):
        for n in names:
            registry[n].builder(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            _drop_leftover_rdd_blocks(spark)

    timings: dict[str, float] = {}
    for _ in range(2):
        for n in names:
            spark.sparkContext.setJobDescription(f"subset:{n}")
            t0 = time.time()
            registry[n].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = round(time.time() - t0, 3)
            # same untimed inter-query hygiene as bench.py (blocks of
            # finished queries otherwise crowd later hash-aggs)
            _drop_leftover_rdd_blocks(spark)
            timings[n] = min(el, timings.get(n, el))
    print(json.dumps({"queries": timings, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
