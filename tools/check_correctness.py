"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and values — strictly cell-exact (stricter than any plausible
driver hash, so passing here means passing there).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from github_data_pipeline_spark.session import get_spark
    from github_data_pipeline_spark.testing import (
        diff_frames,
        register_duckdb_views,
        run_oracle,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-correctness", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, passed, rows_only = [], 0, []
    for name, builder in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(s_rows)))
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            d_cols, d_rows = run_oracle(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        msg = diff_frames(s_cols, s_rows, d_cols, d_rows)
        if msg is None:
            passed += 1
            print(f"ok   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append((name, msg))
            print(f"FAIL {name}: {msg}")

    print(
        f"\n{passed} exact-match, {len(rows_only)} rows-only, "
        f"{len(failures)} failed / {len(queries) if not only else len(only)} total"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
