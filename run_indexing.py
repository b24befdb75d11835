"""Convenience shim to run only the indexing workflow — twin of the
reference's ``run_indexing.py`` (reads the per-repo JSON catalog the
retrieval phase landed and loads it into the query engine; reference
``run_indexing.py:9-11``).

Scans ``--catalog`` with ``sources/catalog.scan_catalog(fmt="json")``
(repo_name recovered from the directory path — the indexer's
stamp-on-ingest contract), writes each logical table into the parquet
warehouse, and registers the spark.sql views.  ``--dry-run`` counts
the docs each table would index without writing (reference
``indexer.py:158-160``); ``--prefix`` namespaces every output table
and view (``indexer.py:128-129``).

    python run_indexing.py [--catalog DIR] [--out DIR] [--prefix p_] [--dry-run]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", default="/tmp/gdp_catalog")
    ap.add_argument("--out", default=None)
    ap.add_argument("--prefix", default="")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args(argv)

    from github_data_pipeline_spark.pipeline import register_views
    from github_data_pipeline_spark.session import get_spark
    from github_data_pipeline_spark.sources.catalog import (
        discover_repos,
        scan_catalog,
    )

    spark = get_spark("run-indexing", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    repos = discover_repos(args.catalog)
    if not repos:
        print(f"no repo dirs under {args.catalog}; run run_retrieval.py first")
        return
    table_names = sorted(
        {
            t
            for d in repos
            for t in os.listdir(os.path.join(args.catalog, d))
            if os.path.isdir(os.path.join(args.catalog, d, t))
        }
    )
    frames = {}
    for name in table_names:
        df = scan_catalog(spark, args.catalog, name, fmt="json")
        if df is not None:
            frames[name] = df

    if args.dry_run:
        print(f"(dry-run) would index {len(frames)} tables from {args.catalog}:")
        for name in sorted(frames):
            print(f"  (dry-run) {args.prefix}{name:28s} "
                  f"{frames[name].count():6d} docs")
        return

    out = args.out or os.path.join(tempfile.gettempdir(), "gdp_warehouse")
    print(f"indexing {len(frames)} tables from {args.catalog} -> {out}:")
    loaded = {}
    for name in sorted(frames):
        path = os.path.join(out, f"{args.prefix}{name}")
        frames[name].write.mode("overwrite").parquet(path)
        loaded[name] = spark.read.parquet(path)
        print(f"  {args.prefix}{name:28s} {loaded[name].count():6d} rows")
    register_views(spark, loaded, prefix=args.prefix)
    print(f"registered {len(loaded)} views (prefix={args.prefix!r})")


if __name__ == "__main__":
    main()
