"""Convenience shim to run only the retrieval workflow — twin of the
reference's ``run_retrieval.py`` (its two-file entry-point split:
retrieval fetches GitHub data and lands per-repo JSON files; indexing
later reads that catalog).

Offline mode: processes the committed domain fixtures through
``pipeline.process_repo`` and lands every logical table as a
line-delimited JSON artifact under ``--out/<owner>_<repo>/<table>/``
— exactly the directory-catalog layout ``run_indexing.py`` (and
``sources/catalog.scan_catalog``) consumes.  Positional ``owner/repo``
arguments filter which repos run, mirroring the reference shim's
``"/" in arg`` filter (reference ``run_retrieval.py:10-13``); with
live credentials a ``GithubClient`` feeds the same ``process_repo``.

    python run_retrieval.py [owner/repo ...] [--out DIR] [--max-prs N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "repos",
        nargs="*",
        help="owner/repo filters; anything without a '/' is ignored "
        "(reference run_retrieval.py:12)",
    )
    ap.add_argument("--out", default="/tmp/gdp_catalog")
    ap.add_argument("--max-prs", type=int, default=0)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args(argv)

    from github_data_pipeline_spark.pipeline import process_repo
    from github_data_pipeline_spark.session import get_spark
    from github_data_pipeline_spark.sources.fixtures import REPO, load_fixtures
    from github_data_pipeline_spark.sources.sinks import write_json_artifact

    wanted = [a for a in args.repos if "/" in a] or None
    if wanted is not None and REPO not in wanted:
        print(f"no fixture data for {wanted}; available: {REPO}")
        return

    spark = get_spark("run-retrieval", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    fixtures = load_fixtures(spark)
    tables = process_repo(fixtures, REPO, max_prs=args.max_prs)
    repo_dir = os.path.join(args.out, REPO.replace("/", "_"))
    print(f"retrieval: {REPO} -> {len(tables)} JSON artifacts under {repo_dir}")
    for name in sorted(tables):
        path = os.path.join(repo_dir, name)
        write_json_artifact(tables[name], path)
        print(f"  {name:28s} {tables[name].count():6d} docs")


if __name__ == "__main__":
    main()
