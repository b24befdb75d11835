"""Full-lifecycle test: raw fixtures -> process_repo -> partitioned
parquet -> read back -> spark.sql analytics over registered views (the
nine-scenario surface), all through the public pipeline API."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.pipeline import (
    process_repo,
    register_views,
    write_repo_tables,
)
from github_data_pipeline_spark.sources.fixtures import REPO, load_fixtures


def test_pipeline_end_to_end(spark, tmp_path):
    fx = load_fixtures(spark)
    tables = process_repo(fx, REPO)
    assert set(tables) >= {
        "issues",
        "pull_requests",
        "commits",
        "prs_with_linked_issues",
        "issues_closed_by_commits",
        "cross_repo_links",
        "repo_blame",
    }

    # persist + reload round-trip (partitioned by repo_name)
    paths = write_repo_tables(tables, str(tmp_path / "warehouse"))
    reloaded = {n: spark.read.parquet(p) for n, p in paths.items()}
    assert reloaded["issues"].count() == 8
    assert reloaded["prs_with_linked_issues"].count() == 4

    # the spark.sql analytics surface over the reloaded warehouse
    register_views(spark, reloaded)

    s1 = spark.sql(
        """
        SELECT COUNT(*) AS total,
               SUM(CASE WHEN state = 'open' THEN 1 ELSE 0 END) AS open
        FROM issues
        """
    ).collect()[0]
    assert (s1["total"], s1["open"]) == (8, 4)

    s4 = spark.sql(
        f"""
        SELECT DISTINCT pr_number FROM pr_links
        WHERE referenced_repo = '{REPO}' AND issue_number = 155
        """
    ).collect()
    assert [r["pr_number"] for r in s4] == [104]

    s6 = spark.sql(
        """
        SELECT target.repo_name AS t, COUNT(*) AS refs
        FROM cross_repo_links GROUP BY 1 ORDER BY refs DESC, t
        """
    ).collect()
    assert [(r["t"], r["refs"]) for r in s6] == [
        ("other/repo", 2),
        ("ext/lib", 1),
    ]

    blame = spark.sql(
        """
        SELECT author, SUM(author_lines) AS lines
        FROM blame_authors GROUP BY author ORDER BY lines DESC, author
        """
    ).collect()
    assert [(r["author"], r["lines"]) for r in blame] == [
        ("dave", 11),
        ("Ann On", 5),
        ("erin", 5),
    ]


def test_pipeline_parallel_repos(spark, tmp_path):
    """Two repos through the same pipeline land in one partitioned
    warehouse and stay separable — the multi-repo fan-out the
    reference runs serially (runner.py:89-93)."""
    fx = load_fixtures(spark)
    t1 = process_repo(fx, REPO)
    issues2 = fx["issues_raw"].withColumn("repo_name", F.lit("acme/other"))
    t2 = process_repo({**fx, "issues_raw": issues2}, "acme/other")
    base = str(tmp_path / "wh")
    write_repo_tables({"issues": t1["issues"]}, base)
    from github_data_pipeline_spark.sources.sinks import write_table

    write_table(t2["issues"], f"{base}/issues", mode="append")
    back = spark.read.parquet(f"{base}/issues")
    per_repo = {
        r["repo_name"]: r["n"]
        for r in back.groupBy("repo_name").agg(F.count("*").alias("n")).collect()
    }
    assert per_repo == {REPO: 8, "acme/other": 8}
    # partition pruning: single-repo read touches one partition dir
    one = back.filter(F.col("repo_name") == "acme/other")
    assert one.count() == 8


def test_retrieval_indexing_shim_roundtrip(spark, tmp_path):
    """The reference's two-file entry-point split (run_retrieval.py /
    run_indexing.py): retrieval lands the per-repo JSON catalog,
    indexing scans it back with repo_name stamped from the path and
    row counts preserved."""
    import os

    from github_data_pipeline_spark.sources.catalog import scan_catalog
    from github_data_pipeline_spark.sources.sinks import write_json_artifact

    fixtures = load_fixtures(spark)
    tables = process_repo(fixtures, REPO)
    repo_dir = tmp_path / REPO.replace("/", "_")
    for name in ("issues", "commits", "cross_repo_links"):
        write_json_artifact(tables[name], str(repo_dir / name))
    for name in ("issues", "commits", "cross_repo_links"):
        back = scan_catalog(spark, str(tmp_path), name, fmt="json")
        assert back is not None
        assert back.count() == tables[name].count()
        assert back.select("repo_name").distinct().collect()[0][0] == REPO
    # the shims themselves parse argv and filter repos like the
    # reference (anything without '/' ignored; unknown repo = no-op)
    import run_retrieval

    run_retrieval.main(["not-a-repo", "ghost/repo", "--out", str(tmp_path / "x")])
    assert not os.path.exists(str(tmp_path / "x"))
