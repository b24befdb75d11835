"""Custom stateful streaming (applyInPandasWithState), catalog scan,
GraphQL client method, blame nested/exploded roundtrip."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from github_data_pipeline_spark.sources.catalog import (
    discover_repos,
    repo_name_from_dir,
    scan_catalog,
)
from github_data_pipeline_spark.sources.github_client import (
    GithubClient,
    GithubClientConfig,
    Response,
)
from github_data_pipeline_spark.streaming.jobs import read_events_stream
from github_data_pipeline_spark.streaming.stateful import user_ledger_stream


def test_stateful_user_ledger_matches_batch(spark, sf_dir):
    stream = user_ledger_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("ledger_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # last update per user == full-history totals
    got = {
        r["user_id"]: (r["total_events"], r["total_value_cents"])
        for r in spark.sql(
            "SELECT user_id, total_events, total_value_cents FROM ledger_t"
        ).collect()
    }
    from github_data_pipeline_spark.functions.money import cents
    from github_data_pipeline_spark.sources.tables import load_table

    want = {
        r["user_id"]: (r["n"], r["c"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("c"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_catalog_scan_multi_repo(spark, tmp_path):
    base = str(tmp_path / "output")
    for d, rows in {
        "octo_hello": [{"number": 1, "state": "open"}],
        "ada_math-lib": [{"number": 2, "state": "closed"},
                         {"number": 3, "state": "open"}],
    }.items():
        p = os.path.join(base, d, "issues")
        os.makedirs(p)
        with open(os.path.join(p, "part-0.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    assert discover_repos(base) == ["ada_math-lib", "octo_hello"]
    assert repo_name_from_dir("ada_math-lib") == "ada/math-lib"
    df = scan_catalog(
        spark, base, "issues", fmt="json", schema="number int, state string"
    )
    got = {
        (r["repo_name"], r["number"]) for r in df.collect()
    }
    assert got == {("octo/hello", 1), ("ada/math-lib", 2), ("ada/math-lib", 3)}


def test_catalog_scan_missing_table(spark, tmp_path):
    assert scan_catalog(spark, str(tmp_path / "nope"), "issues") is None


def test_graphql_method():
    seen = {}

    def transport(method, url, headers, body=None):
        seen.update(method=method, url=url, body=body)
        return Response(200, {}, {"data": {"repository": {"ok": True}}})

    c = GithubClient(transport, GithubClientConfig(tokens=("t",)),
                     sleeper=lambda s: None)
    data = c.graphql("https://api.x/graphql", "query($o:String!){...}", {"o": "x"})
    assert data == {"repository": {"ok": True}}
    assert seen["method"] == "POST"
    assert json.loads(seen["body"])["variables"] == {"o": "x"}


def test_graphql_errors_return_empty():
    c = GithubClient(
        lambda m, u, h, b=None: Response(200, {}, {"errors": [{"message": "x"}]}),
        GithubClientConfig(tokens=("t",)), sleeper=lambda s: None,
    )
    assert c.graphql("u", "q", {}) == {}


def test_list_repo_files_blob_filter():
    tree = {"tree": [
        {"path": "a.py", "type": "blob"},
        {"path": "dir", "type": "tree"},
        {"path": "b.md", "type": "blob"},
        {"type": "blob"},  # no path -> dropped
    ]}
    c = GithubClient(lambda m, u, h, b=None: Response(200, {}, tree),
                     GithubClientConfig(), sleeper=lambda s: None)
    assert c.list_repo_files("https://api.x", "o", "r", "main") == ["a.py", "b.md"]


def test_blame_nested_split_roundtrip(spark):
    """Nested per-file docs -> exploded rows reproduce the flat totals
    (the indexer's big-doc splitter, indexer.py:87-112)."""
    from github_data_pipeline_spark.operators.blame import (
        blame_author_totals,
        blame_file_rollup,
    )
    from github_data_pipeline_spark.sources.fixtures import load_fixtures

    fx = load_fixtures(spark)
    nested = blame_file_rollup(fx["blame_ranges"], None)
    # split: one row per (file, author) from the nested doc
    split = nested.select(
        "repo_name", "path", F.explode("authors").alias("a")
    ).select("repo_name", "path", "a.author", "a.total_lines")
    recombined = split.groupBy("repo_name", "author").agg(
        F.sum("total_lines").alias("total_lines")
    )
    flat = blame_author_totals(fx["blame_ranges"]).select(
        "repo_name", "author", "total_lines"
    )
    got = {(r["author"], r["total_lines"]) for r in recombined.collect()}
    want = {(r["author"], r["total_lines"]) for r in flat.collect()}
    assert got == want


def test_read_json_robust_quarantines_bad_lines(spark, tmp_path):
    from github_data_pipeline_spark.sources.catalog import read_json_robust

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": 3, "name": "truncated mid-wri\n'
        'not json at all\n'
        '{"id": "not-a-number", "name": "type clash"}\n'
    )
    good, bad = read_json_robust(spark, str(p), "id bigint, name string")
    rows = sorted((r["id"], r["name"]) for r in good.collect())
    assert rows == [(1, "ok"), (2, "also ok")]
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 3
    assert any("truncated" in r for r in raws)
    assert any("not-a-number" in r for r in raws)  # schema clash quarantined too
