"""Reference-parity tests for the GitHub-domain operators.

Mirrors the reference's unit-test semantics (tests/test_linkers.py,
tests/test_collectors.py) and its nine golden analytics scenarios
(docs/test_scenario.md) over the deterministic fixtures in
sources/fixtures.py — expectations are hand-derived from the
reference's Python implementation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.functions.refs import extract_issue_refs
from github_data_pipeline_spark.operators.blame import (
    blame_author_totals,
    blame_file_rollup,
)
from github_data_pipeline_spark.operators.ingest import (
    contributions_from_commits,
    enrich_commit_files,
    split_issues_feed,
)
from github_data_pipeline_spark.operators.linkers import (
    find_cross_repo_links,
    find_issues_closed_by_commits,
    find_prs_with_linked_issues,
)
from github_data_pipeline_spark.sources.fixtures import REPO, load_fixtures


@pytest.fixture(scope="module")
def fx(spark):
    return load_fixtures(spark)


@pytest.fixture(scope="module")
def issues(fx):
    return split_issues_feed(fx["issues_raw"])


@pytest.fixture(scope="module")
def commits(fx):
    return enrich_commit_files(fx["commits_raw"])


@pytest.fixture(scope="module")
def pr_links(fx, issues, commits):
    df = find_prs_with_linked_issues(
        fx["pull_requests"],
        fx["pr_commits"],
        commits,
        issues,
        REPO,
        external_issue_authors=fx["external_issue_authors"],
    )
    return {r["pr_number"]: r.asDict(recursive=True) for r in df.collect()}


# --- ref extraction (reference test_linkers.py:12-17) -------------------


def test_extract_refs_keywords_and_cross_repo(spark):
    df = spark.createDataFrame(
        [("Fixes #1 and closes other/repo#2!",)], "text string"
    ).select(extract_issue_refs("text").alias("refs"))
    refs = df.collect()[0]["refs"]
    seen = {(r["full_repo"], r["number"]) for r in refs}
    assert (None, 1) in seen and ("other/repo", 2) in seen
    assert all(r["has_closing_kw"] for r in refs)


def test_sentence_scoped_keyword_inheritance(spark):
    # kw not adjacent to the ref, but in the same sentence -> inherited;
    # refs in other sentences don't inherit (linkers.py:35-46)
    text = "This fixes the bug #7 nicely. Unrelated mention #9 here."
    refs = (
        spark.createDataFrame([(text,)], "text string")
        .select(extract_issue_refs("text").alias("r"))
        .collect()[0]["r"]
    )
    by_num = {r["number"]: r["has_closing_kw"] for r in refs}
    assert by_num == {7: True, 9: False}


# --- ingest (reference test_collectors.py:73-77) ------------------------


def test_issue_feed_pr_filter(fx, issues):
    assert fx["issues_raw"].count() == 9
    nums = {r["number"] for r in issues.select("number").collect()}
    assert 99 not in nums and len(nums) == 8


def test_commit_files_enrichment(commits):
    row = commits.filter(F.col("sha") == "c1").collect()[0]
    assert row["files_changed"] == ["a.py", "b.py"]
    assert row["files_changed_count"] == 2


def test_contributions_recompute(commits):
    got = {
        r["login"]: r["contributions"]
        for r in contributions_from_commits(commits).collect()
    }
    assert got["dave"] == 2  # c1 + c8
    assert got["grace"] == 1


# --- PR link mining (reference test_linkers.py:24-98) -------------------


def test_pr_links_output_set(pr_links):
    # 103 (no refs), 105 (no refs), 107 (invalid merge sha quirk) drop
    assert set(pr_links) == {101, 102, 104, 106}


def test_pr_links_text_and_commit_refs(pr_links):
    links = pr_links[101]["links"]
    assert [
        (l["reference_type"], l["issue_number"], l["has_closing_kw"],
         l["would_auto_close"], l["issue_author"])
        for l in links
    ] == [
        ("pr_text", 1, True, True, "alice"),
        ("commit_message", 1, True, True, "alice"),
    ]
    assert pr_links[101]["merged"] is True


def test_pr_links_cross_repo_and_sentence_scope(pr_links):
    links = pr_links[102]["links"]
    assert [
        (l["referenced_repo"], l["issue_number"], l["has_closing_kw"],
         l["issue_author"])
        for l in links
    ] == [
        ("other/repo", 2, True, "ext-pr-author"),
        (REPO, 5, False, "alice"),
    ]
    # not merged -> never auto-closes even with the keyword
    assert all(not l["would_auto_close"] for l in links)


def test_pr_links_merge_commit_scan(pr_links):
    links = pr_links[106]["links"]
    assert [(l["reference_type"], l["referenced_repo"], l["issue_number"]) for l in links] == [
        ("pr_text", REPO, 33),
        ("commit_message", REPO, 2),
        ("merge_commit_message", "ext/lib", 7),
    ]
    by_type = {l["reference_type"]: l for l in links}
    assert by_type["merge_commit_message"]["has_closing_kw"] is True
    assert by_type["merge_commit_message"]["issue_author"] == "libber"


def test_pr_links_max_prs_keeps_newest(fx, issues, commits):
    df = find_prs_with_linked_issues(
        fx["pull_requests"], fx["pr_commits"], commits, issues, REPO, max_prs=2
    )
    # newest two PRs by created_at are 107 (dropped: invalid sha) and 106
    assert {r["pr_number"] for r in df.select("pr_number").collect()} == {106}


# --- commit-close mining (reference test_linkers.py:71-81) --------------


def test_issues_closed_by_commits(fx, issues, commits):
    df = find_issues_closed_by_commits(
        commits, issues, REPO, external_issue_authors=fx["external_issue_authors"]
    )
    rows = {
        (r["commit_sha"], r["referenced_repo"], r["issue_number"]): r
        for r in df.collect()
    }
    assert set(rows) == {
        ("c1", REPO, 1),
        ("c2", REPO, 2),
        ("c3", "other/repo", 2),
        ("c7", REPO, 133),
        ("c8", REPO, 133),
        ("mc106", "ext/lib", 7),
    }
    # null author object -> git author name fallback (collectors.py:42-48)
    assert rows[("c2", REPO, 2)]["commit_author"] == "Ann On"
    assert rows[("c3", "other/repo", 2)]["issue_author"] == "ext-pr-author"
    assert all(
        r["has_closing_kw"] and r["would_auto_close"]
        and r["reference_type"] == "commit_message"
        for r in rows.values()
    )


# --- cross-repo links (reference test_linkers.py:84-98) -----------------


def test_cross_repo_links(fx, issues):
    df = find_cross_repo_links(
        issues, fx["pull_requests"], REPO, target_details=fx["target_details"]
    )
    rows = [r.asDict(recursive=True) for r in df.collect()]
    keyed = {
        (r["source"]["type"], r["source"]["number"],
         r["target"]["repo_name"], r["target"]["number"]): r
        for r in rows
    }
    assert set(keyed) == {
        ("issue", 1, "other/repo", 1),
        ("issue", 33, "ext/lib", 7),
        ("pull_request", 102, "other/repo", 2),
    }
    t = keyed[("pull_request", 102, "other/repo", 2)]["target"]
    assert t["type"] == "pull_request" and t["author"] == "ext-pr-author"
    u = keyed[("issue", 33, "ext/lib", 7)]
    assert u["reference"]["found_in"] == "issue_body"
    assert u["target"]["type"] == "issue"
    # no self-referencing rows ever (linkers.py:277-278)
    assert all(
        r["target"]["repo_name"].lower() != REPO for r in rows
    )


def test_cross_repo_unresolved_target_classifies_issue(fx, issues):
    df = find_cross_repo_links(issues, fx["pull_requests"], REPO, None)
    t = {
        (r["target"]["repo_name"], r["target"]["number"]): r["target"]
        for r in df.collect()
    }
    assert t[("other/repo", 1)]["type"] == "issue"
    assert t[("other/repo", 1)]["author"] is None


# --- blame rollup (reference test_collectors.py:48-63) ------------------


def test_blame_file_rollup(fx, commits):
    docs = {
        r["path"]: r.asDict(recursive=True)
        for r in blame_file_rollup(fx["blame_ranges"], commits).collect()
    }
    a = docs["a.py"]
    assert a["total_lines"] == 16 and a["ranges_count"] == 3
    assert [(x["author"], x["total_lines"]) for x in a["authors"]] == [
        ("dave", 11),
        ("Ann On", 5),
    ]
    dave_ranges = a["authors"][0]["ranges"]
    assert [(r["start"], r["end"], r["count"]) for r in dave_ranges] == [
        (1, 10, 10),
        (16, 16, 1),
    ]
    mc = dave_ranges[0]["matching_commit"]
    assert mc["files_changed"] == ["a.py", "b.py"] and mc["files_changed_count"] == 2
    assert [e["lines"]["start"] for e in a["examples"]] == [1, 11, 16]
    b = docs["b.py"]
    assert b["total_lines"] == 5
    assert b["authors"][0]["author"] == "erin"


def test_blame_author_totals(fx):
    got = {
        (r["author"]): (r["total_lines"], r["ranges_count"])
        for r in blame_author_totals(fx["blame_ranges"]).collect()
    }
    assert got == {"dave": (11, 2), "Ann On": (5, 1), "erin": (5, 1)}


# --- the nine golden scenarios (docs/test_scenario.md) ------------------


def test_scenario_1_open_vs_closed(issues):
    r = issues.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("state") == "open", 1).otherwise(0)).alias("open"),
        F.sum(F.when(F.col("state") == "closed", 1).otherwise(0)).alias("closed"),
    ).collect()[0]
    assert (r["total"], r["open"], r["closed"]) == (8, 4, 4)


def test_scenario_2_comments_for_issue(issues):
    assert issues.filter(F.col("number") == 25).collect()[0]["comments"] == 1


def test_scenario_3_distinct_authors(issues):
    assert issues.agg(F.countDistinct("user.login")).collect()[0][0] == 7


def test_scenario_4_pr_fixing_issue(fx, issues, commits):
    links = find_prs_with_linked_issues(
        fx["pull_requests"], fx["pr_commits"], commits, issues, REPO
    )
    hit = (
        links.select("pr_number", F.explode("links").alias("l"))
        .filter(
            (F.col("l.referenced_repo") == REPO)
            & (F.col("l.issue_number") == 155)
        )
        .select("pr_number")
        .distinct()
        .collect()
    )
    assert [r["pr_number"] for r in hit] == [104]


def test_scenario_5_commits_closing_issue(fx, issues, commits):
    closed = find_issues_closed_by_commits(commits, issues, REPO)
    shas = {
        r["commit_sha"]
        for r in closed.filter(
            (F.col("referenced_repo") == REPO) & (F.col("issue_number") == 133)
        ).collect()
    }
    assert shas == {"c7", "c8"}


def test_scenario_6_cross_repo_hotspots(fx, issues):
    links = find_cross_repo_links(
        issues, fx["pull_requests"], REPO, fx["target_details"]
    )
    top = (
        links.groupBy(F.col("target.repo_name").alias("t"))
        .count()
        .orderBy(F.desc("count"), F.asc("t"))
        .collect()
    )
    assert [(r["t"], r["count"]) for r in top] == [("other/repo", 2), ("ext/lib", 1)]


def test_scenario_7_commit_time_range(commits):
    r = commits.agg(
        F.min("commit.author.date").alias("lo"),
        F.max("commit.author.date").alias("hi"),
    ).collect()[0]
    assert r["lo"] == "2014-12-01T03:00:00Z"
    assert r["hi"] == "2024-08-23T16:24:18Z"


def test_scenario_8_links_by_source_type(fx, issues):
    links = find_cross_repo_links(
        issues, fx["pull_requests"], REPO, fx["target_details"]
    )
    agg = {
        r["t"]: (r["from_issues"], r["from_prs"])
        for r in links.groupBy(F.col("target.repo_name").alias("t"))
        .agg(
            F.sum(
                F.when(F.col("source.type") == "issue", 1).otherwise(0)
            ).alias("from_issues"),
            F.sum(
                F.when(F.col("source.type") == "pull_request", 1).otherwise(0)
            ).alias("from_prs"),
        )
        .collect()
    }
    assert agg == {"other/repo": (1, 1), "ext/lib": (1, 0)}


def test_scenario_9_lifecycle_coverage(fx, issues, commits):
    links = find_prs_with_linked_issues(
        fx["pull_requests"], fx["pr_commits"], commits, issues, REPO
    )
    pr_linked = (
        links.select(F.explode("links").alias("l"))
        .filter(F.col("l.referenced_repo") == REPO)
        .select("l.issue_number")
        .distinct()
        .count()
    )
    commit_closed = (
        find_issues_closed_by_commits(commits, issues, REPO)
        .filter(F.col("referenced_repo") == REPO)
        .select("issue_number")
        .distinct()
        .count()
    )
    assert pr_linked == 5  # issues 1, 2, 5, 33, 155
    assert commit_closed == 3  # issues 1, 2, 133


def test_blame_file_limit(fx, commits):
    capped = blame_file_rollup(fx["blame_ranges"], commits, max_files=1)
    assert [r["path"] for r in capped.select("path").collect()] == ["a.py"]
