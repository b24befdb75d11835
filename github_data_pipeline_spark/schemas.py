"""Typed StructType schemas for the nine logical GitHub tables.

The Spark analog of the reference's Elasticsearch mappings
(``src/indexing/schema.py:32-300``): the analytic columns are pinned
and fully typed (the reference leaves nested objects dynamic; we make
them explicit structs per SURVEY.md §1.2). Every table carries
``repo_name`` — the universal join key the reference stamps on every
record (``src/retrieval/http_client.py:407-408``).

Timestamps stay as GitHub wire-format strings at the storage boundary
(second-granularity UTC, ``collectors.py:455-465``) and are parsed with
functions/timestamps.parse_gh_ts where comparisons happen.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


USER = _s(_f("login", StringType()), _f("id", LongType()))

LICENSE = _s(
    _f("key", StringType()), _f("name", StringType()), _f("spdx_id", StringType())
)

REPO_META = _s(
    _f("repo_name", StringType(), False),
    _f("id", LongType()),
    _f("name", StringType()),
    _f("full_name", StringType()),
    _f("private", BooleanType()),
    _f("fork", BooleanType()),
    _f("description", StringType()),
    _f("homepage", StringType()),
    _f("language", StringType()),
    _f("topics", ArrayType(StringType())),
    _f("default_branch", StringType()),
    _f("created_at", StringType()),
    _f("updated_at", StringType()),
    _f("pushed_at", StringType()),
    _f("stargazers_count", IntegerType()),
    _f("watchers_count", IntegerType()),
    _f("forks_count", IntegerType()),
    _f("open_issues_count", IntegerType()),
    _f("size", IntegerType()),
    _f(
        "owner",
        _s(_f("login", StringType()), _f("id", LongType()), _f("type", StringType())),
    ),
    _f("license", LICENSE),
)

ISSUES = _s(
    _f("repo_name", StringType(), False),
    _f("id", LongType()),
    _f("number", IntegerType(), False),
    _f("state", StringType()),
    _f("title", StringType()),
    _f("body", StringType()),
    _f("user", USER),
    _f("labels", ArrayType(_s(_f("name", StringType()), _f("color", StringType())))),
    _f("assignees", ArrayType(_s(_f("login", StringType())))),
    _f("milestone", _s(_f("title", StringType()))),
    _f("comments", IntegerType()),
    _f("author_association", StringType()),
    # dynamic-key reaction counts ("+1", "heart", ...) — the one truly
    # dynamic object in the reference mappings (schema.py:89), per
    # SURVEY §1.2 mapped to MAP<STRING,BIGINT> rather than a struct
    _f("reactions", MapType(StringType(), LongType())),
    _f("state_reason", StringType()),
    _f("created_at", StringType()),
    _f("updated_at", StringType()),
    _f("closed_at", StringType()),
    _f("html_url", StringType()),
    # non-null marks the row as a PR masquerading in the issues feed;
    # the ingest filter drops those (reference collectors.py:590)
    _f("pull_request", _s(_f("url", StringType()))),
)

PULL_REQUESTS = _s(
    _f("repo_name", StringType(), False),
    _f("id", LongType()),
    _f("number", IntegerType(), False),
    _f("state", StringType()),
    _f("locked", BooleanType()),
    _f("draft", BooleanType()),
    _f("title", StringType()),
    _f("body", StringType()),
    _f("user", USER),
    _f("created_at", StringType()),
    _f("updated_at", StringType()),
    _f("closed_at", StringType()),
    _f("merged_at", StringType()),
    _f("merge_commit_sha", StringType()),
    _f("labels", ArrayType(_s(_f("name", StringType())))),
    _f("assignees", ArrayType(_s(_f("login", StringType())))),
    _f("requested_reviewers", ArrayType(_s(_f("login", StringType())))),
    _f("head", _s(_f("ref", StringType()), _f("sha", StringType()))),
    _f("base", _s(_f("ref", StringType()), _f("sha", StringType()))),
    _f("author_association", StringType()),
    _f("html_url", StringType()),
)

GIT_ACTOR = _s(
    _f("name", StringType()), _f("email", StringType()), _f("date", StringType())
)

COMMIT_FILE = _s(
    _f("filename", StringType()),
    _f("status", StringType()),
    _f("additions", IntegerType()),
    _f("deletions", IntegerType()),
    _f("previous_filename", StringType()),
)

COMMITS = _s(
    _f("repo_name", StringType(), False),
    _f("sha", StringType(), False),
    _f("node_id", StringType()),
    _f(
        "commit",
        _s(
            _f("message", StringType()),
            _f("author", GIT_ACTOR),
            _f("committer", GIT_ACTOR),
        ),
    ),
    _f("author", USER),
    _f("committer", USER),
    _f("parents", ArrayType(_s(_f("sha", StringType())))),
    _f("files", ArrayType(COMMIT_FILE)),
    _f(
        "stats",
        _s(
            _f("additions", IntegerType()),
            _f("deletions", IntegerType()),
            _f("total", IntegerType()),
        ),
    ),
    _f("files_changed", ArrayType(StringType())),
    _f("files_changed_count", IntegerType()),
    _f("html_url", StringType()),
)

ISSUE_COMMENTS = _s(
    # the comments endpoint is a per-issue point lookup
    # (reference collectors.py:660-663); repo_name and issue_number are
    # stamped from the request context like every other table's repo_name
    _f("repo_name", StringType(), False),
    _f("issue_number", IntegerType(), False),
    _f("id", LongType()),
    _f("user", USER),
    _f("body", StringType()),
    _f("author_association", StringType()),
    _f("created_at", StringType()),
    _f("updated_at", StringType()),
    _f("html_url", StringType()),
)

CONTRIBUTORS = _s(
    _f("repo_name", StringType(), False),
    _f("login", StringType(), False),
    _f("id", LongType()),
    _f("type", StringType()),
    _f("site_admin", BooleanType()),
    _f("contributions", IntegerType()),
    _f("html_url", StringType()),
)

PR_LINK = _s(
    _f("referenced_repo", StringType()),
    _f("issue_number", IntegerType()),
    _f("reference_type", StringType()),
    _f("has_closing_kw", BooleanType()),
    _f("would_auto_close", BooleanType()),
    _f("issue_author", StringType()),
)

PRS_WITH_LINKED_ISSUES = _s(
    _f("repo_name", StringType(), False),
    _f("pr_number", IntegerType(), False),
    _f("title", StringType()),
    _f("author", StringType()),
    _f("state", StringType()),
    _f("merged", BooleanType()),
    _f("url", StringType()),
    _f("created_at", StringType()),
    _f("links", ArrayType(PR_LINK)),
)

ISSUES_CLOSED_BY_COMMITS = _s(
    _f("repo_name", StringType(), False),
    _f("commit_sha", StringType(), False),
    _f("commit_url", StringType()),
    _f("commit_author", StringType()),
    _f("referenced_repo", StringType()),
    _f("issue_number", IntegerType(), False),
    _f("issue_author", StringType()),
    _f("reference_type", StringType()),
    _f("has_closing_kw", BooleanType()),
    _f("would_auto_close", BooleanType()),
)

LINK_ENDPOINT = _s(
    _f("repo_name", StringType()),
    _f("type", StringType()),
    _f("number", IntegerType()),
    _f("url", StringType()),
    _f("created_at", StringType()),
)

CROSS_REPO_LINKS = _s(
    _f("source", LINK_ENDPOINT),
    _f(
        "reference",
        _s(
            _f("found_in", StringType()),
            _f("seen_at", StringType()),
            _f("cross_ref_timestamp", StringType()),
        ),
    ),
    _f(
        "target",
        _s(
            _f("repo_name", StringType()),
            _f("type", StringType()),
            _f("number", IntegerType()),
            _f("url", StringType()),
            _f("created_at", StringType()),
            _f("author", StringType()),
        ),
    ),
)

BLAME_RANGE_INPUT = _s(
    _f("repo_name", StringType(), False),
    _f("ref", StringType()),
    _f("path", StringType(), False),
    _f("startingLine", IntegerType()),
    _f("endingLine", IntegerType()),
    _f("age", IntegerType()),
    _f(
        "commit",
        _s(
            _f("oid", StringType()),
            _f("committedDate", StringType()),
            _f("message", StringType()),
            _f(
                "author",
                _s(
                    _f("name", StringType()),
                    _f("email", StringType()),
                    _f("user", _s(_f("login", StringType()))),
                ),
            ),
        ),
    ),
)

SCHEMAS: dict[str, StructType] = {
    "repo_meta": REPO_META,
    "issues": ISSUES,
    "pull_requests": PULL_REQUESTS,
    "commits": COMMITS,
    "contributors": CONTRIBUTORS,
    "issue_comments": ISSUE_COMMENTS,
    "prs_with_linked_issues": PRS_WITH_LINKED_ISSUES,
    "issues_closed_by_commits": ISSUES_CLOSED_BY_COMMITS,
    "cross_repo_links": CROSS_REPO_LINKS,
    "blame_ranges": BLAME_RANGE_INPUT,
}
