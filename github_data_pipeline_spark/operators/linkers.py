"""Derived-dataset linkers as declarative DataFrame transforms.

Re-implements the reference's relationship mining
(``src/retrieval/linkers.py:55-320``) Spark-first: the per-PR Python
loops become explode/join/group pipelines; the fetch-and-memoize
lookups become distinct-key left joins against dimension DataFrames.

Semantics pinned to the reference:

* refs extracted per sentence with closing-keyword inheritance
  (functions/refs.py; linkers.py:29-52);
* bare ``#N`` refs default to the scanning repo (linkers.py:87);
* ``would_auto_close = merged AND has_closing_kw`` (linkers.py:94);
* merge-commit messages scanned only when ``merge_commit_sha`` is set
  and the body is absent/short/squash-free (linkers.py:112-113); a
  merge sha that resolves to no commit drops the whole PR — the
  reference's ``invalid_sha -> continue`` quirk (linkers.py:114-116);
* link order inside a PR is pr_text -> commit_message ->
  merge_commit_message, text order within each (encoded as explicit
  sort keys — Spark rows are unordered, SURVEY §7 hard-part 3);
* issue authors resolve from local issues first, then an optional
  external lookup table (the offline stand-in for the API fetch).

Scale: every lookup is a broadcast-able dimension join; ref extraction
is map-side codegen; the only wide exchange is the final per-PR group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.refs import extract_cross_repo_refs, extract_issue_refs

_BUCKET_ORDER = {"pr_text": 0, "commit_message": 1, "merge_commit_message": 2}


def _refs_from(
    df: DataFrame, text: F.Column, bucket: str, extra: list[str]
) -> DataFrame:
    """Explode per-row issue refs with (bucket, position) order keys.

    The text expression is staged as a NAMED projection so the big
    sentence-split/regex extraction tree is built via the string-keyed
    memoized path (functions/colcache.py): passing the Column directly
    bypassed the cache and rebuilt the ~3k-round-trip fragment on
    every builder call (r13 profile; guide §5.3). The optimizer
    collapses the extra projection, so the plan is unchanged."""
    staged = df.select(*extra, text.alias("_ref_text"))
    return staged.select(
        *extra,
        F.lit(_BUCKET_ORDER[bucket]).alias("bucket_order"),
        F.posexplode(extract_issue_refs("_ref_text")).alias("ref_pos", "ref"),
    ).select(
        *extra,
        "bucket_order",
        "ref_pos",
        F.col("ref.full_repo").alias("full_repo"),
        F.col("ref.number").alias("issue_number"),
        F.col("ref.has_closing_kw").alias("has_closing_kw"),
        F.lit(bucket).alias("reference_type"),
    )


def _issue_author_lookup(
    issues: DataFrame | None,
    repo_name: str,
    external_issue_authors: DataFrame | None,
) -> DataFrame | None:
    """(ref_repo_lc, issue_number) -> issue_author; local issues first,
    then the external table (reference seeds the cache locally and only
    fetches misses, linkers.py:74-76, 136-145)."""
    parts = []
    if issues is not None:
        parts.append(
            issues.select(
                F.lit(repo_name.lower()).alias("ref_repo_lc"),
                F.col("number").alias("issue_number"),
                F.col("user.login").alias("issue_author"),
                F.lit(0).alias("prio"),
            )
        )
    if external_issue_authors is not None:
        parts.append(
            external_issue_authors.select(
                F.lower(F.col("repo_name")).alias("ref_repo_lc"),
                F.col("number").alias("issue_number"),
                F.col("author").alias("issue_author"),
                F.lit(1).alias("prio"),
            )
        )
    if not parts:
        return None
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    # local wins over external on key collision
    return (
        merged.groupBy("ref_repo_lc", "issue_number")
        .agg(
            F.min_by(F.col("issue_author"), F.col("prio")).alias("issue_author")
        )
    )


def find_prs_with_linked_issues(
    prs: DataFrame,
    pr_commits: DataFrame | None,
    commits: DataFrame | None,
    issues: DataFrame | None,
    repo_name: str,
    max_prs: int = 0,
    external_issue_authors: DataFrame | None = None,
) -> DataFrame:
    """PRs -> nested ``links`` rows (reference linkers.py:55-163).

    ``pr_commits``: (pr_number, commit_seq, message) — the offline form
    of the per-PR commit fetch. ``commits`` resolves merge-commit SHAs.
    """
    if max_prs:
        ts = F.coalesce(F.col("created_at"), F.col("updated_at"), F.lit(""))
        # newest-first cap (linkers.py:66-71); number desc is the
        # deterministic stand-in for the reference's stable-sort
        # input-order tie-break (SURVEY §7 hard-part 3)
        w = Window.orderBy(ts.desc(), F.col("number").desc())
        prs = (
            prs.withColumn("_rank", F.row_number().over(w))
            .filter(F.col("_rank") <= max_prs)
            .drop("_rank")
        )

    merged_col = F.col("merged_at").isNotNull()
    base = prs.select(
        F.col("number").alias("pr_number"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("body"), F.lit("")).alias("body"),
        merged_col.alias("merged"),
        F.col("user.login").alias("author"),
        F.col("state").alias("state"),
        F.col("html_url").alias("url"),
        F.coalesce(F.col("created_at"), F.col("updated_at")).alias("created_at"),
        F.col("merge_commit_sha").alias("merge_commit_sha"),
    )

    text_refs = _refs_from(
        base,
        F.concat_ws("\n", F.col("title"), F.col("body")),
        "pr_text",
        ["pr_number"],
    )

    ref_parts = [text_refs]

    if pr_commits is not None:
        pc = base.select("pr_number").join(pr_commits, "pr_number")
        commit_refs = _refs_from(
            pc.filter(F.col("message").isNotNull() & (F.col("message") != "")),
            F.col("message"),
            "commit_message",
            ["pr_number", "commit_seq"],
        ).withColumn(
            # order commits refs by (commit order, position in message)
            "ref_pos",
            F.col("commit_seq") * 10_000 + F.col("ref_pos"),
        ).drop("commit_seq")
        ref_parts.append(commit_refs)

    scan_merge = F.col("merge_commit_sha").isNotNull() & (
        (F.col("body") == "")
        | (F.length("body") < 10)
        | (~F.lower(F.col("body")).contains("squash"))
    )
    invalid_merge_prs = None
    if commits is not None:
        merge_candidates = base.filter(scan_merge).select(
            "pr_number", "merge_commit_sha"
        )
        merge_join = merge_candidates.join(
            commits.select(
                F.col("sha").alias("merge_commit_sha"),
                F.col("commit.message").alias("merge_message"),
            ),
            "merge_commit_sha",
            "left",
        )
        # no commit row for a set merge sha == the reference's
        # invalid_sha -> the whole PR is dropped (linkers.py:114-116)
        invalid_merge_prs = merge_join.filter(
            F.col("merge_message").isNull()
        ).select("pr_number")
        merge_refs = _refs_from(
            merge_join.filter(F.col("merge_message").isNotNull()),
            F.col("merge_message"),
            "merge_commit_message",
            ["pr_number"],
        )
        ref_parts.append(merge_refs)

    refs = ref_parts[0]
    for p in ref_parts[1:]:
        refs = refs.unionByName(p)

    refs = refs.withColumn(
        "referenced_repo", F.coalesce(F.col("full_repo"), F.lit(repo_name))
    )

    lookup = _issue_author_lookup(issues, repo_name, external_issue_authors)
    if lookup is not None:
        refs = refs.join(
            F.broadcast(lookup),
            (F.lower(F.col("referenced_repo")) == lookup.ref_repo_lc)
            & (refs.issue_number == lookup.issue_number),
            "left",
        ).drop("ref_repo_lc").drop(lookup.issue_number)
    else:
        refs = refs.withColumn("issue_author", F.lit(None).cast("string"))

    refs = refs.join(F.broadcast(base.select("pr_number", "merged")), "pr_number")

    link_struct = F.struct(
        F.col("referenced_repo"),
        F.col("issue_number"),
        F.col("reference_type"),
        F.col("has_closing_kw"),
        (F.col("merged") & F.col("has_closing_kw")).alias("would_auto_close"),
        F.col("issue_author"),
    )
    links = refs.groupBy("pr_number").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("bucket_order"), F.col("ref_pos"), link_struct.alias("l")
                    )
                )
            ),
            lambda s: s.getField("l"),
        ).alias("links")
    )

    out = (
        base.join(links, "pr_number")
        .filter(F.size("links") > 0)
        .select(
            F.lit(repo_name).alias("repo_name"),
            "pr_number",
            "title",
            "author",
            "state",
            "merged",
            "url",
            "created_at",
            "links",
        )
    )
    if invalid_merge_prs is not None:
        out = out.join(F.broadcast(invalid_merge_prs), "pr_number", "left_anti")
    return out


def find_issues_closed_by_commits(
    commits: DataFrame,
    issues: DataFrame | None,
    repo_name: str,
    external_issue_authors: DataFrame | None = None,
) -> DataFrame:
    """Commit-message closing refs -> flat linkage rows
    (reference linkers.py:166-211): only refs with a closing keyword,
    commit author = author.login else commit.author.name."""
    base = commits.select(
        "sha",
        "html_url",
        F.coalesce(F.col("author.login"), F.col("commit.author.name")).alias(
            "commit_author"
        ),
        F.col("commit.message").alias("message"),
    ).filter(F.col("message").isNotNull() & (F.col("message") != ""))

    refs = base.select(
        "sha",
        "html_url",
        "commit_author",
        F.explode(extract_issue_refs("message")).alias("ref"),
    ).filter(F.col("ref.has_closing_kw"))

    refs = refs.withColumn(
        "referenced_repo",
        F.coalesce(F.col("ref.full_repo"), F.lit(repo_name)),
    ).withColumn("issue_number", F.col("ref.number"))

    lookup = _issue_author_lookup(issues, repo_name, external_issue_authors)
    if lookup is not None:
        refs = refs.join(
            F.broadcast(lookup),
            (F.lower(F.col("referenced_repo")) == lookup.ref_repo_lc)
            & (refs.issue_number == lookup.issue_number),
            "left",
        ).drop("ref_repo_lc").drop(lookup.issue_number)
    else:
        refs = refs.withColumn("issue_author", F.lit(None).cast("string"))

    return refs.select(
        F.lit(repo_name).alias("repo_name"),
        F.col("sha").alias("commit_sha"),
        F.col("html_url").alias("commit_url"),
        "commit_author",
        "referenced_repo",
        "issue_number",
        "issue_author",
        F.lit("commit_message").alias("reference_type"),
        F.lit(True).alias("has_closing_kw"),
        F.lit(True).alias("would_auto_close"),
    )


def find_cross_repo_links(
    issues: DataFrame,
    prs: DataFrame,
    repo_name: str,
    target_details: DataFrame | None = None,
) -> DataFrame:
    """Cross-repo mentions in issue/PR text -> source/reference/target
    structs (reference linkers.py:245-320).

    ``target_details``: (repo_name, number, is_pull_request, url,
    created_at, author) — offline stand-in for the target fetch; absent
    keys classify as 'issue' with null details (classify_issue_or_pr of
    an empty fetch, linkers.py:231-233).
    """
    iss = issues.select(
        F.lit("issue").alias("source_type"),
        "number",
        "title",
        "body",
        F.coalesce(F.col("created_at"), F.col("updated_at")).alias("created_at"),
        "html_url",
    )
    pr = prs.select(
        F.lit("pull_request").alias("source_type"),
        "number",
        "title",
        "body",
        F.coalesce(F.col("created_at"), F.col("updated_at")).alias("created_at"),
        "html_url",
    )
    sources = iss.unionByName(pr)

    buckets = sources.select(
        "source_type",
        "number",
        "created_at",
        "html_url",
        F.explode(
            F.array(
                F.struct(
                    F.lit("issue_title").alias("found_in"),
                    F.coalesce(F.col("title"), F.lit("")).alias("text"),
                ),
                F.struct(
                    F.lit("issue_body").alias("found_in"),
                    F.coalesce(F.col("body"), F.lit("")).alias("text"),
                ),
            )
        ).alias("bucket"),
    ).filter(F.col("bucket.text") != "")

    refs = buckets.select(
        "source_type",
        "number",
        "created_at",
        "html_url",
        F.col("bucket.found_in").alias("found_in"),
        F.explode(extract_cross_repo_refs("bucket.text")).alias("ref"),
    ).filter(F.lower(F.col("ref.target_repo")) != repo_name.lower())

    if target_details is not None:
        td = target_details.select(
            F.lower(F.col("repo_name")).alias("tgt_repo_lc"),
            F.col("number").alias("tgt_number"),
            F.when(F.col("is_pull_request"), F.lit("pull_request"))
            .otherwise(F.lit("issue"))
            .alias("tgt_type"),
            F.col("url").alias("tgt_url"),
            F.col("created_at").alias("tgt_created_at"),
            F.col("author").alias("tgt_author"),
        )
        refs = refs.join(
            F.broadcast(td),
            (F.lower(F.col("ref.target_repo")) == td.tgt_repo_lc)
            & (F.col("ref.target_number") == td.tgt_number),
            "left",
        )
    else:
        refs = (
            refs.withColumn("tgt_type", F.lit(None).cast("string"))
            .withColumn("tgt_url", F.lit(None).cast("string"))
            .withColumn("tgt_created_at", F.lit(None).cast("string"))
            .withColumn("tgt_author", F.lit(None).cast("string"))
        )

    return refs.select(
        F.struct(
            F.lit(repo_name).alias("repo_name"),
            F.col("source_type").alias("type"),
            F.col("number").alias("number"),
            F.col("html_url").alias("url"),
            F.col("created_at").alias("created_at"),
        ).alias("source"),
        F.struct(
            F.col("found_in"),
            F.col("created_at").alias("seen_at"),
            F.col("created_at").alias("cross_ref_timestamp"),
        ).alias("reference"),
        F.struct(
            F.col("ref.target_repo").alias("repo_name"),
            F.coalesce(F.col("tgt_type"), F.lit("issue")).alias("type"),
            F.col("ref.target_number").alias("number"),
            F.col("tgt_url").alias("url"),
            F.col("tgt_created_at").alias("created_at"),
            F.col("tgt_author").alias("author"),
        ).alias("target"),
    )
