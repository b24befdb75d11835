"""Blame aggregation: flat GraphQL blame ranges -> per-file author
rollups -> nested documents (+ the exploded relational form).

Re-expresses ``summarize_blame_ranges`` and the per-file doc splitter
(reference ``src/retrieval/collectors.py:145-217``,
``src/indexing/indexer.py:87-112``) as grouped aggregations:

* ``count = max(0, end - start + 1)`` per range;
* per-author totals + ordered range lists; authors sorted by lines
  desc (ties: author asc — the deterministic stand-in for the
  reference's stable-sort encounter order, SURVEY §7 hard-part 3);
* per-file ``total_lines`` / ``ranges_count``;
* first-N ``examples`` in range order (encounter order == startingLine
  order in the GraphQL payload; we sort explicitly);
* LEFT join against commits for ``matching_commit`` enrichment —
  misses stay null (collectors.py:166-178).

Scale: one shuffle on (path) [+ the commit join, broadcast when the
commit dim fits]; both rollup levels reuse the same partitioning. The
deeply nested doc is assembled only at the end — queries should hit
the exploded form (SURVEY §7 hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.refs import author_key, one_line

BLAME_EXAMPLE_LIMIT = 5


def blame_range_details(
    blame_ranges: DataFrame, commits: DataFrame | None
) -> DataFrame:
    """Flat enriched ranges — the exploded relational form queries use."""
    base = blame_ranges.select(
        "repo_name",
        "ref",
        "path",
        F.col("startingLine").alias("start"),
        F.coalesce(F.col("endingLine"), F.col("startingLine")).alias("end"),
        "age",
        F.col("commit.oid").alias("commit_sha"),
        F.col("commit.committedDate").alias("committed_date"),
        one_line("commit.message").alias("message"),
        author_key(
            F.col("commit.author.user.login"),
            F.col("commit.author.name"),
            F.col("commit.author.email"),
        ).alias("author"),
    ).withColumn(
        "count",
        F.greatest(F.lit(0), F.col("end") - F.col("start") + 1),
    )
    if commits is None:
        return base.withColumn(
            "matching_commit",
            F.lit(None).cast(
                "struct<repo_name:string,sha:string,html_url:string,"
                "author_login:string,files_changed:array<string>,"
                "files_changed_count:int>"
            ),
        )
    dim = commits.select(
        F.col("sha").alias("commit_sha"),
        F.struct(
            F.col("repo_name"),
            F.col("sha"),
            F.col("html_url"),
            F.col("author.login").alias("author_login"),
            F.coalesce(
                F.filter(
                    F.transform(F.col("files"), lambda f: f.getField("filename")),
                    lambda x: x.isNotNull(),
                ),
                F.array().cast("array<string>"),
            ).alias("files_changed"),
        ).alias("mc"),
    ).withColumn(
        "mc",
        F.struct(
            F.col("mc.repo_name"),
            F.col("mc.sha"),
            F.col("mc.html_url"),
            F.col("mc.author_login"),
            F.col("mc.files_changed"),
            F.size(F.col("mc.files_changed")).alias("files_changed_count"),
        ),
    )
    return base.join(F.broadcast(dim), "commit_sha", "left").withColumnRenamed(
        "mc", "matching_commit"
    )


def blame_file_rollup(
    blame_ranges: DataFrame,
    commits: DataFrame | None,
    max_files: int = 0,
) -> DataFrame:
    """Per-file nested doc: authors (sorted by lines desc) with ordered
    ranges, totals, and first-N examples.

    ``max_files`` caps the number of files processed (BLAME_FILE_LIMIT,
    collectors.py:330-332). The reference keeps the first N in listing
    order; rows are unordered here, so the deterministic stand-in is
    the first N paths in lexicographic order."""
    if max_files:
        keep = (
            blame_ranges.select("repo_name", "ref", "path")
            .distinct()
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("repo_name", "ref").orderBy("path")
                ),
            )
            .filter(F.col("_rk") <= max_files)
            .drop("_rk")
        )
        blame_ranges = blame_ranges.join(
            F.broadcast(keep), ["repo_name", "ref", "path"], "left_semi"
        )
    det = blame_range_details(blame_ranges, commits)

    range_struct = F.struct(
        "start",
        "end",
        "count",
        "age",
        "commit_sha",
        "committed_date",
        "message",
        "matching_commit",
    )

    per_author = det.groupBy("repo_name", "ref", "path", "author").agg(
        F.sum("count").alias("total_lines"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("start").alias("o"), range_struct.alias("r")))
            ),
            lambda s: s.getField("r"),
        ).alias("ranges"),
    )

    authors = per_author.groupBy("repo_name", "ref", "path").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("total_lines")).alias("neg"),
                        F.col("author").alias("tie"),
                        F.struct("author", "total_lines", "ranges").alias("a"),
                    )
                )
            ),
            lambda s: s.getField("a"),
        ).alias("authors"),
    )

    example_struct = F.struct(
        F.struct("start", "end", "count").alias("lines"),
        "commit_sha",
        "committed_date",
        F.col("author").alias("who"),
        "message",
    )
    per_file = det.groupBy("repo_name", "ref", "path").agg(
        F.sum("count").alias("total_lines"),
        F.count(F.lit(1)).cast("int").alias("ranges_count"),
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("start").alias("o"), example_struct.alias("e"))
                    )
                ),
                lambda s: s.getField("e"),
            ),
            1,
            BLAME_EXAMPLE_LIMIT,
        ).alias("examples"),
    )

    return per_file.join(authors, ["repo_name", "ref", "path"]).select(
        "repo_name",
        "ref",
        "path",
        "ranges_count",
        "total_lines",
        "authors",
        "examples",
    )


def blame_author_totals(
    blame_ranges: DataFrame, commits: DataFrame | None = None
) -> DataFrame:
    """Repo-wide lines-by-author (the Counter at collectors.py:150-164)."""
    det = blame_range_details(blame_ranges, commits)
    return (
        det.groupBy("repo_name", "author")
        .agg(
            F.sum("count").alias("total_lines"),
            F.count(F.lit(1)).alias("ranges_count"),
        )
    )
