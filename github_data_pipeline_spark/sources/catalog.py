"""Directory catalog scan — the reference's ``scan_and_index`` shape
(``src/indexing/indexer.py:115-178``): iterate ``{base}/{owner_repo}/``
artifact directories, derive ``repo_name`` from the folder name
(``owner_repo`` -> ``owner/repo``, indexer.py:22-29), route each file
to its logical table, and load everything as one unioned DataFrame per
table with repo_name stamped.

Spark-first: instead of a per-file Python loop, each logical table
becomes ONE multi-path read (the reader parallelizes file listing and
IO), with repo_name recovered from the input path — no driver-side
row handling. With hive-style layout (``repo_name=.../``) this
degenerates to plain partition discovery + pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# folder -> logical table routing (FILE_TO_INDEX analog, schema.py:369-379)
TABLE_FILES = (
    "repo_meta",
    "issues",
    "pull_requests",
    "commits",
    "contributors",
    "prs_with_linked_issues",
    "issues_closed_by_commits",
    "cross_repo_links",
    "repo_blame",
)


def repo_name_from_dir(dirname: str) -> str:
    """``owner_repo`` folder -> ``owner/repo`` (first underscore splits,
    indexer.py:26-28)."""
    owner, _, repo = dirname.partition("_")
    return f"{owner}/{repo}" if repo else dirname


def discover_repos(base_dir: str) -> list[str]:
    """Sorted repo dirs for deterministic processing order
    (indexer.py:142)."""
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        d
        for d in os.listdir(base_dir)
        if os.path.isdir(os.path.join(base_dir, d))
    )


def scan_catalog(
    spark: SparkSession,
    base_dir: str,
    table: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame | None:
    """Load one logical table across every repo dir as a single read.

    repo_name is recovered from the file path (not trusted from the
    row), mirroring the indexer's stamp-on-ingest contract
    (indexer.py:32-36, 157).
    """
    paths, names = [], {}
    for d in discover_repos(base_dir):
        p = os.path.join(base_dir, d, table)
        if os.path.exists(p):
            paths.append(p)
            names[os.path.abspath(p)] = repo_name_from_dir(d)
    if not paths:
        return None
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(paths)
    mapping = F.create_map(
        *[F.lit(x) for kv in names.items() for x in kv]
    )
    # input path -> repo dir key: strip the trailing file component(s)
    repo_key = F.regexp_extract(
        F.input_file_name(), f"(.*/{table})", 1
    )
    # normalize the file:/ | file:// | file:/// URI prefix to a plain
    # absolute path for the map lookup
    repo_key = F.regexp_replace(repo_key, "^file:/*", "/")
    return df.withColumn("repo_name", mapping[repo_key]).filter(
        F.col("repo_name").isNotNull()
    )


def read_json_robust(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Corrupt-tolerant JSON ingest: (good_rows, bad_rows).

    At 100 TB some upstream page is always truncated mid-write; a
    FAILFAST read turns one bad line into a dead job, and silently
    DROPMALFORMED turns it into silent data loss. PERMISSIVE mode with
    a ``_corrupt_record`` column gives the third option: good rows flow
    on with the declared schema, bad raw lines are quarantined for
    replay/alerting — both from the SAME single scan (split is a
    column-null filter, no second read).
    """
    full = schema.rstrip() + ", _corrupt_record string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # Spark requires materializing before filtering on the corrupt
        # column alone; cache keeps the split single-scan
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    return good, bad
