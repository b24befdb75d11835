"""Incremental/merge layer — the reference's caching semantics as
keyed DataFrame merges (SURVEY §2.10).

The reference refetches with ``since = max_ts - 300s`` and merges
fetched-over-cached by key (collectors.py:582-609, 628-657); blame
short-circuits whole runs on an unchanged head SHA (310-317) and
invalidates per-file on compare statuses (335-364). Here:

* :func:`incremental_watermark` — the refetch cursor;
* :func:`upsert_by_key` — fetched rows override cached, cached-only
  rows retained (DeltaTable.merge semantics via windowed dedup; with
  Delta available it is a one-line swap);
* :func:`detail_backfill_keys` — enrich only newly-seen keys
  (left_anti, collectors.py:505-518);
* :func:`apply_file_changes` — drop removed/renamed, refresh
  changed (collectors.py:335-364);
* :func:`head_unchanged` — the whole-run skip.

Scale: the merge shuffles once on the key; at warehouse scale the same
call lands on a Delta MERGE with file-level pruning on the key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timestamps import max_doc_timestamp

DEFAULT_LOOKBACK_SEC = 300  # INCREMENTAL_LOOKBACK_SEC (config.py:25)


def incremental_watermark(
    cached: DataFrame,
    ts_cols: tuple[str, ...] = ("updated_at", "closed_at", "created_at"),
    lookback_sec: int = DEFAULT_LOOKBACK_SEC,
):
    """max(greatest(ts_cols)) - lookback, as a Python datetime (the
    ``since=`` cursor), or None for an empty/all-null cache."""
    row = cached.agg(
        F.max(max_doc_timestamp(*ts_cols)).alias("wm")
    ).collect()[0]
    if row["wm"] is None:
        return None
    import datetime

    return row["wm"] - datetime.timedelta(seconds=lookback_sec)


def upsert_by_key(
    cached: DataFrame, fetched: DataFrame, key_cols: list[str] | str
) -> DataFrame:
    """Fetched rows override cached rows by key; cached-only rows are
    retained (collectors.py:596-609). Row sets must share a schema."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    tagged = fetched.withColumn("_fresh", F.lit(1)).unionByName(
        cached.withColumn("_fresh", F.lit(0))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc("_fresh"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fresh")
    )


def detail_backfill_keys(
    fetched: DataFrame, cached: DataFrame, key_cols: list[str] | str
) -> DataFrame:
    """Keys present in fetched but not cached — the only rows whose
    expensive detail enrichment must run (collectors.py:505-518)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return fetched.join(
        cached.select(*key_cols).distinct(), key_cols, "left_anti"
    )


def apply_file_changes(
    cached_files: DataFrame,
    changes: DataFrame,
    path_col: str = "path",
) -> tuple[DataFrame, DataFrame]:
    """Apply a compare/{base}...{head} change feed to a per-file cache
    (collectors.py:335-364).

    ``changes``: (path, status, previous_path) with statuses
    added/modified/removed/renamed. Returns (kept, needs_refresh):
    removed and renamed-away paths drop; added/modified/renamed-to
    paths need refresh.
    """
    removed = changes.filter(
        F.col("status").isin("removed")
    ).select(F.col(path_col))
    renamed_away = changes.filter(
        (F.col("status") == "renamed") & F.col("previous_path").isNotNull()
    ).select(F.col("previous_path").alias(path_col))
    drop = removed.unionByName(renamed_away).distinct()
    kept = cached_files.join(drop, path_col, "left_anti")
    needs_refresh = changes.filter(
        F.col("status").isin("added", "modified", "renamed")
    ).select(F.col(path_col)).distinct()
    return kept, needs_refresh


def head_unchanged(cached_head_sha: str | None, current_head_sha: str) -> bool:
    """Whole-run short-circuit (collectors.py:310-317)."""
    return bool(cached_head_sha) and cached_head_sha == current_head_sha

def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: where ``upsert_by_key``
    overwrites (type 1, the reference's semantics), this keeps every
    version as a validity interval — the shape a training-data catalog
    needs to answer "what did this row say when the snapshot was cut".

    ``history`` carries (``valid_from``, ``valid_to``, ``is_current``);
    pass an empty history (same schema) to bootstrap. ``updates`` are
    new versions with event time ``ts_col``, assumed newer than each
    key's current ``valid_from`` (the watermark contract of the ingest
    loop). Several updates to one key in a batch chain correctly: each
    version's ``valid_to`` is the next version's ``valid_from``.

    Plan shape: one window over updates keyed by ``key_cols`` (the
    chain), one aggregate for first-update-per-key, one broadcast-able
    join to close current rows. Touched history partitions only —
    composes with write_upsert's dynamic partition overwrite.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    new_versions = (
        updates.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )
    first_update = updates.groupBy(*key_cols).agg(
        F.min(ts_col).alias("_supersede_ts")
    )
    closed = (
        history.join(first_update, key_cols, "inner")
        .withColumn(
            "valid_to",
            F.when(F.col("is_current"), F.col("_supersede_ts")).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.lit(False))
        .drop("_supersede_ts")
    )
    untouched = history.join(first_update, key_cols, "left_anti")
    return untouched.unionByName(closed).unionByName(new_versions)
