"""Sinks: columnar canonical store + artifact/bulk parity writers.

The reference persists deterministic JSON artifacts per dataset
(``collectors.py:33-39``) and bulk-loads Elasticsearch with stable
``_id``s and batch accounting (``src/indexing/client.py:54-102``,
``indexer.py:115-178``). Here the canonical store is partitioned
Parquet keyed by the same deterministic ids (functions/hashing.py);
JSON artifacts and an ES-bulk-shaped writer exist for migration parity.

Scale: partition by ``repo_name`` so per-repo queries prune files; at
real scale add a date subpartition on the big tables. Upserts rewrite
only the partitions containing changed keys (with Delta available,
``write_upsert`` becomes DeltaTable.merge one-for-one).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import upsert_by_key


def write_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("repo_name",),
    mode: str = "overwrite",
) -> None:
    """Canonical columnar write, partitioned for pruning."""
    writer = df.write.mode(mode)
    cols = [c for c in partition_by if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def write_upsert(
    spark: SparkSession,
    fresh: DataFrame,
    path: str,
    key_cols: list[str] | str,
    partition_by: tuple[str, ...] = ("repo_name",),
) -> None:
    """Keyed upsert into a Parquet table: fetched rows override stored
    rows, stored-only rows retained (the §1.4 identity contract —
    re-ingesting never duplicates). Delta swap-in: DeltaTable.merge.

    With a partitioned table, only the partitions containing fresh
    keys are merged and rewritten (dynamic partition overwrite) — at
    100 TB an incremental batch touches a handful of repo partitions,
    not the table.
    """
    import shutil
    from functools import reduce

    cols = [c for c in partition_by if c in fresh.columns]
    staging = path.rstrip("/") + ".staging"
    if not os.path.exists(path):
        merged = fresh
        target_mode = "overwrite"
    elif cols:
        affected = [
            tuple(r) for r in fresh.select(*cols).distinct().collect()
        ]
        cached = spark.read.parquet(path)
        pred = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda x, y: x & y,
                    [F.col(c) == v for c, v in zip(cols, vals)],
                )
                for vals in affected
            ],
        )
        merged = upsert_by_key(cached.filter(pred), fresh, key_cols)
        target_mode = "dynamic"
    else:
        merged = upsert_by_key(spark.read.parquet(path), fresh, key_cols)
        target_mode = "overwrite"

    # parquet cannot overwrite in place from its own scan: stage the
    # merged (affected-partitions-only) slice, then overwrite
    write_table(merged, staging, partition_by)
    staged = spark.read.parquet(staging)
    if target_mode == "dynamic":
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            staged.write.mode("overwrite").partitionBy(*cols).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        write_table(staged, path, partition_by)
    shutil.rmtree(staging, ignore_errors=True)


def ensure_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    partition_by: tuple[str, ...] = ("repo_name",),
    index_prefix: str = "",
) -> None:
    """Catalog-managed table DDL — the reference's create-if-missing
    index mapping (client.py:36-52): first write creates the table,
    later writes append; schema is enforced by the catalog.

    ``index_prefix`` namespaces the table the way the reference's
    indexing CLI prefixes every target index
    (``src/indexing/indexer.py:128-129,149``: ``f"{index_prefix}{idx}"``)
    — one warehouse can hold e.g. ``dev_`` and ``prod_`` twins."""
    table = f"{index_prefix}{table}"
    if spark.catalog.tableExists(table):
        # insertInto is positional and partitioned tables reorder
        # columns (partition cols last) — align by name first
        ordered = df.select(*spark.table(table).columns)
        ordered.write.mode("append").insertInto(table)
        return
    writer = df.write.mode("overwrite")
    cols = [c for c in partition_by if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.saveAsTable(table)


def write_json_artifact(df: DataFrame, path: str) -> None:
    """Line-delimited JSON artifact (the reference's per-dataset JSON
    file, made splittable). Deterministic given a sorted input."""
    df.write.mode("overwrite").json(path)


def _send_with_retry(
    send_batch: Callable[[list[tuple[str, str]]], int],
    batch: list[tuple[str, str]],
    max_retries: int,
    backoff_s: float,
    sleep: Callable[[float], None],
) -> int:
    """One batch through ``send_batch`` with exponential backoff on
    TRANSPORT errors (exceptions). ``send_batch`` returning ``n < len``
    is per-document rejection — terminal by contract, never retried
    (retrying would double-index the accepted documents). A batch that
    still raises after ``max_retries`` attempts is accounted as fully
    failed rather than raised, mirroring the reference's
    terminal-status accounting (``src/indexing/client.py:54-102``) so
    one dead shard cannot kill a 1000-partition stage."""
    for attempt in range(max_retries + 1):
        try:
            return send_batch(batch)
        except Exception:
            if attempt == max_retries:
                return 0
            sleep(backoff_s * (2**attempt))
    return 0  # unreachable


def bulk_index(
    df: DataFrame,
    id_col: str,
    send_batch: Callable[[list[tuple[str, str]]], int],
    batch_size: int = 500,
    dry_run: bool = False,
    distributed: bool = False,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    sleep: Callable[[float], None] | None = None,
) -> tuple[int, int]:
    """ES-bulk-shaped sink: (doc-id, json-doc) batches through
    ``send_batch`` (returns #ok), with ok/fail accounting
    (client.py:54-102). The real ES writer is the elasticsearch-hadoop
    connector (`es.mapping.id`); this path exists for parity tests and
    air-gapped runs.

    Two transports, identical accounting (including the retry policy —
    a transport exception from ``send_batch`` is retried up to
    ``max_retries`` times with exponential backoff ``backoff_s * 2^n``,
    then the batch is accounted as failed; per-document rejections,
    ``send_batch`` returning fewer than the batch, are terminal and
    never retried):

    * ``distributed=False`` — batches stream through toLocalIterator,
      bounding driver memory at one batch. Single-stream throughput;
      exact byte-for-byte parity with the reference's driver-side
      indexer loop (``src/indexing/indexer.py:115-178``). This path is
      effectively-once: one stream, no task retries.
    * ``distributed=True`` — the scale path: every partition ships its
      own batches from the executor that holds it (``send_batch`` must
      be picklable and thread/process-safe, like a per-worker ES
      client). Per-partition (ok, fail) counts come back through a
      1-row-per-partition Arrow stage and fold in a 2-long aggregate —
      no document ever crosses to the driver. At 1000 executors this
      is 1000 concurrent bulk streams instead of one.

      **Delivery contract: at-least-once.** A failed/retried or
      speculatively-executed task re-runs its whole partition and
      calls ``send_batch`` again, double-sending documents and
      inflating the folded ok/fail counts. ``send_batch`` MUST
      therefore be idempotent keyed by ``_id`` (the ES bulk ``index``
      op is: same ``_id`` overwrites, so the sink converges even
      though the counts can over-report under task retry). Disable
      ``spark.speculation`` for this stage if exact counts matter.

    ``dry_run=True`` mirrors the reference CLI's ``--dry-run``
    (``src/indexing/indexer.py:158-160``): count the docs that *would*
    index without touching the sink — here a distributed count, not a
    driver-side parse loop — returned as (ok, 0)."""
    if dry_run:
        return int(df.count()), 0
    sleep_fn = sleep if sleep is not None else time.sleep
    docs = df.select(
        F.col(id_col).alias("_id"), F.to_json(F.struct(*df.columns)).alias("_doc")
    )
    if distributed:
        return _bulk_index_partitions(
            docs, send_batch, batch_size, max_retries, backoff_s, sleep_fn
        )
    ok = fail = 0
    batch: list[tuple[str, str]] = []
    for row in docs.toLocalIterator():
        batch.append((row["_id"], row["_doc"]))
        if len(batch) >= batch_size:
            n = _send_with_retry(send_batch, batch, max_retries, backoff_s, sleep_fn)
            ok += n
            fail += len(batch) - n
            batch = []
    if batch:
        n = _send_with_retry(send_batch, batch, max_retries, backoff_s, sleep_fn)
        ok += n
        fail += len(batch) - n
    return ok, fail


def _bulk_index_partitions(
    docs: DataFrame,
    send_batch: Callable[[list[tuple[str, str]]], int],
    batch_size: int,
    max_retries: int,
    backoff_s: float,
    sleep: Callable[[float], None],
) -> tuple[int, int]:
    """Executor-side transport for :func:`bulk_index`: one
    ``mapInPandas`` stage whose workers batch their partition's rows
    (batches span Arrow-chunk boundaries, so batch sizes match the
    driver path within each partition), send them with the same
    retry-with-backoff policy as the driver path, and emit a single
    (ok, fail) row; a sum aggregate folds the accounting. Delivery is
    at-least-once under task retry/speculation — see
    :func:`bulk_index`."""
    import pandas as pd

    def _send_partition(chunks):
        ok = fail = 0
        batch: list[tuple[str, str]] = []

        def flush():
            nonlocal ok, fail, batch
            if batch:
                n = _send_with_retry(
                    send_batch, batch, max_retries, backoff_s, sleep
                )
                ok += n
                fail += len(batch) - n
                batch = []

        for pdf in chunks:
            for _id, _doc in zip(pdf["_id"], pdf["_doc"]):
                batch.append((_id, _doc))
                if len(batch) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame({"ok": [ok], "fail": [fail]})

    counts = docs.mapInPandas(_send_partition, "ok long, fail long")
    row = counts.agg(
        F.sum("ok").alias("ok"), F.sum("fail").alias("fail")
    ).collect()[0]
    return int(row["ok"] or 0), int(row["fail"] or 0)
