"""Reproducible global shuffle + sharded training-corpus output.

The last mile of a training-data pipeline: after curation/dedup, the
corpus must be (a) globally shuffled so a sequential reader sees a
well-mixed stream, (b) split into N shards sized for the trainer's
data loader, and (c) accompanied by a manifest the loader (and any
auditor) can trust — all REPRODUCIBLY, because a re-run of the
pipeline must produce byte-identical shard assignment and order.

Design for 100 TB:

* the shuffle key is ``md5(seed:doc_id)`` — a pure column expression,
  so shard assignment and intra-shard order are deterministic
  functions of (seed, doc_id), independent of partitioning, task
  scheduling, or previous ordering.  No ``rand()`` (non-reproducible
  across retries) and no global ``orderBy`` (a total sort is an
  all-data range-exchange; the per-shard local sort below moves each
  row exactly once);
* ``write_shards`` does ONE hash exchange on the shard id, sorts
  within partitions (spillable), and writes ``shard=K/`` directories;
* the manifest is a per-shard aggregate (row counts, order-key span,
  an order-independent content checksum) computed in the same single
  shuffle — a reader can verify a shard without re-reading others.

No reference counterpart (the reference ships documents to
Elasticsearch, reference ``src/indexing/indexer.py``); this is part of
the training-data surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def order_key(doc_id: Column | str, seed: int) -> Column:
    """Deterministic pseudo-random 128-bit hex shuffle key."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string")))


def shard_of(key: Column, n_shards: int) -> Column:
    """Shard id from the first 8 hex chars of the shuffle key."""
    return (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach (shard, order_key) — pure projection, no data movement."""
    key = order_key(id_col, seed)
    return docs.withColumn("order_key", key).withColumn(
        "shard", shard_of(F.col("order_key"), n_shards)
    )


def shard_manifest(assigned: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-shard manifest: docs, chars, order-key span, content checksum.

    The checksum is an order-independent sum of per-doc 32-bit content
    hashes (md5 prefix of the text), so shard bytes can be verified
    after any reader-side reordering; bigint sum of <=2^32 terms
    cannot overflow at any realistic shard size (2^31 docs).
    """
    content32 = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10
    ).cast("long")
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.length(text_col)).alias("chars"),
            F.min("order_key").alias("first_key"),
            F.max("order_key").alias("last_key"),
            F.sum(content32).alias("content_checksum"),
        )
        .orderBy("shard")
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Shuffle once on shard id, locally sort by the shuffle key, write
    ``shard=K`` partition directories.

    A reader streaming shard files in order-key order sees the
    deterministic global permutation restricted to its shard.
    """
    assigned = assign_shards(docs, n_shards, seed, id_col)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
