"""Registry entry for the reproducible shuffle-shard manifest.

The manifest is the oracle-checkable face of the sharded-output
writer (operators/sharding.py): shard assignment, intra-shard order
keys, and the order-independent content checksum are all pure
deterministic expressions, so DuckDB reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sharding import assign_shards, shard_manifest
from ..sources.tables import load_table, spread
from .core import REGISTRY

N_SHARDS = 8
SEED = 42

_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, text,
    md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents
), sharded AS (
  SELECT *,
    CAST(CAST(('0x' || substr(order_key, 1, 8)) AS BIGINT) % {N_SHARDS}
         AS INTEGER) AS shard
  FROM assigned
)
SELECT shard,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(length(text)) AS BIGINT) AS chars,
  MIN(order_key) AS first_key,
  MAX(order_key) AS last_key,
  CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
    AS content_checksum
FROM sharded
GROUP BY shard
"""


@REGISTRY.add(
    "train_shard_manifest",
    _ORACLE,
    doc="Per-shard manifest of the reproducible training-corpus "
    "shuffle (operators/sharding.py): shard id and intra-shard order "
    "are md5(seed:doc_id) expressions — deterministic under retries, "
    "repartitioning, and input order, with no rand() and no global "
    "sort (one hash exchange on shard + spillable local sort). The "
    "manifest's order-independent content checksum lets a reader "
    "verify one shard without the others. write_shards' file layout "
    "is pinned in tests/test_sharding.py.",
    tags=("sharding", "training-output"),
)
def train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return shard_manifest(assign_shards(docs, N_SHARDS, SEED))
