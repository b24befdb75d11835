"""Registry entries that execute the Structured Streaming layer.

``stream_user_ledger`` actually runs the stateful stream (availableNow
drain into a memory sink) inside the builder; its final per-user state
must equal the batch aggregate, which is what the DuckDB oracle
computes — an end-to-end correctness gate on the streaming path
itself.

``approx_lineitem_stats`` exposes the approximate-aggregate surface
(HLL distinct, quantile sketches). Sketch outputs are engine-specific
by nature, so it is a rows-only entry (the driver records the weaker
check); the exact twins live in the relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add


@_add(
    "stream_user_ledger",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS total_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
    FROM events
    GROUP BY user_id
    """,
    doc="The custom stateful streaming operator (streaming/stateful.py, "
    "applyInPandasWithState) drained with availableNow: the final "
    "per-user ledger state must equal the batch aggregate the oracle "
    "computes. This runs a real streaming query with a state store — "
    "the strongest check the streaming layer gets.",
    tags=("streaming", "stateful"),
)
def stream_user_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import read_events_stream
    from ..streaming.stateful import user_ledger_stream

    import glob
    import os

    name = "stream_user_ledger_sink"
    # dropTempView is idempotent — no listTables() catalog scan needed
    spark.catalog.dropTempView(name)
    stream = user_ledger_stream(read_events_stream(spark, sf_dir))
    # state shards sized to the DATA, not a constant (stateful plans
    # don't get AQE coalescing): ~2 MB of events per shard, floor 8,
    # cap 32. At the bench SF this resolves to the historical 8; the
    # factor-30 state-growth smoke gets 30 shards instead of pushing
    # 4x the rows through the same 8 Python state workers. Shard count
    # never changes results — state is per user_id wherever it hashes.
    paths = glob.glob(os.path.join(sf_dir, "events.parque*"))
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for p in paths
        for r, _d, fs in os.walk(p)
        for f in fs
    ) or sum(os.path.getsize(p) for p in paths if os.path.isfile(p))
    shards = str(min(32, max(8, total // (2 << 20))))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shards)
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # single availableNow batch -> one update row per user == final state
    return spark.sql(
        f"SELECT user_id, total_events, total_value_cents FROM {name}"
    )


@_add(
    "approx_lineitem_stats",
    None,  # sketches are engine-specific: rows-only check by design
    doc="Approximate aggregates for the 100 TB path: HLL++ distinct "
    "counts and quantile sketches over lineitem. Exact twins "
    "(orders_profile, pricing_summary) are oracle-checked; this "
    "entry proves the approx surface runs and returns sane shapes. "
    "The oracle-checkable counterpart is kmv_sketch_stats "
    "(plans/sketch_plans.py): engine-neutral KMV distinct estimation "
    "+ deterministic-sample quantiles, cell-exact in DuckDB.",
    tags=("approx", "agg"),
)
def approx_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # scalar quantile columns, not an array: the driver's pandas
    # canonicalizer cannot hash list cells even on a rows-only check
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("price_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("price_p95"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("price_p99"),
        F.count(F.lit(1)).alias("rows"),
    )
