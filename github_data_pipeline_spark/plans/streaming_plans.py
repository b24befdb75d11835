"""Registry entries that execute the Structured Streaming layer.

``stream_user_ledger`` actually runs the stateful stream (availableNow
drain into a memory sink) inside the builder; its final per-user state
must equal the batch aggregate, which is what the DuckDB oracle
computes — an end-to-end correctness gate on the streaming path
itself.

``approx_lineitem_stats`` exposes the approximate-aggregate surface
(HLL distinct, quantile sketches). Sketch VALUES are engine-specific,
so the entry emits exact values plus within-error-envelope verdict
flags instead — the oracle pins the flags, turning the sketch
guarantees themselves into a cell-exact check; the exact twins live
in the relational plans.
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


# approx_lineitem_stats error envelopes. The sketch VALUES are
# engine-specific (DuckDB cannot reproduce Spark's HLL registers or GK
# compression points), but the sketch GUARANTEES are not — so the
# query emits exact values plus within-envelope verdict flags, and the
# oracle pins every flag to literal 1. A Spark estimate drifting
# outside its documented envelope becomes a hash mismatch.
HLL_RSD = 0.02  # requested relative standard deviation
HLL_TOL_PCT = 10  # accept |est - exact| <= 10% of exact (5x the rsd)
PA_ACCURACY = 10_000  # percentile_approx: rank error <= n / accuracy
PA_BOUND_EPS = 5e-4  # verdict bounds at q -+ 5x the guaranteed eps


@_add(
    "approx_lineitem_stats",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY
                CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS p50_cents,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY
                CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS p95_cents,
           CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY
                CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS p99_cents,
           CAST(1 AS BIGINT) AS hll_orders_ok,
           CAST(1 AS BIGINT) AS hll_parts_ok,
           CAST(1 AS BIGINT) AS p50_ok,
           CAST(1 AS BIGINT) AS p95_ok,
           CAST(1 AS BIGINT) AS p99_ok
    FROM lineitem
    """,
    doc="Approximate aggregates for the 100 TB path, BOUNDS-CHECKED "
    "against exact values: HLL++ distinct counts (rsd 0.02, envelope "
    f"{HLL_TOL_PCT}% = 5x rsd) and percentile_approx quantile "
    f"sketches (accuracy {PA_ACCURACY}; the estimate must fall "
    "between percentile_disc(q -+ 5/accuracy), i.e. within 5x the "
    "guaranteed rank error). The *_ok flags carry the verdicts; the "
    "oracle pins them to 1, so an out-of-envelope estimate fails the "
    "cell-exact gate. HLL is hash-order-independent and the GK rank "
    "guarantee holds under any merge order, so the flags are stable "
    "across partitionings even though the raw estimates are not — "
    "which is exactly why the flags, not the estimates, are emitted. "
    "The exact columns double as the audit trail (they shuffle the "
    "full column; the sketches are the mergeable O(k) product path — "
    "kmv_sketch_stats in plans/sketch_plans.py is the engine-neutral "
    "twin).",
    tags=("approx", "agg"),
)
def approx_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    li = li.select("l_orderkey", "l_partkey", cents.alias("cents"))

    def disc(q: float) -> F.Column:
        return F.expr(
            f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY cents)"
        ).cast("long")

    def p_ok(q: float) -> F.Column:
        pa = F.percentile_approx("cents", q, PA_ACCURACY)
        return (
            pa.between(disc(q - PA_BOUND_EPS), disc(q + PA_BOUND_EPS))
            .cast("long")
        )

    def hll_ok(col: str, exact: F.Column) -> F.Column:
        est = F.approx_count_distinct(col, HLL_RSD)
        return (
            (F.abs(est - exact) * 100 <= exact * HLL_TOL_PCT).cast("long")
        )

    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        disc(0.5).alias("p50_cents"),
        disc(0.95).alias("p95_cents"),
        disc(0.99).alias("p99_cents"),
        hll_ok("l_orderkey", F.countDistinct("l_orderkey")).alias(
            "hll_orders_ok"
        ),
        hll_ok("l_partkey", F.countDistinct("l_partkey")).alias(
            "hll_parts_ok"
        ),
        p_ok(0.5).alias("p50_ok"),
        p_ok(0.95).alias("p95_ok"),
        p_ok(0.99).alias("p99_ok"),
    )
