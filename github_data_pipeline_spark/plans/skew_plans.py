"""Registry exposure for the skew-mitigation operator
(operators/skew.py): a salted fact-dim join whose result is proven
IDENTICAL to the plain join the oracle runs. Salting is pure
physical-plan surgery — the big side's hot keys spread over
``buckets`` reducers, the small side replicates ``buckets``-fold —
so the correctness contract is exactly "same rows as the unsalted
join", and that is what the DuckDB oracle checks cell-exact.

AQE skew-split handles most skew at runtime (session.py); explicit
salting is the tool when one key dominates past what split
partitions fix, or under a fixed partitioning (streaming state).
The hotkey scale smoke measures the machinery under a real 20%%-
one-key stream; this entry pins its semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import load_table
from .core import REGISTRY

SALT_BUCKETS = 16


@REGISTRY.add(
    "salted_priority_revenue",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Salted fact-dim join, semantics-proved: lineitem (the big, "
    f"potentially hot-keyed side) joins orders over {SALT_BUCKETS} "
    "salt buckets — each order key spreads across "
    f"{SALT_BUCKETS} reducers, the dim side replicates "
    f"{SALT_BUCKETS}-fold (the space-for-balance trade) — then "
    "aggregates revenue per order priority in integer cents. The "
    "oracle runs the PLAIN join: cell-equality proves salting "
    "changes the physical plan, never the result. The hot-key "
    "census (operators/skew.key_frequencies) is the decision input "
    "for when to pay this trade; AQE skew-split covers the milder "
    "cases without replication.",
    tags=("join", "skew", "agg"),
)
def salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    joined = salted_join(li, orders, on="l_orderkey", buckets=SALT_BUCKETS)
    return (
        joined.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy(F.asc("priority"))
    )
