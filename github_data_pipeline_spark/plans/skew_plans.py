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


# --- round 9: two-phase (salted) per-group top-k --------------------------
#
# A window row_number() computes per-group top-k by sorting each
# group's ENTIRE row set inside one task — correct, and fine when no
# group is hot, but one mega-group (one customer with 10^8 orders at
# the 100-TB point) serializes on a single straggler sorting history.
# The scalable rewrite is the same space-for-balance trade as the
# salted join: rank within (group, salt) first — every partial sorts
# ~1/S of the hot group — keep each salt's top k, then rank the <= S*k
# survivors per group. The final window sorts a bounded set no matter
# how hot the group is. The oracle runs the PLAIN single-window form:
# cell-equality proves the two-phase rewrite changes the physical
# plan, never the result (the salted_priority_revenue discipline).

TOPK_PER_GROUP = 3
TOPK_SALT = 8


@REGISTRY.add(
    "salted_group_topk",
    f"""
    SELECT c_custkey, o_orderkey, rank_in_cust, total_cents
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey ASC
             ) AS BIGINT) AS rank_in_cust,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders
    )
    WHERE rank_in_cust <= {TOPK_PER_GROUP} AND c_custkey % 50 = 1
    ORDER BY c_custkey ASC, rank_in_cust ASC
    """,
    doc=f"Per-group top-{TOPK_PER_GROUP} under group skew, two-phase: "
    f"rank within (customer, salt) over {TOPK_SALT} md5-derived salt "
    f"buckets keeping each salt's top {TOPK_PER_GROUP}, then rank the "
    f"<= {TOPK_SALT}x{TOPK_PER_GROUP} survivors per customer — the "
    "final per-group sort is bounded by the salt fan-in, never by the "
    "hot group's row count (a plain window row_number sorts the whole "
    "group in one task; one 10^8-order customer at 100 TB is a "
    "single-straggler sort). Deterministic tiebreak (orderkey) makes "
    "the top-k set unique, so the oracle's PLAIN single-window form "
    "must match cell-exact — proving the rewrite is physical, not "
    "semantic. Output sliced to customers ≡1 mod 50 to keep the "
    "compared set small; the computation runs over all groups.",
    tags=("window", "topk", "skew"),
)
def salted_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import md5_h32

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    # phase 1: deterministic salt from the row key; rank inside
    # (group, salt) — the hot group's rows spread over TOPK_SALT tasks
    salted = o.withColumn("salt", md5_h32(F.col("o_orderkey")) % TOPK_SALT)
    w1 = Window.partitionBy("c_custkey", "salt").orderBy(
        F.desc("total_cents"), F.asc("o_orderkey")
    )
    survivors = (
        salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= TOPK_PER_GROUP)
        .drop("r1", "salt")
    )
    # phase 2: rank the bounded survivor set per group
    w2 = Window.partitionBy("c_custkey").orderBy(
        F.desc("total_cents"), F.asc("o_orderkey")
    )
    return (
        survivors.withColumn(
            "rank_in_cust", F.row_number().over(w2).cast("long")
        )
        .filter(F.col("rank_in_cust") <= TOPK_PER_GROUP)
        .filter(F.col("c_custkey") % 50 == 1)
        .select("c_custkey", "o_orderkey", "rank_in_cust", "total_cents")
        .orderBy(F.asc("c_custkey"), F.asc("rank_in_cust"))
    )
