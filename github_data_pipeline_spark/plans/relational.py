"""Relational operator coverage: scans, filters, joins, aggregations,
windows, set-ops, sorts/limits — each as an oracle-checkable query.

These re-express the reference's operator inventory (SURVEY.md §2.2-2.7)
over the driver's TPC-H-ish testdata. Scale notes per query explain why
the plan survives 100 TB: dimension joins are broadcast, fact-side aggs
are partial-before-shuffle, top-k uses TakeOrderedAndProject, and money
is aggregated in exact integer cents (functions/money.py) so results are
order- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.money import cents, cents_of, dollars
from ..operators.hints import broadcast_if_bounded, parquet_row_bound
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# --------------------------------------------------------------------------


@_add(
    "pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT)
        AS sum_disc_price_micros,
      CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT)
        AS sum_charge_micros,
      CAST(COUNT(*) AS BIGINT) AS count_order,
      CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan -> grouped aggregate. Exact integer "
    "money keeps the hash stable under any partitioning; Catalyst emits "
    "partial hash-aggregate before the shuffle, so the shuffle carries "
    "only |groups| x |partitions| rows at any scale.",
    tags=("agg", "filter"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_base_price_cents"),
            F.sum(F.round(disc_price * 1_000_000).cast("long")).alias(
                "sum_disc_price_micros"
            ),
            F.sum(F.round(charge * 1_000_000).cast("long")).alias(
                "sum_charge_micros"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.col("sum_qty").cast("double") / F.col("count_order")
        )
        .withColumn(
            "avg_price",
            F.col("sum_base_price_cents").cast("double")
            / F.col("count_order")
            / 100.0,
        )
    )


@_add(
    "orders_profile",
    """
    SELECT
      o.total_orders, o.open_orders, o.first_order, o.last_order,
      c.segments, c.customer_nations, c.customers, c.avg_acctbal
    FROM (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS total_orders,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
        CAST(STRFTIME(MIN(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS first_order,
        CAST(STRFTIME(MAX(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS last_order
      FROM orders
    ) o CROSS JOIN (
      SELECT
        CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS segments,
        CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS customer_nations,
        CAST(COUNT(*) AS BIGINT) AS customers,
        CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0
          AS avg_acctbal
      FROM customer
    ) c
    """,
    doc="Dataset profile in one pass per table: conditional counts via "
    "SUM(CASE) (scenario-1 analog), min/max over a timestamp column in "
    "GitHub wire format (scenario-7 analog), exact COUNT(DISTINCT) "
    "(scenario-3 analog; at 100 TB swap to approx_count_distinct), and "
    "an exact integer-cents average (functions/money.py — bit-identical "
    "on any engine/partitioning). Two single-row partial-aggregated "
    "scans joined by a 1x1 cross join.",
    tags=("agg", "conditional", "distinct", "timestamp"),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    o_agg = o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "open_orders"
        ),
        F.date_format(F.min("o_orderdate"), fmt).alias("first_order"),
        F.date_format(F.max("o_orderdate"), fmt).alias("last_order"),
    )
    c_agg = c.agg(
        F.countDistinct("c_mktsegment").alias("segments"),
        F.countDistinct("c_nationkey").alias("customer_nations"),
        F.count(F.lit(1)).alias("customers"),
        dollars(
            F.sum(cents("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_acctbal"),
    )
    return o_agg.crossJoin(c_agg)


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# --------------------------------------------------------------------------


@_add(
    "top_customers_by_revenue",
    """
    SELECT
      c.c_custkey,
      c.c_name,
      CAST(COUNT(*) AS BIGINT) AS orders,
      CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    HAVING SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) > 150000000
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q18 shape: fact-dim equi-join + grouped agg + HAVING "
    "threshold (large-volume customers over $1.5M lifetime) + "
    "deterministic top-k. The customer side is broadcast only under the "
    "size gate (broadcast_if_bounded on the parquet footer count — "
    "customer is SF-linear, so at the 100-TB point the join degrades to "
    "a keyed shuffle); the HAVING predicate runs post-aggregation "
    "on |customers| rows; ORDER+LIMIT lowers to TakeOrderedAndProject "
    "(no global sort).",
    tags=("join", "topk", "having"),
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # customer grows with SF (~10^9 rows at the 100-TB point): gate the
    # broadcast on the parquet footer count instead of forcing it, so the
    # join degrades to a keyed shuffle when the dimension outgrows memory.
    c = _t(spark, sf_dir, "customer")
    c = broadcast_if_bounded(c, parquet_row_bound(sf_dir, "customer"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .filter(F.col("revenue_cents") > 150_000_000)
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(10)
    )


@_add(
    "revenue_by_nation",
    """
    SELECT
      n.n_name,
      CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000 ) AS BIGINT)) AS BIGINT)
        AS revenue_micros,
      CAST(COUNT(*) AS BIGINT) AS lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: fact->fact->dim->dim join chain. lineitem/orders "
    "join shuffles on orderkey (both huge); nation (25 rows, constant) "
    "is force-broadcast; customer is SF-linear so its hint is size-gated "
    "(broadcast at test SFs, keyed shuffle at the 100-TB point).",
    tags=("join", "agg"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # customer is SF-linear: size-gate its hint; nation (25 rows) is a
    # true constant-bounded dimension and keeps the forced broadcast.
    c = broadcast_if_bounded(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        parquet_row_bound(sf_dir, "customer"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc_price_micros = cents_of(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(disc_price_micros).alias("revenue_micros"),
            F.count(F.lit(1)).alias("lineitems"),
        )
    )


@_add(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="LEFT ANTI join (SURVEY §2.3/§2.7 set-difference semantics — the "
    "reference's `needs_refresh` path-diff): customers that never "
    "placed an URGENT order. The priority filter keeps the result "
    "non-empty at every scale factor (every customer has *some* order "
    "in this dataset), so the check cannot pass vacuously on 0 rows. "
    "Broadcast the distinct key set when small; AQE converts to "
    "broadcast-anti at runtime.",
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@_add(
    "urgent_orders_with_late_items",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS -> LEFT SEMI join on the fact table, then "
    "grouped count. The semi join shuffles once on orderkey; the "
    "correlated predicate is evaluated pre-shuffle (pushed below the "
    "join) so only qualifying lineitems move.",
    tags=("join", "semi"),
)
def urgent_orders_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        o.join(
            late.select("l_orderkey").distinct(),
            o.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("orders"))
    )


@_add(
    "customer_order_left_join",
    """
    SELECT
      c.c_custkey,
      CAST(COUNT(o.o_orderkey) AS BIGINT) AS orders,
      CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS spend_cents
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="LEFT OUTER join with null-preserving aggregation — the "
    "reference's enrich-with-miss-as-null pattern (blame->commit join, "
    "SURVEY §2.3). COUNT(col) skips nulls on both engines.",
    tags=("join", "outer"),
)
def customer_order_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("orders"),
            F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias(
                "spend_cents"
            ),
        )
    )


# --------------------------------------------------------------------------
# Windows / ranking (SURVEY §2.5)
# --------------------------------------------------------------------------


@_add(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, price_rank FROM (
      SELECT
        o_custkey, o_orderkey,
        ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        ) AS price_rank
      FROM orders
    ) WHERE price_rank <= 3
    """,
    doc="Top-N per group via ROW_NUMBER (the reference's top-N-newest-PRs, "
    "SURVEY §2.5). One shuffle on the partition key; rank filter is "
    "pushed into the window via WindowGroupLimit in Spark 3.5+/4.x so "
    "only 3 rows per key survive the sort buffer.",
    tags=("window",),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
    )
    return (
        o.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("o_custkey", "o_orderkey", "price_rank")
    )


@_add(
    "customer_order_windows",
    """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS running_spend_cents,
      CAST(date_diff('day',
        LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate) AS BIGINT) AS days_since_prev,
      CAST(date_diff('day', o_orderdate,
        LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) AS BIGINT) AS days_until_next
    FROM orders
    """,
    doc="Window-function surface in one pass: frame-spec running total "
    "(rowsBetween — beyond the reference's window surface, SURVEY §2.5 "
    "notes none) plus lag/lead inter-arrival gaps, all sharing ONE "
    "shuffle+sort on (o_custkey, o_orderdate, o_orderkey). Exact cents "
    "make the running sum deterministic given the total order.",
    tags=("window", "frame", "lag"),
)
def customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents("o_totalprice")).over(wsum).alias("running_spend_cents"),
        F.datediff(odate, F.lag(odate).over(w))
        .cast("long")
        .alias("days_since_prev"),
        F.datediff(F.lead(odate).over(w), odate)
        .cast("long")
        .alias("days_until_next"),
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------


@_add(
    "nation_set_ops",
    """
    WITH cust_nations AS (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    ), euro_supp_nations AS (
      SELECT DISTINCT s_nationkey AS n_nationkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT 'no_euro_supplier' AS op, n_nationkey FROM (
      SELECT n_nationkey FROM cust_nations
      EXCEPT SELECT n_nationkey FROM euro_supp_nations
    )
    UNION ALL
    SELECT 'both' AS op, n_nationkey FROM (
      SELECT n_nationkey FROM cust_nations
      INTERSECT SELECT n_nationkey FROM euro_supp_nations
    )
    """,
    doc="EXCEPT (distinct set difference — the reference's needs_refresh "
    "path-diff) and INTERSECT in one tagged output (§2.7). The right "
    "side is restricted to EUROPE-region suppliers, so BOTH branches "
    "are structurally non-empty at every scale factor (customers span "
    "all 25 nations, Europe holds 5): the check cannot pass vacuously "
    "on 0 rows. Both branches reduce to tiny distinct key sets before "
    "the set-op shuffle.",
    tags=("setop",),
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cust_nations = c.select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    euro_supp_nations = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("s_nationkey").alias("n_nationkey"))
        .distinct()
    )
    # subtract == SQL EXCEPT (distinct); exceptAll would keep multiplicity
    no_euro = cust_nations.subtract(euro_supp_nations).select(
        F.lit("no_euro_supplier").alias("op"), "n_nationkey"
    )
    both = cust_nations.intersect(euro_supp_nations).select(
        F.lit("both").alias("op"), "n_nationkey"
    )
    return no_euro.unionByName(both)


# --------------------------------------------------------------------------
# Incremental merge semantics (SURVEY §2.10) — expressed relationally
# --------------------------------------------------------------------------


@_add(
    "incremental_merge_orders",
    """
    WITH cached AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 0 AS is_fresh
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
    ), fresh AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 1 AS is_fresh
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-12-27'
    ), unioned AS (
      SELECT * FROM cached UNION ALL SELECT * FROM fresh
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderkey ORDER BY is_fresh DESC
      ) AS rn FROM unioned
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(is_fresh AS BIGINT) AS is_fresh
    FROM ranked WHERE rn = 1
    """,
    doc="The reference's incremental upsert-with-lookback (SURVEY §2.10: "
    "fetched rows override cached by key, cached-only rows retained, "
    "5-day overlap window models the 300s lookback). Windowed dedup on "
    "the merge key == DeltaTable.merge semantics without Delta. Keys "
    "are unique per snapshot so rank-1 is deterministic.",
    tags=("incremental", "merge"),
)
def incremental_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    cutoff = F.lit("2000-01-01").cast("timestamp")
    lookback = F.lit("1999-12-27").cast("timestamp")
    cached = o.filter(F.col("o_orderdate") < cutoff).withColumn(
        "is_fresh", F.lit(0)
    )
    fresh = o.filter(F.col("o_orderdate") >= lookback).withColumn(
        "is_fresh", F.lit(1)
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("is_fresh"))
    return (
        cached.unionByName(fresh)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_orderstatus",
            cents("o_totalprice").alias("totalprice_cents"),
            F.col("is_fresh").cast("long").alias("is_fresh"),
        )
    )


@_add(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)) AS BIGINT)
             AS revenue_micros,
           CAST(STRFTIME(o.o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_micros DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> fact join chain -> "
    "grouped revenue -> deterministic top-k. The segment filter prunes "
    "customers before the (size-gated) broadcast; the filtered side is "
    "still SF-linear, so the gate uses the full-table footer count as a "
    "conservative bound.",
    tags=("join", "topk"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ~1/5 of customer still scales with SF: bound by the full-table
    # footer count (an over-estimate of the filtered side, which keeps
    # the gate conservative — never broadcasts what might not fit).
    c = broadcast_if_bounded(
        _t(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        ),
        parquet_row_bound(sf_dir, "customer"),
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = cents_of(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_micros"))
        .select(
            "l_orderkey",
            "revenue_micros",
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "orderdate"
            ),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_micros"), F.asc("l_orderkey"))
        .limit(10)
    )


@_add(
    "orders_per_customer_histogram",
    """
    SELECT order_cnt, CAST(COUNT(*) AS BIGINT) AS customers
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY order_cnt
    """,
    doc="TPC-H Q13 shape: aggregate-of-aggregate (orders per customer, "
    "then the customer-count distribution). Two shuffles by "
    "construction; the second input is already |customers| rows.",
    tags=("agg", "histogram"),
)
def orders_per_customer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(
        F.count(F.lit(1)).alias("customers")
    )


@_add(
    "orders_rollup",
    """
    SELECT
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COALESCE(o_orderstatus, 'ALL') AS status,
      CAST(COUNT(*) AS BIGINT) AS orders,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy (priority -> status -> grand total) — beyond "
    "the reference's aggregation surface (SURVEY §2.4 notes rollup is "
    "free in Spark). One Expand + one shuffle; COALESCE folds the "
    "grouping nulls into stable labels for the oracle.",
    tags=("agg", "rollup"),
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "orders",
            "revenue_cents",
        )
    )


@_add(
    "customers_above_nation_avg",
    """
    WITH nation_avg AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS avg_cents
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c JOIN nation_avg n ON c.c_nationkey = n.c_nationkey
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > n.avg_cents
    """,
    doc="Correlated-scalar-subquery shape (each customer vs their "
    "nation's average balance), decorrelated into a grouped aggregate "
    "+ equi-join — the rewrite Catalyst applies to correlated "
    "subqueries, written explicitly so the plan is one small "
    "broadcast join instead of a per-row subquery.",
    tags=("join", "subquery"),
)
def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        (
            F.sum(cents("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_cents")
    )
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(cents("c_acctbal") > F.col("avg_cents"))
        .select(
            "c_custkey",
            "c_nationkey",
            cents("c_acctbal").alias("acctbal_cents"),
        )
    )


# --- round 11: full TPC-H Q5 (six-table join with correlation pred) -------


@_add(
    "local_supplier_revenue_q5",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 1000000) AS BIGINT)) AS BIGINT)
             AS revenue_micros,
           CAST(COUNT(*) AS BIGINT) AS lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="Full TPC-H Q5 (local supplier volume): the six-table join "
    "graph — customer-orders-lineitem-supplier-nation-region — with "
    "the CROSS-FACT correlation predicate c_nationkey = s_nationkey "
    "that makes Q5 the canonical join-REORDERING benchmark (the "
    "customer side cannot be pruned until the supplier side binds, so "
    "the optimizer must pick which fact-fact join runs first). "
    "Declared as a plain join chain: Catalyst pushes the region/date "
    "filters to the scans (PushedFilters on o_orderdate, r_name), "
    "force-broadcasts only the constant dims (nation 25 rows, region "
    "5), size-gates customer and supplier (SF-linear — broadcast at "
    "test SFs, keyed shuffle at 100 TB), and the two fact-fact joins "
    "shuffle on their natural keys (orderkey, then the "
    "suppkey+nationkey compound). Money in integer micros "
    "(functions/money.py); one aggregation, map-side combinable. The "
    "four-table cousin (revenue_by_nation) stays as the simpler "
    "chain; this is the shape AQE join reordering exists for.",
    tags=("join", "agg", "tpch"),
)
def local_supplier_revenue_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    c = broadcast_if_bounded(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        parquet_row_bound(sf_dir, "customer"),
    )
    s = broadcast_if_bounded(
        _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
        parquet_row_bound(sf_dir, "supplier"),
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    disc_price_micros = cents_of(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(disc_price_micros).alias("revenue_micros"),
            F.count(F.lit(1)).alias("lineitems"),
        )
    )


# --- round 11: bag-semantics set operations (EXCEPT/INTERSECT ALL) --------


@_add(
    "part_bag_set_ops",
    """
    WITH a AS (
      SELECT l_partkey FROM lineitem WHERE l_shipdate < DATE '1997-01-01'
    ), b AS (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    ), ea AS (
      SELECT l_partkey, COUNT(*) AS c
      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1
    ), ia AS (
      SELECT l_partkey, COUNT(*) AS c
      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1
    )
    SELECT CAST(COALESCE(ea.l_partkey, ia.l_partkey) AS BIGINT)
             AS partkey,
           CAST(COALESCE(ea.c, 0) AS BIGINT) AS except_all_cnt,
           CAST(COALESCE(ia.c, 0) AS BIGINT) AS intersect_all_cnt
    FROM ea FULL JOIN ia ON ea.l_partkey = ia.l_partkey
    """,
    doc="BAG-semantics set operations with multiplicity, oracle-"
    "checked: EXCEPT ALL (per-key count_A - count_B clamped at zero) "
    "and INTERSECT ALL (min of the counts) between two overlapping "
    "multiset projections of lineitem, folded to per-key "
    "multiplicities. The set-semantics siblings (nation_set_ops, the "
    "semi/anti membership entries) lower to anti/semi joins and "
    "silently collapse duplicates — Spark's exceptAll/intersectAll "
    "keep them, a distinction that once caused a real bug in this "
    "repo (subtract vs exceptAll). Physically both lower to one "
    "aggregation computing per-key counts on each side plus "
    "replication of the surviving multiplicity — keyed exchanges "
    "only, no row-at-a-time anything, scale-safe at any corpus "
    "size. Both lanes non-vacuous on the fixture (keys appear with "
    "different multiplicities on each side).",
    tags=("setops", "bag", "join"),
)
def part_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(
        F.col("l_shipdate") < F.lit("1997-01-01").cast("date")
    ).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    ea = (
        a.exceptAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("ea_c"))
    )
    ia = (
        a.intersectAll(b)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("ia_c"))
    )
    return (
        ea.join(ia, "l_partkey", "full_outer")
        .select(
            F.col("l_partkey").cast("long").alias("partkey"),
            F.coalesce("ea_c", F.lit(0)).cast("long").alias("except_all_cnt"),
            F.coalesce("ia_c", F.lit(0)).cast("long").alias(
                "intersect_all_cnt"
            ),
        )
    )
