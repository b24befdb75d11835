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
    "orders_by_status",
    """
    SELECT
      CAST(COUNT(*) AS BIGINT) AS total_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_orders
    FROM orders
    """,
    doc="Scenario-1 analog (SURVEY §2.11#1): conditional counts via "
    "SUM(CASE). Single partial-aggregated scan, one-row result.",
    tags=("agg", "conditional"),
)
def orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "open_orders"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "finished_orders"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias(
            "partial_orders"
        ),
    )


@_add(
    "order_date_range",
    """
    SELECT
      CAST(STRFTIME(MIN(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS first_order,
      CAST(STRFTIME(MAX(o_orderdate), '%Y-%m-%dT%H:%M:%SZ') AS VARCHAR) AS last_order
    FROM orders
    """,
    doc="Scenario-7 analog (SURVEY §2.11#7): min/max over a timestamp "
    "column, emitted in the GitHub wire format for engine-neutral "
    "comparison.",
    tags=("agg", "timestamp"),
)
def order_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    return o.agg(
        F.date_format(F.min("o_orderdate"), fmt).alias("first_order"),
        F.date_format(F.max("o_orderdate"), fmt).alias("last_order"),
    )


@_add(
    "distinct_counts",
    """
    SELECT
      CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS segments,
      CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS customer_nations,
      CAST(COUNT(*) AS BIGINT) AS customers
    FROM customer
    """,
    doc="Scenario-3 analog (SURVEY §2.11#3): exact COUNT(DISTINCT). At "
    "100 TB swap to approx_count_distinct, which this plan shape "
    "(expand + partial agg) makes a one-line change.",
    tags=("agg", "distinct"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.agg(
        F.countDistinct("c_mktsegment").alias("segments"),
        F.countDistinct("c_nationkey").alias("customer_nations"),
        F.count(F.lit(1)).alias("customers"),
    )


@_add(
    "avg_acctbal_by_segment",
    """
    SELECT
      c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS customers,
      CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents,
      CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0 AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Exact average: integer-cents sum then one final division — "
    "bit-identical on any engine/partitioning (functions/money.py).",
    tags=("agg",),
)
def avg_acctbal_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(cents("c_acctbal")).alias("sum_acctbal_cents"),
        )
        .withColumn(
            "avg_acctbal",
            dollars(F.col("sum_acctbal_cents").cast("double") / F.col("customers")),
        )
    )


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
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT 10
    """,
    doc="Fact-dim equi-join + grouped agg + deterministic top-k. The "
    "customer side is broadcast (no fact shuffle for the join); the agg "
    "groups on the join key so AQE can reuse the broadcast output; "
    "ORDER+LIMIT lowers to TakeOrderedAndProject (no global sort).",
    tags=("join", "topk"),
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
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
    "join shuffles on orderkey (both huge); customer and nation are "
    "broadcast so the fact stream never reshuffles for them.",
    tags=("join", "agg"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc_price_micros = cents_of(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
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
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join (SURVEY §2.3/§2.7 set-difference semantics — the "
    "reference's `needs_refresh` path-diff). Broadcast the distinct key "
    "set when small; AQE converts to broadcast-anti at runtime.",
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
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
    "customer_spend_running",
    """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS running_spend_cents
    FROM orders
    """,
    doc="Frame-spec running total (rowsBetween) — beyond the reference's "
    "window surface (SURVEY §2.5 notes none); exact cents make the "
    "running sum deterministic given the total order (date, orderkey).",
    tags=("window", "frame"),
)
def customer_spend_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents("o_totalprice")).over(w).alias("running_spend_cents"),
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------


@_add(
    "nations_customers_no_suppliers",
    """
    SELECT n_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    doc="EXCEPT (distinct set difference) — §2.7. Both branches reduce to "
    "small distinct key sets before the set-op shuffle.",
    tags=("setop",),
)
def nations_customers_no_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cust_nations = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("n_nationkey")
    supp_nations = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("n_nationkey")
    # subtract == SQL EXCEPT (distinct); exceptAll would keep multiplicity
    return cust_nations.subtract(supp_nations)


@_add(
    "nations_with_both",
    """
    SELECT n_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    doc="INTERSECT — §2.7 (not in the reference; free in Spark).",
    tags=("setop",),
)
def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("n_nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("n_nationkey")))
    )


# --------------------------------------------------------------------------
# Conditional pivot (SURVEY §2.11 scenario 8)
# --------------------------------------------------------------------------


@_add(
    "orders_priority_by_status",
    """
    SELECT
      o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_cnt,
      CAST(COUNT(*) AS BIGINT) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Scenario-8 analog: SUM(CASE) pivot by a second key. Explicit "
    "conditional aggregates (not .pivot()) keep the column set static "
    "for the oracle and avoid a distinct-values pre-pass at scale.",
    tags=("agg", "pivot"),
)
def orders_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def cnt(status: str, alias: str):
        return F.sum(
            F.when(F.col("o_orderstatus") == status, 1).otherwise(0)
        ).alias(alias)

    return o.groupBy("o_orderpriority").agg(
        cnt("O", "open_cnt"),
        cnt("F", "finished_cnt"),
        cnt("P", "partial_cnt"),
        F.count(F.lit(1)).alias("total"),
    )


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
    "customers before the broadcast, so the fact scan only keeps "
    "matching orders.",
    tags=("join", "topk"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
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
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
    "forecast_revenue_change",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT)
             AS revenue_delta_e4,
           CAST(COUNT(*) AS BIGINT) AS qualifying_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-side conjunctive filter + one "
    "aggregate — every predicate reaches the parquet reader "
    "(PushedFilters), no shuffle beyond the one-row final agg.",
    tags=("filter", "agg"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                cents_of(F.col("l_extendedprice") * F.col("l_discount"), 4)
            ).alias("revenue_delta_e4"),
            F.count(F.lit(1)).alias("qualifying_items"),
        )
    )


@_add(
    "customer_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS BIGINT) AS days_since_prev,
           CAST(date_diff('day', o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             ) AS BIGINT) AS days_until_next
    FROM orders
    """,
    doc="lag/lead over a per-customer time order — inter-arrival gap "
    "analysis; both window functions share one shuffle+sort.",
    tags=("window", "lag"),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("long").alias("days_since_prev"),
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("days_until_next"),
    )


@_add(
    "part_type_words",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS parts,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS brands
    FROM (SELECT p_brand, unnest(string_split(p_type, ' ')) AS word FROM part)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="split + explode + grouped distinct over an array column "
    "(SURVEY §2.8 array ops): tokenize p_type, count parts and "
    "distinct brands per word.",
    tags=("array", "explode"),
)
def part_type_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_brand", F.explode(F.split("p_type", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("parts"),
            F.countDistinct("p_brand").alias("brands"),
        )
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
    "big_spenders",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(*) AS BIGINT) AS orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS lifetime_cents
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    HAVING SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) > 150000000
    """,
    doc="TPC-H Q18 shape: grouped aggregate + HAVING threshold (large-"
    "volume customers over \\$1.5M lifetime). The HAVING predicate "
    "runs post-aggregation on |customers| rows — nothing extra "
    "shuffles.",
    tags=("agg", "having"),
)
def big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(cents("o_totalprice")).alias("lifetime_cents"),
        )
        .filter(F.col("lifetime_cents") > 150_000_000)
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
