"""Data-quality audit + incremental rollup maintenance (round 8).

Two warehouse-operations classes the registry didn't cover:

* ``dq_referential_audit`` — the pipeline health check every ingest
  job runs before publishing: referential integrity (orphan foreign
  keys, childless parents), primary-key uniqueness, and domain/range
  constraints, emitted as ONE long-format audit table
  ``(check_name, violations, total, viol_bp)``. Passing checks report
  0 — the audit asserting cleanliness is its job; the oracle pins the
  exact counts either way (and ``orders_childless`` is non-vacuously
  positive on the fixture).
* ``rollup_incremental_merge`` — incremental view maintenance for an
  additive rollup: the per-(nation, year) revenue aggregate is
  computed as partial aggregates of a BASE batch and a DELTA batch
  merged by a second-level sum, while the oracle recomputes the
  rollup from scratch over everything. Cell-equality proves the
  merge is exact — the mergeable-monoid property that lets a 100-TB
  warehouse maintain rollups per ingest batch instead of rescanning
  history.

Scale notes: every audit branch is a column-pruned scan with map-side
conditional counts, or a keyed anti-join with NO broadcast hint on the
unbounded side (customer/orders grow with SF — AQE picks broadcast at
small scales). Branches stay separate rather than fused per table:
fusing COUNT(DISTINCT pk) with SUM(CASE) in one aggregate triggers
Spark's EXPAND-multiplied buffers (the r7 approx_lineitem_stats
incident); a union of 1-row aggregates keeps each branch
whole-stage-codegen and lets the scheduler overlap them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

DISCOUNT_MAX_OK = 0.5  # domain bound: discounts above 50% are data errors
ROLLUP_DELTA_FROM = "1999-01-01"  # orders on/after this date = delta batch


def _check(name: str, violations, total) -> DataFrame:
    return violations.crossJoin(total).select(
        F.lit(name).alias("check_name"),
        F.col("v").cast("long").alias("violations"),
        F.col("n").cast("long").alias("total"),
        F.expr("(v * 10000L) div n").alias("viol_bp"),
    )


@_add(
    "dq_referential_audit",
    f"""
    WITH o AS (SELECT * FROM orders), l AS (SELECT * FROM lineitem),
    c AS (SELECT * FROM customer),
    checks AS (
      SELECT 'lineitem_orphan_orderkey' AS check_name,
             (SELECT COUNT(*) FROM l WHERE NOT EXISTS
               (SELECT 1 FROM o WHERE o.o_orderkey = l.l_orderkey)) AS violations,
             (SELECT COUNT(*) FROM l) AS total
      UNION ALL
      SELECT 'lineitem_pk_duplicates',
             (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM l),
             (SELECT COUNT(*) FROM l)
      UNION ALL
      SELECT 'lineitem_discount_domain',
             (SELECT COALESCE(SUM(CASE WHEN l_discount < 0
                 OR l_discount > {DISCOUNT_MAX_OK} THEN 1 ELSE 0 END), 0) FROM l),
             (SELECT COUNT(*) FROM l)
      UNION ALL
      SELECT 'orders_orphan_custkey',
             (SELECT COUNT(*) FROM o WHERE NOT EXISTS
               (SELECT 1 FROM c WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(*) FROM o)
      UNION ALL
      SELECT 'orders_childless',
             (SELECT COUNT(*) FROM o WHERE NOT EXISTS
               (SELECT 1 FROM l WHERE l.l_orderkey = o.o_orderkey)),
             (SELECT COUNT(*) FROM o)
      UNION ALL
      SELECT 'orders_nonpositive_price',
             (SELECT COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) FROM o),
             (SELECT COUNT(*) FROM o)
      UNION ALL
      SELECT 'orders_pk_duplicates',
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM o),
             (SELECT COUNT(*) FROM o)
    )
    SELECT check_name, CAST(violations AS BIGINT) AS violations,
           CAST(total AS BIGINT) AS total,
           CAST((violations * 10000) // total AS BIGINT) AS viol_bp
    FROM checks ORDER BY check_name ASC
    """,
    doc="Referential/constraint audit over the orders-lineitem-customer "
    "star: orphan foreign keys and childless parents (left-anti "
    "joins, NO broadcast hint — both sides grow with the table, AQE "
    "re-plans at runtime), primary-key uniqueness (count minus "
    "distinct), and domain bounds (map-side SUM CASE), one "
    "long-format row per check with basis-point violation rates. "
    "Branches are independent 1-row aggregates unioned — fusing "
    "COUNT(DISTINCT) with SUM(CASE) in one aggregate would EXPAND-"
    "multiply every buffer (the r7 approx-stats incident class).",
    tags=("audit", "quality", "relational"),
)
def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    n_o = o.agg(F.count(F.lit(1)).alias("n"))
    n_l = li.agg(F.count(F.lit(1)).alias("n"))

    li_orphan = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    li_pk_dup = li.select("l_orderkey", "l_linenumber").agg(
        (F.count(F.lit(1)) - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))).alias("v")
    )
    li_disc = li.agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("l_discount") < 0)
                    | (F.col("l_discount") > DISCOUNT_MAX_OK),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("v")
    )
    o_orphan = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    o_childless = (
        o.select("o_orderkey")
        .join(li.select("l_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    o_price = o.agg(
        F.coalesce(
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)), F.lit(0)
        ).alias("v")
    )
    o_pk_dup = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v")
    )

    out = (
        _check("lineitem_orphan_orderkey", li_orphan, n_l)
        .unionByName(_check("lineitem_pk_duplicates", li_pk_dup, n_l))
        .unionByName(_check("lineitem_discount_domain", li_disc, n_l))
        .unionByName(_check("orders_orphan_custkey", o_orphan, n_o))
        .unionByName(_check("orders_childless", o_childless, n_o))
        .unionByName(_check("orders_nonpositive_price", o_price, n_o))
        .unionByName(_check("orders_pk_duplicates", o_pk_dup, n_o))
    )
    return out.orderBy(F.asc("check_name"))


@_add(
    "rollup_incremental_merge",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
    ORDER BY nation ASC, order_year ASC
    """,
    doc="Incremental view maintenance for an additive rollup, proved "
    "exact: the Spark side computes the per-(nation, year) revenue "
    "rollup as TWO partial aggregates — a base batch (orders before "
    f"{ROLLUP_DELTA_FROM}) and a delta batch (on/after) — merged by a "
    "second-level SUM, while the oracle recomputes from scratch over "
    "all orders. Cell-equality proves the additive-monoid merge: a "
    "warehouse can fold each ingest batch's partial aggregate into "
    "the stored rollup instead of rescanning history (revenue in "
    "exact integer cents, so the merge is associative bit-for-bit). "
    "The dimension join (nation) broadcasts; the batch split predicate "
    "pushes to the orders scan.",
    tags=("relational", "incremental", "rollup"),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def partial(batch: DataFrame) -> DataFrame:
        return (
            batch.join(c, batch["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("long").alias("order_year"),
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(cents("o_totalprice")).cast("long").alias("revenue_cents"),
            )
        )

    base = partial(o.filter(F.col("o_orderdate") < ROLLUP_DELTA_FROM))
    delta = partial(o.filter(F.col("o_orderdate") >= ROLLUP_DELTA_FROM))
    # the IVM merge: second-level SUM over the two partial aggregates
    return (
        base.unionByName(delta)
        .groupBy("nation", "order_year")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
        .orderBy(F.asc("nation"), F.asc("order_year"))
    )


# --- round 9: CDC apply (upserts + DELETES) -------------------------------
#
# rollup_incremental_merge proves additive-merge IVM and
# incremental_merge_orders (tail) proves recency upserts; neither
# covers the third face of warehouse maintenance: a change-data-capture
# feed carrying DELETE operations. The change batch is derived
# deterministically from the base table (both engines construct the
# SAME feed), applied with MERGE semantics — update matched, insert
# unmatched, delete tombstoned — and the result is profiled.

CDC_UPDATE_MOD = 10  # o_orderkey % 10 == 3 -> status/price update
CDC_DELETE_MOD = 10  # o_orderkey % 10 == 7 -> tombstone
CDC_INSERT_OFFSET = 1_000_000_000  # synthetic new keys: key + offset


@_add(
    "cdc_apply_changes",
    f"""
    WITH changes AS (
      SELECT o_orderkey AS key, 'U' AS op,
             'X' AS new_status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100 AS new_cents
      FROM orders WHERE o_orderkey % {CDC_UPDATE_MOD} = 3
      UNION ALL
      SELECT o_orderkey, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % {CDC_DELETE_MOD} = 7
      UNION ALL
      SELECT o_orderkey + {CDC_INSERT_OFFSET}, 'I', 'N',
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % {CDC_UPDATE_MOD} = 3
    ), applied AS (
      -- MERGE: keep base rows without a tombstone, applying updates
      SELECT o.o_orderkey AS key,
             COALESCE(c.new_status, o.o_orderstatus) AS status,
             COALESCE(c.new_cents,
                      CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      LEFT JOIN changes c ON c.key = o.o_orderkey AND c.op IN ('U', 'D')
      WHERE c.op IS NULL OR c.op = 'U'
      UNION ALL
      -- ...plus inserts for keys not in the base table
      SELECT c.key, c.new_status, c.new_cents
      FROM changes c LEFT JOIN orders o ON o.o_orderkey = c.key
      WHERE c.op = 'I' AND o.o_orderkey IS NULL
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS rows_,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MIN(key) AS BIGINT) AS min_key,
           CAST(MAX(key) AS BIGINT) AS max_key
    FROM applied
    GROUP BY status
    ORDER BY status ASC
    """,
    doc="Change-data-capture apply with all three operations — the "
    "MERGE INTO semantics a warehouse table feed needs: a "
    "deterministic change batch (updates for keys ≡3 mod 10, DELETE "
    "tombstones for keys ≡7, inserts under offset keys) applied to "
    "orders as update-matched / delete-matched / insert-unmatched, "
    "profiled per resulting status. The apply is two keyed joins (a "
    "left join carrying the update/tombstone lane, an anti-shaped "
    "left join for the insert lane) — no broadcast hints on the "
    "SF-scaling sides, so Catalyst/AQE pick the strategy; at 100 TB "
    "this is the join-based MERGE a real table format executes under "
    "its transaction log (sources/layout.write_versioned holds the "
    "snapshot-commit face of the same story). Complements the "
    "additive-IVM and recency-upsert entries with the delete path.",
    tags=("relational", "incremental", "cdc"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") % CDC_UPDATE_MOD == 3).select(
        F.col("o_orderkey").alias("key"),
        F.lit("U").alias("op"),
        F.lit("X").alias("new_status"),
        (cents("o_totalprice") + 100).alias("new_cents"),
    )
    dele = o.filter(F.col("o_orderkey") % CDC_DELETE_MOD == 7).select(
        F.col("o_orderkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("long").alias("new_cents"),
    )
    ins = o.filter(F.col("o_orderkey") % CDC_UPDATE_MOD == 3).select(
        (F.col("o_orderkey") + CDC_INSERT_OFFSET).alias("key"),
        F.lit("I").alias("op"),
        F.lit("N").alias("new_status"),
        cents("o_totalprice").alias("new_cents"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    matched = (
        o.join(
            changes.filter(F.col("op").isin("U", "D")),
            o.o_orderkey == F.col("key"),
            "left",
        )
        .filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            F.col("o_orderkey").alias("key"),
            F.coalesce(F.col("new_status"), F.col("o_orderstatus")).alias(
                "status"
            ),
            F.coalesce(F.col("new_cents"), cents("o_totalprice")).alias(
                "cents"
            ),
        )
    )
    inserts = (
        changes.filter(F.col("op") == "I")
        .join(o, o.o_orderkey == F.col("key"), "left_anti")
        .select(
            "key",
            F.col("new_status").alias("status"),
            F.col("new_cents").alias("cents"),
        )
    )
    return (
        matched.unionByName(inserts)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.min("key").cast("long").alias("min_key"),
            F.max("key").cast("long").alias("max_key"),
        )
        .orderBy(F.asc("status"))
    )
