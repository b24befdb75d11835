"""Tail registry entry: engine-neutral approximate aggregates.

``approx_lineitem_stats`` exposes Spark's native sketch surface
(HLL++, GK quantiles) and is rows-only by contract — those sketches
are engine-specific.  This entry is the complementary claim: the
SEMANTICS of sketching (bounded-memory distinct counts and quantiles)
do not require engine-specific algorithms.  Both estimators here are
deterministic functions of md5, so DuckDB reproduces Spark's output
cell-exactly, and every output column is integral — no float hashing
risk at all.

* **KMV distinct estimate** (k-minimum-values, Bar-Yossef et al.
  2002): hash each value to 32 bits (the md5-bucket family every
  sampler in this repo uses), keep the k smallest distinct hashes,
  estimate |D| ~ (k-1) * 2^32 / h_(k).  The k-smallest set is a
  ``TakeOrderedAndProject`` (distributed top-k, never a full sort)
  over the distinct hashes; memory is O(k) per group at any corpus
  size.  Output is ``floor``-ed to BIGINT — floor, not round, so
  there is no half-way-rounding divergence between engines.
* **Discrete quantiles over a deterministic hash sample**: rows whose
  md5 bucket of (orderkey, linenumber) falls under the sample rate —
  the budget-sampler predicate, so both engines select the SAME rows
  — then the exact value at rank ``ceil(p * n_sample)`` of the sorted
  sample, computed with the same formula in both engines (array sort
  + element_at).  Values are integer cents (functions/money.py
  discipline).  The sample is collected into one array per aggregate:
  bounded by rate * |table|; a production deployment pins the sample
  size with a fixed-size bottom-k-by-hash instead (same md5 machinery
  as KMV) — the rate form keeps the oracle a pure SQL expression.

Registered past the driver's 50-entry verdict window (plans/core.py
policy); the local cell-exact checker (CORRECTNESS_TAIL.json) and the
bench cover it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_h32, md5_h32_sql
from ..sources.tables import load_table
from .core import REGISTRY

KMV_K = 256
SAMPLE_BUCKETS = 1_000_000
SAMPLE_THRESHOLD = 20_000  # 2% deterministic row sample
QUANTILES = {"p50": 0.5, "p95": 0.95, "p99": 0.99}
_POW32 = 4294967296.0  # 2^32 as a double, exact


# the repo-wide md5-h32 family (functions/hashing.py)
_h32_col = md5_h32
_h32_sql = md5_h32_sql


def _kmv_est_col(hk):
    return F.floor(F.lit(KMV_K - 1) * F.lit(_POW32) / hk).cast("long")


def _kmv_cte(col: str, name: str) -> str:
    return f"""{name}_d AS (
      SELECT DISTINCT {_h32_sql(col)} AS h FROM lineitem
    ), {name}_k AS (
      SELECT MAX(h) AS hk FROM (
        SELECT h FROM {name}_d ORDER BY h ASC LIMIT {KMV_K})
    )"""


def _q_sql(tag: str, p: float) -> str:
    return (
        f"sample_cents[CAST(greatest(1, ceil({p} * len(sample_cents)))"
        f" AS BIGINT)] AS {tag}_cents"
    )


_ORACLE = f"""
WITH {_kmv_cte("l_orderkey", "ok")}, {_kmv_cte("l_partkey", "pk")},
exact AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
  FROM lineitem
), samp AS (
  -- COALESCE: list() over zero sampled rows is NULL in DuckDB but an
  -- empty array in Spark (collect_list); normalize so sample_rows=0
  -- and NULL quantiles agree across engines at any input size
  SELECT COALESCE(
           list_sort(list(CAST(ROUND(l_extendedprice * 100) AS BIGINT))),
           CAST([] AS BIGINT[])) AS sample_cents
  FROM lineitem
  WHERE ({_h32_sql("l_orderkey || '-' || l_linenumber")}
         % {SAMPLE_BUCKETS}) < {SAMPLE_THRESHOLD}
)
SELECT
  CAST(floor({KMV_K - 1} * {_POW32} / ok_k.hk) AS BIGINT) AS kmv_orders,
  exact.exact_orders,
  CAST(floor({KMV_K - 1} * {_POW32} / pk_k.hk) AS BIGINT) AS kmv_parts,
  exact.exact_parts,
  {", ".join(_q_sql(t, p) for t, p in QUANTILES.items())},
  CAST(len(sample_cents) AS BIGINT) AS sample_rows
FROM ok_k, pk_k, exact, samp
"""


@REGISTRY.add(
    "kmv_sketch_stats",
    _ORACLE,
    doc="Engine-neutral approximate aggregates, oracle-checked "
    "cell-exact: KMV (k-minimum-values) distinct estimates for "
    "orderkey/partkey — k smallest distinct 32-bit md5 hashes via "
    "distributed top-k (TakeOrderedAndProject, O(k) memory at any "
    "scale), estimate floor((k-1)*2^32/h_k) as BIGINT, shown next to "
    "the exact COUNT DISTINCT so the error is visible — plus "
    "discrete p50/p95/p99 price quantiles in integer cents over a 2% "
    "deterministic md5-sampled row subset (both engines select the "
    "same rows and the same sorted-rank element). The complementary "
    "claim to rows-only approx_lineitem_stats: bounded-memory "
    "sketching semantics without engine-specific sketch binaries. "
    "Every output column is integral — zero float-hash surface.",
    tags=("approx", "sketch", "agg"),
)
def kmv_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketch_over(load_table(spark, sf_dir, "lineitem"))


def sketch_over(li: DataFrame) -> DataFrame:
    """The sketch pipeline over any lineitem-shaped DataFrame —
    factored out so tests can pin partitioning-independence."""

    def kmv(col: str):
        hashes = li.select(_h32_col(F.col(col)).alias("h")).distinct()
        return (
            hashes.orderBy(F.asc("h"))
            .limit(KMV_K)
            .agg(F.max("h").alias("hk"))
        )

    exact = li.agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    skey = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    samp = (
        li.filter(_h32_col(skey) % SAMPLE_BUCKETS < SAMPLE_THRESHOLD)
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .agg(F.sort_array(F.collect_list("cents")).alias("sample_cents"))
    )
    # try_element_at: on an empty sample (possible below ~50 rows) the
    # rank index 1 is out of bounds — return NULL like the DuckDB
    # twin's out-of-bounds list index instead of an ANSI error
    q_cols = [
        F.try_element_at(
            F.col("sample_cents"),
            F.greatest(
                F.lit(1),
                F.ceil(F.lit(p) * F.size("sample_cents")),
            ).cast("int"),
        ).alias(f"{tag}_cents")
        for tag, p in QUANTILES.items()
    ]
    return (
        kmv("l_orderkey")
        .select(_kmv_est_col(F.col("hk")).alias("kmv_orders"))
        .crossJoin(F.broadcast(exact))
        .crossJoin(
            F.broadcast(
                kmv("l_partkey").select(
                    _kmv_est_col(F.col("hk")).alias("kmv_parts")
                )
            )
        )
        .crossJoin(F.broadcast(samp))
        .select(
            "kmv_orders",
            "exact_orders",
            "kmv_parts",
            "exact_parts",
            *q_cols,
            F.size("sample_cents").cast("long").alias("sample_rows"),
        )
    )
