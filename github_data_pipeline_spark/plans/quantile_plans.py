"""Exact grouped quantiles — the sort-based counterpart of the KMV
sketch (``kmv_sketch_stats``): ``percentile_disc`` picks an actual
data element (no interpolation, no doubles), so the result is
hash-exact across engines and the operator contrast is explicit —
exact-but-shuffles-the-column vs mergeable-O(k)-sketch.

Spark executes inverse-distribution functions with a partial
TypedImperativeAggregate (per-group sorted buffers merged on the
reduce side), not a global sort; DuckDB runs its own quantile_disc.
Both implement the ANSI PERCENTILE_DISC convention (smallest element
with cumulative distribution >= q), verified element-identical here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

QUANTILES = (50, 90, 99)


def _disc(q: int) -> str:
    return (
        f"CAST(percentile_disc({q / 100}) WITHIN GROUP (ORDER BY n_chars)"
        f" AS BIGINT) AS p{q}_chars"
    )


@_add(
    "doc_length_percentiles",
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           {", ".join(_disc(q) for q in QUANTILES)}
    FROM documents
    GROUP BY source
    """,
    doc="Exact per-source length percentiles via ANSI percentile_disc "
    "(p50/p90/p99 of n_chars) — the exact twin of the KMV sketch "
    "quantiles in kmv_sketch_stats. percentile_disc returns an actual "
    "element, so no interpolated doubles cross the hash comparison. "
    "At 100 TB the exact path shuffles every (source, n_chars) pair "
    "into per-group sort buffers, which is why the sketch exists; "
    "this query IS the documented trade-off, and the projection "
    "carries only the 2 needed columns to the exchange.",
    tags=("documents", "quantile"),
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    aggs = [F.count(F.lit(1)).alias("docs")] + [
        F.expr(
            f"percentile_disc({q / 100}) WITHIN GROUP (ORDER BY n_chars)"
        )
        .cast("long")
        .alias(f"p{q}_chars")
        for q in QUANTILES
    ]
    return d.groupBy("source").agg(*aggs)


OUTLIER_SIGMAS = 3  # flag events beyond 3 standard deviations


@_add(
    "events_value_outliers",
    f"""
    WITH ev AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ), st AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS s,
             CAST(SUM(cents * cents) AS HUGEINT) AS q
      FROM ev GROUP BY event_type
    )
    SELECT ev.event_type,
           CAST(st.n AS BIGINT) AS events,
           CAST(st.s // st.n AS BIGINT) AS mean_cents_floor,
           CAST(SUM(CASE WHEN
             (st.n * ev.cents - st.s) * (st.n * ev.cents - st.s)
               > {OUTLIER_SIGMAS * OUTLIER_SIGMAS} * (st.n * st.q - st.s * st.s)
             THEN 1 ELSE 0 END) AS BIGINT) AS outliers_3sigma
    FROM ev JOIN st ON ev.event_type = st.event_type
    GROUP BY ev.event_type, st.n, st.s, st.q
    """,
    doc="Statistical data-quality gate: count events whose value is "
    "beyond 3 population standard deviations of their type's mean — "
    "entirely in EXACT 128-bit integer arithmetic (non-vacuous: the "
    "value column is heavy-tailed, 188 events flagged at sf0.01). The "
    "z-score test |x - mean| > k*sigma cross-multiplies to "
    "(n*x - s)^2 > k^2*(n*q - s^2) over the integer cent moments "
    "(n, s=SUM x, q=SUM x^2), so no doubles, no division, no sqrt — "
    "order-independent and hash-exact at any scale (Spark "
    "decimal(38,0) vs DuckDB HUGEINT, compared only as booleans). "
    "Two passes over (event_type, cents): moments (partial-agg "
    "shuffle), then the flag pass with the tiny per-type moment table "
    "broadcast back — the textbook two-pass variance shape that "
    "avoids Welford state entirely.",
    tags=("events", "quality", "stats"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.money import cents

    e = load_table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("cents")
    )
    dec = "decimal(38,0)"
    x = F.col("cents")
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x).cast(dec).alias("s"),
        F.sum(x * x).cast(dec).alias("q"),
    )
    j = e.join(F.broadcast(st), "event_type")
    dev = F.col("n") * F.col("cents").cast(dec) - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    is_out = (
        (dev * dev) > F.lit(OUTLIER_SIGMAS * OUTLIER_SIGMAS) * var_n2
    ).cast("int")
    return (
        j.groupBy("event_type", "n", "s", "q")
        .agg(F.sum(is_out).cast("long").alias("outliers_3sigma"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("events"),
            # integral `div`, NOT (s / n).cast("long"): decimal `/`
            # rounds HALF_UP at the result scale before the cast, so
            # s/n = x.9999995 would round up to x+1 where exact
            # integer division gives x. `div` is exact truncation
            # toward zero — the same semantics as DuckDB HUGEINT `//`
            # (verified: both give -7//2 = -3), negative-safe.
            F.expr("CAST(s div n AS BIGINT)").alias("mean_cents_floor"),
            "outliers_3sigma",
        )
    )
