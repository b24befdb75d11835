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


# --- round 10: two-pass histogram exact quantiles ---------------------------
#
# doc_length_percentiles documents its own 100-TB weakness: Spark's
# percentile_disc buffers every (group, value) pair in per-group sort
# state. This entry computes the SAME exact percentiles with NO sort
# buffer anywhere — the classic two-pass histogram selection (the
# distributed k-th-element algorithm; cf. Blum et al. selection and
# every MPP engine's exact-median path):
#
#   pass 1: count per (source, value div B) — a domain-bounded
#           histogram (B=256 -> at most ceil(domain/256) buckets per
#           group), map-side combinable, tiny exchange;
#   pass 2: rescan ONLY the one bucket per (group, quantile) that the
#           cumulative histogram pins the target rank into, count the
#           <=B distinct values inside it, and pick the smallest value
#           whose cumulative count reaches the rank.
#
# Both passes move COUNTS, never values; every window below runs over
# a domain-bounded table (buckets per group, then values per bucket),
# so the operator scales with the value DOMAIN, not the corpus. The
# oracle is percentile_disc itself — cell-equality proves the
# histogram selection implements the ANSI definition exactly
# (smallest element with cume_dist >= q, i.e. cum*100 >= q*n in
# integers; no doubles anywhere).

HISTO_BUCKET = 256


@_add(
    "doc_length_quantiles_histogram",
    # The oracle states the ANSI percentile_disc rank in INTEGERS
    # (cum*100 >= q*n), the exact predicate the Spark side uses —
    # NOT percentile_disc(q/100), whose inexact double literal (0.9,
    # 0.99) can disagree by one element when q*n lands exactly on an
    # element boundary. Both engines now share one integer definition.
    f"""
    WITH vals AS (
      SELECT source, n_chars, COUNT(*) AS c
      FROM documents GROUP BY source, n_chars
    ), cum AS (
      SELECT source, n_chars,
             SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY source) AS n
      FROM vals
    ), picks AS (
      SELECT source, q, MIN(n_chars) AS v, MIN(n) AS n
      FROM cum
      CROSS JOIN (SELECT unnest([{", ".join(str(q) for q in QUANTILES)}])
                  AS q) qs
      WHERE cum * 100 >= q * n
      GROUP BY source, q
    )
    SELECT source,
           CAST(MIN(n) AS BIGINT) AS docs,
           {", ".join(
               f"CAST(MAX(CASE WHEN q = {q} THEN v END) AS BIGINT)"
               f" AS hp{q}_chars"
               for q in QUANTILES
           )}
    FROM picks
    GROUP BY source
    """,
    doc="The SAME exact per-source p50/p90/p99 as "
    "doc_length_percentiles, computed by two-pass histogram selection "
    f"instead of per-group sort buffers: pass 1 aggregates counts per "
    f"(source, n_chars div {HISTO_BUCKET}) — a domain-bounded "
    "histogram whose exchange moves counts, not values; the "
    "cumulative histogram pins each quantile's target rank "
    "(cum*100 >= q*n, integer-exact ANSI percentile_disc) into ONE "
    f"bucket; pass 2 rescans only that bucket's <= {HISTO_BUCKET} "
    "distinct values and selects the element. Every window is "
    "domain-bounded (buckets per group, then values per bucket), so "
    "the plan scales with the value DOMAIN, not the corpus — the "
    "100-TB exact-quantile shape the sibling entry names as its own "
    "limit. Oracle = the ANSI percentile_disc rank written in "
    "integers (cumulative-count window, cum*100 >= q*n) so both "
    "engines share the exact definition — no inexact 0.9/0.99 double "
    "literals on either side.",
    tags=("documents", "quantile", "two-pass"),
)
def doc_length_quantiles_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    h1 = d.groupBy(
        "source", F.expr(f"n_chars div {HISTO_BUCKET}").alias("hi")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_src = Window.partitionBy("source")
    run = (
        Window.partitionBy("source")
        .orderBy(F.asc("hi"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h1.select(
        "source",
        "hi",
        "cnt",
        F.sum("cnt").over(run).alias("cum"),
        F.sum("cnt").over(per_src).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in QUANTILES])).alias("q")
    # smallest bucket whose cumulative count reaches the target rank;
    # min(struct) picks it together with its preceding-buckets base
    targets = (
        cum.select("source", "hi", "cum", "cnt", "n", qs)
        .filter(F.col("cum") * 100 >= F.col("q") * F.col("n"))
        .groupBy("source", "q")
        .agg(
            F.min(
                F.struct(
                    F.col("hi"),
                    (F.col("cum") - F.col("cnt")).alias("base"),
                    F.col("n"),
                )
            ).alias("t")
        )
        .select(
            "source", "q", F.col("t.hi").alias("hi"),
            F.col("t.base").alias("base"), F.col("t.n").alias("n"),
        )
    )
    # pass 2: only the pinned buckets' values are rescanned; the join
    # is keyed on (source, bucket) — targets is |sources| x |quantiles|
    # rows, hint-free (AQE broadcasts it at runtime)
    in_bucket = d.withColumn(
        "hi", F.expr(f"n_chars div {HISTO_BUCKET}")
    ).join(targets, ["source", "hi"])
    h2 = in_bucket.groupBy("source", "q", "base", "n", "n_chars").agg(
        F.count(F.lit(1)).alias("c")
    )
    run2 = (
        Window.partitionBy("source", "q")
        .orderBy(F.asc("n_chars"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    picked = (
        h2.withColumn("cum2", F.sum("c").over(run2))
        .filter((F.col("base") + F.col("cum2")) * 100 >= F.col("q") * F.col("n"))
        .groupBy("source", "q")
        .agg(F.min("n_chars").alias("v"), F.min("n").alias("n"))
    )
    return picked.groupBy("source").agg(
        F.min("n").cast("long").alias("docs"),
        *[
            F.max(F.when(F.col("q") == q, F.col("v")))
            .cast("long")
            .alias(f"hp{q}_chars")
            for q in QUANTILES
        ],
    )


# --- round 11: exact-integer PERCENTILE_CONT -------------------------------
#
# The quantile family's third face: percentile_disc picks an element
# (doc_length_percentiles), the two-pass histogram pins the same
# element without sort buffers (doc_length_quantiles_histogram) — and
# PERCENTILE_CONT interpolates between the two straddling elements,
# which every engine evaluates in floating point (q*(n-1) with q an
# inexact double literal: the same half-boundary hazard the histogram
# entry's oracle was rewritten to avoid). With integer percents and
# integer values the ANSI definition is EXACT RATIONAL arithmetic at
# scale 100: rank*100 = q*(n-1) splits into idx = (q*(n-1)) div 100
# and rem = (q*(n-1)) mod 100, and
#
#   percentile_cont * 100 = lo * (100 - rem) + hi * rem
#
# where lo/hi are the elements at ranks idx+1 and idx+2 (1-based) —
# an integral both engines compute bit-identically, no doubles
# anywhere. row_number's tie order among equal values never matters:
# the VALUE at any rank of a sorted-by-value sequence is well-defined.


@_add(
    "doc_length_percentile_cont",
    f"""
    WITH vals AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars)
               AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), t AS (
      SELECT DISTINCT source, n, q,
             (q * (n - 1)) // 100 + 1 AS lo_rn,
             (q * (n - 1)) % 100 AS rem
      FROM vals, (SELECT unnest([{", ".join(str(q) for q in QUANTILES)}])
                  AS q) qs
    )
    SELECT t.source,
           CAST(t.q AS BIGINT) AS q,
           CAST(MIN(CASE WHEN v.rn = t.lo_rn THEN v.n_chars END)
                  * (100 - t.rem)
                + MIN(CASE WHEN v.rn = LEAST(t.lo_rn + 1, t.n)
                      THEN v.n_chars END) * t.rem
                AS BIGINT) AS pcont_x100
    FROM t
    JOIN vals v ON v.source = t.source
               AND v.rn IN (t.lo_rn, LEAST(t.lo_rn + 1, t.n))
    GROUP BY t.source, t.q, t.rem
    """,
    doc="ANSI PERCENTILE_CONT per source at p50/p90/p99, computed as "
    "EXACT integer arithmetic at scale 100: the interpolation rank "
    "q*(n-1) splits into integer index and remainder, and the "
    "interpolated value times 100 is lo*(100-rem) + hi*rem over the "
    "two straddling elements — no inexact 0.9/0.99 double literal "
    "and no float multiply on either engine, so the hash-fragile "
    "definition becomes hash-exact (the CONT face of the family "
    "whose DISC faces are doc_length_percentiles and the two-pass "
    "histogram). One rank window per group + a 3-row-per-group "
    "rank-targeted semi-join; the scale path for the ranking itself "
    "is the histogram entry's counts-only selection, unchanged.",
    tags=("documents", "quantile", "interpolation"),
)
def doc_length_percentile_cont(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    w_rn = Window.partitionBy("source").orderBy(F.asc("n_chars"))
    w_all = Window.partitionBy("source")
    vals = d.select(
        "source",
        "n_chars",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(q).cast("long") for q in QUANTILES])
    ).alias("q")
    # break the self-join lineage ambiguity: t derives from vals, so
    # rename every t column before joining back
    t = (
        vals.select(F.col("source").alias("t_source"), F.col("n").alias("tn"))
        .distinct()
        .select("t_source", "tn", qs)
        .select(
            "t_source",
            "tn",
            "q",
            (F.expr("(q * (tn - 1)) div 100") + 1).alias("lo_rn"),
            F.expr("(q * (tn - 1)) % 100").alias("rem"),
        )
    )
    j = vals.join(
        t,
        (F.col("source") == F.col("t_source"))
        & (
            (F.col("rn") == F.col("lo_rn"))
            | (F.col("rn") == F.least(F.col("lo_rn") + 1, F.col("tn")))
        ),
    ).select("source", "q", "rem", "lo_rn", "tn", "rn", "n_chars")
    return (
        j.groupBy("source", "q", "rem")
        .agg(
            F.min(
                F.when(F.col("rn") == F.col("lo_rn"), F.col("n_chars"))
            ).alias("lo"),
            F.min(
                F.when(
                    F.col("rn")
                    == F.least(F.col("lo_rn") + 1, F.col("tn")),
                    F.col("n_chars"),
                )
            ).alias("hi"),
        )
        .select(
            "source",
            F.col("q").cast("long").alias("q"),
            (
                F.col("lo") * (F.lit(100) - F.col("rem"))
                + F.col("hi") * F.col("rem")
            )
            .cast("long")
            .alias("pcont_x100"),
        )
    )
