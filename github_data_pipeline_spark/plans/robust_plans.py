"""Arg-extreme downsampling (OHLC bars) and robust statistics
(median/MAD outlier gates) — two aggregation classes the registry's
agg family doesn't yet cover.

* ``events_hourly_ohlc`` — time-bucket downsampling with ARG-extremes:
  open/close are the values AT the earliest/latest event of each
  bucket, not extremes OF the values. The classic financial bar, and
  the generic "first/last observation per window" every telemetry
  pipeline needs. Exactness hinges on a deterministic tie-break: both
  engines take MIN/MAX over a struct ordered (ts, event_id, value) —
  lexicographic on a UNIQUE (ts, event_id) prefix, so the value field
  never arbitrates and the result is partitioning-independent.
* ``events_robust_outliers`` — the median/MAD twin of
  ``events_value_outliers`` (mean/stddev): robust center and scale
  with a 50% breakdown point, so the flagged tail cannot drag the
  gate that flags it (the known failure mode of z-scores on
  heavy-tailed telemetry — and this fixture's value column IS
  heavy-tailed: ~4% of events sit past 5 MADs while a 3-sigma z-gate
  sees far fewer). percentile_disc keeps every statistic an actual
  data element; all predicates are integer (cents).

Scale shape (100 TB): OHLC is ONE map-side-combinable aggregation —
struct-min/max partials merge like any min/max, the shuffle carries
one row per (hour, type). The robust gate is the canonical
stats-then-flag multi-pass (the CCNet discipline): pass 1 medians,
pass 2 deviation medians, pass 3 flags — each pass collapses
map-side; the per-type stat tables are group-bounded and the joins
back onto the stream are keyed, hint-free (AQE broadcasts them while
small). Exact medians at corpus scale would route through the
histogram-selection entry's machinery (doc_length_quantiles_histogram)
— stated here, not duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

_HOUR_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_HOUR_FMT_DUCK = "%Y-%m-%dT%H:%M:%SZ"

#: robust gate: flag |x - median| > MAD_K * MAD (integer predicate)
MAD_K = 5


@_add(
    "events_hourly_ohlc",
    f"""
    WITH ev AS (
      SELECT CAST(STRFTIME(date_trunc('hour', ts), '{_HOUR_FMT_DUCK}')
               AS VARCHAR) AS hour_start,
             event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    )
    SELECT hour_start, event_type,
           (MIN({{'t': ts, 'i': event_id, 'v': c}})).v AS open_cents,
           CAST(MAX(c) AS BIGINT) AS high_cents,
           CAST(MIN(c) AS BIGINT) AS low_cents,
           (MAX({{'t': ts, 'i': event_id, 'v': c}})).v AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM ev GROUP BY 1, 2
    """,
    doc="Hourly OHLC bars per event type — time-bucket downsampling "
    "with ARG-extremes: open/close are the values AT the bucket's "
    "first/last event (min/max over a struct ordered ts, event_id, "
    "value — the unique (ts,event_id) prefix arbitrates every tie, "
    "so the answer is partitioning-independent and both engines' "
    "lexicographic struct comparison agrees cell-exact), high/low "
    "are plain extremes, volume the count. ONE map-side-combinable "
    "aggregation; the shuffle carries a row per (hour, type) — the "
    "generic first/last-observation-per-window downsampler a "
    "telemetry warehouse runs before archiving raw streams.",
    tags=("events", "window", "downsample", "arg-extreme"),
)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = cents("value")
    key = F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("i"), c.alias("v")
    )
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), _HOUR_FMT_SPARK).alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.min(key).getField("v").alias("open_cents"),
            F.max(c).alias("high_cents"),
            F.min(c).alias("low_cents"),
            F.max(key).getField("v").alias("close_cents"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
    )


@_add(
    "events_robust_outliers",
    f"""
    WITH ev AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ), med AS (
      SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
                  AS BIGINT) AS med_cents
      FROM ev GROUP BY 1
    ), dev AS (
      SELECT ev.event_type, c, ABS(c - med_cents) AS d, med_cents
      FROM ev JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d)
                  AS BIGINT) AS mad_cents
      FROM dev GROUP BY 1
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS events,
           MIN(med_cents) AS med_cents,
           MIN(mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN d > {MAD_K} * mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Robust outlier gate per event type: median + MAD (both exact "
    f"percentile_disc elements) with the integer predicate "
    f"|x - med| > {MAD_K}*MAD. The median/MAD pair has a 50% "
    "breakdown point, so the heavy tail being flagged cannot drag "
    "the gate that flags it — the failure mode of the mean/stddev "
    "twin (events_value_outliers) on heavy-tailed telemetry; on this "
    "fixture ~4% of events sit past 5 MADs. Canonical "
    "stats-then-flag multi-pass: median pass, deviation-median pass, "
    "flag pass — each collapses map-side, the per-type stat tables "
    "are group-bounded, and the joins back onto the stream are "
    "keyed and hint-free (AQE broadcasts them while small). At "
    "corpus scale the exact medians route through the "
    "histogram-selection machinery (doc_length_quantiles_histogram) "
    "instead of sort buffers.",
    tags=("events", "statistics", "robust", "outliers"),
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("long")
        .alias("med_cents")
    )
    dev = ev.join(med, "event_type").select(
        "event_type",
        "c",
        F.abs(F.col("c") - F.col("med_cents")).alias("d"),
        "med_cents",
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)")
        .cast("long")
        .alias("mad_cents")
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum((F.col("d") > MAD_K * F.col("mad_cents")).cast("int"))
            .cast("long")
            .alias("outliers"),
        )
        .orderBy(F.asc("event_type"))
    )
