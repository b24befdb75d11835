"""Temporal-join analytics over the ``events`` table — the range
(interval) join and hypertable-style gap-fill operators (beyond the
reference: SURVEY §7 extension class, siblings of the as-of join in
``operators/asof.py`` / ``events_asof_last_click``).

Both are staples of time-series stores (TimescaleDB's
``time_bucket_gapfill``/``locf``, kdb's window joins) re-expressed
Spark-first: the range join via the binned composite-key rewrite in
``operators/rangejoin.py`` (linear, hot-key-sliced), the gap-fill via
``sequence()`` spine generation + ``last(ignorenulls)`` carry-forward
(one shuffle on the entity key).  Oracles are plain ANSI inequality
joins / ``generate_series`` that DuckDB executes with its own IEJoin —
two genuinely different physical strategies forced to agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.money import cents
from ..operators.rangejoin import interval_join
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

ATTRIBUTION_WINDOW_SEC = 600  # clicks within 10 minutes before a purchase

GAPFILL_USER_MOD = 50  # gap-fill demo entity subset: user_id % 50 == 7
GAPFILL_USER_REM = 7

_TS_FMT_SQL = "%Y-%m-%dT%H:%M:%SZ"
_TS_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"


@_add(
    "events_range_attribution",
    f"""
    WITH p AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id,
           CAST(ROUND(p.value * 100) AS BIGINT) AS purchase_cents,
           CAST(COUNT(c.ts) AS BIGINT) AS clicks_10m,
           CAST(COALESCE(SUM(CAST(ROUND(c.value * 100) AS BIGINT)), 0)
                AS BIGINT) AS click_cents_10m
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts >  p.ts - INTERVAL {ATTRIBUTION_WINDOW_SEC} SECOND
     AND c.ts <= p.ts
    GROUP BY 1, 2, 3
    """,
    doc="Range (interval) join: every click by the same user within "
    "the 10 minutes before each purchase — ALL matches, not just the "
    "latest (that one is events_asof_last_click). Spark side uses the "
    "binned composite-key rewrite (operators/rangejoin.py): explode "
    "each purchase window to its <=2 time buckets, equi-join on "
    "(user, bucket), exact-filter the candidates — a hot user is "
    "sliced into per-10-minute join groups instead of one quadratic "
    "task, the skew shape that killed the unsalted streaming "
    "attribution join at 30x (SCALING.md). Zero-click purchases kept "
    "by re-attaching aggregates to the purchase table with a left "
    "join.",
    tags=("events", "rangejoin", "temporal"),
)
def events_range_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        cents("value").alias("purchase_cents"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        cents("value").alias("click_cents"),
    )
    cand = interval_join(
        events=c,
        intervals=p.withColumn(
            "w_start",
            F.col("ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SEC} SECONDS"),
        ),
        event_ts="click_ts",
        start_col="w_start",
        end_col="ts",
        bucket_seconds=ATTRIBUTION_WINDOW_SEC,
        extra_key="user_id",
        closed="right",
    )
    agg = cand.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("clicks_10m"),
        F.sum("click_cents").alias("click_cents_10m"),
    )
    return p.join(agg, "event_id", "left").select(
        "user_id",
        "event_id",
        "purchase_cents",
        F.coalesce(F.col("clicks_10m"), F.lit(0)).cast("long").alias(
            "clicks_10m"
        ),
        F.coalesce(F.col("click_cents_10m"), F.lit(0)).cast("long").alias(
            "click_cents_10m"
        ),
    )


TRAILING_WINDOW_SEC = 3600  # trailing 1-hour sliding frame
_TRAIL_US = TRAILING_WINDOW_SEC * 1_000_000


@_add(
    "events_trailing_hour_window",
    f"""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                AS BIGINT) AS trailing_cents
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW
    )
    """,
    doc="Per-row trailing 1-hour sliding aggregate — the RANGE "
    "(value-based) window frame, a different physical window class "
    "from the repo's row-frame/lag family: the frame boundary is a "
    "timestamp offset, so peers enter and leave per row. Exactness "
    "trick: both engines order by INTEGER epoch microseconds "
    "(unix_micros / epoch_us) — ordering by raw timestamps with a "
    "seconds-truncated long would include sub-second stragglers on "
    "one engine only. One shuffle on user_id; the running frame is "
    "computed in a single sort pass (no self-join, no explode) — at "
    "100 TB this is the cheapest of the temporal operators because "
    "nothing fans out.",
    tags=("events", "window", "temporal"),
)
def events_trailing_hour_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_TRAIL_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("trailing_events"),
        F.sum(cents("value")).over(w).alias("trailing_cents"),
    )


@_add(
    "events_gap_fill_hourly",
    f"""
    WITH sel AS (
      SELECT * FROM events
      WHERE user_id % {GAPFILL_USER_MOD} = {GAPFILL_USER_REM}
    ), bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ), spine AS (
      SELECT u.user_id, gs.h
      FROM (SELECT DISTINCT user_id FROM sel) u
      CROSS JOIN (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
      ) gs
    ), obs AS (
      SELECT user_id, h, cents FROM (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM sel
      ) WHERE rn = 1
    )
    SELECT s.user_id,
           CAST(STRFTIME(s.h, '{_TS_FMT_SQL}') AS VARCHAR) AS hour_start,
           CAST(LAST_VALUE(o.cents IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_locf,
           CAST(CASE WHEN o.cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_filled
    FROM spine s
    LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
    """,
    doc="Hypertable gap-fill + last-observation-carried-forward "
    "(TimescaleDB time_bucket_gapfill/locf semantics): a dense hourly "
    "spine per entity over the table's global hour span, the last "
    "event value per observed hour (deterministic ts/event_id "
    "tie-break), and nulls carried forward with last(ignorenulls) — "
    "hours before an entity's first observation stay NULL, is_filled "
    "marks synthesized rows. Spark generates the spine with "
    "sequence()+explode off a 1-row broadcast bounds attach (no "
    "driver round-trip) and carries forward in one shuffle on "
    "user_id. Output is inherently entities x span — restricted here "
    "to the user_id % 50 == 7 subset, the knob a 100 TB run would "
    "replace with per-entity partition pruning.",
    tags=("events", "gapfill", "temporal"),
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sel = e.filter(
        F.col("user_id") % GAPFILL_USER_MOD == GAPFILL_USER_REM
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    users = sel.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w_rn = Window.partitionBy(
        "user_id", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.desc("ts"), F.desc("event_id"))
    obs = (
        sel.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            cents("value").alias("cents"),
            F.row_number().over(w_rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(obs, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", _TS_FMT_SPARK).alias("hour_start"),
            F.last("cents", ignorenulls=True)
            .over(w_locf)
            .cast("long")
            .alias("cents_locf"),
            F.when(F.col("cents").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_filled"),
        )
    )
