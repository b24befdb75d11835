"""Conversion-funnel analysis — sequential conditional aggregation,
the product-analytics staple none of the window/join families express:
step N's timestamp only counts if it happens AT OR AFTER step N-1's
first timestamp, so each stage depends on the previous stage's
aggregate.

Spark-first shape: one tiny per-user aggregate per step (partial-agg
shuffle on user_id), each next step joining the previous step's
(user, first_ts) table — every intermediate is |users|-sized, step
joins hash on the same key, and the events scan is pruned to the one
event type per step. No window over the full event stream, no
self-join of events against events. The funnel depth is a compile-time
constant, so the whole thing is a fixed chain Catalyst can pipeline —
at 100 TB the only big exchanges are the three type-filtered
pre-aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

FUNNEL_STEPS = ("view", "click", "purchase")

STEP_HORIZON_HOURS = 24  # each step must follow the previous within 24 h


@_add(
    "events_funnel_steps",
    f"""
    WITH f1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), f2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN f1 ON e.user_id = f1.user_id
      WHERE e.event_type = 'click' AND e.ts >= f1.t1
        AND e.ts <= f1.t1 + INTERVAL {STEP_HORIZON_HOURS} HOUR
      GROUP BY e.user_id
    ), f3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN f2 ON e.user_id = f2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f2.t2
        AND e.ts <= f2.t2 + INTERVAL {STEP_HORIZON_HOURS} HOUR
      GROUP BY e.user_id
    ), u AS (SELECT DISTINCT user_id FROM events)
    SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS steps_reached,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM u
    LEFT JOIN f1 ON u.user_id = f1.user_id
    LEFT JOIN f2 ON u.user_id = f2.user_id
    LEFT JOIN f3 ON u.user_id = f3.user_id
    GROUP BY 1
    """,
    doc="Ordered conversion funnel view -> click -> purchase: a user "
    "reaches step N only via an event at or after their first step-N-1 "
    "event AND within the 24-hour step horizon (a click before any "
    "view does not count; without the horizon every active user "
    "trivially converts — cohorts split 90/35/25 at sf0.01). Sequential "
    "conditional aggregation — each stage joins the previous stage's "
    "|users|-sized first-timestamp table; the events scan is pruned "
    "to one event type per stage and every join hashes on user_id. "
    "Cohort counts per steps_reached (0-3), total == distinct users.",
    tags=("events", "funnel", "temporal"),
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )

    def first_after(step: str, prev: DataFrame | None, t_prev: str, t_out: str):
        s = e.filter(F.col("event_type") == step)
        if prev is not None:
            s = s.join(prev, "user_id").filter(
                (F.col("ts") >= F.col(t_prev))
                & (
                    F.col("ts")
                    <= F.col(t_prev)
                    + F.expr(f"INTERVAL {STEP_HORIZON_HOURS} HOURS")
                )
            )
        return s.groupBy("user_id").agg(F.min("ts").alias(t_out))

    f1 = first_after("view", None, "", "t1")
    f2 = first_after("click", f1, "t1", "t2")
    f3 = first_after("purchase", f2, "t2", "t3")
    u = e.select("user_id").distinct()
    steps = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        u.join(f1, "user_id", "left")
        .join(f2, "user_id", "left")
        .join(f3, "user_id", "left")
        .groupBy(steps.alias("steps_reached"))
        .agg(F.count(F.lit(1)).alias("users"))
    )
