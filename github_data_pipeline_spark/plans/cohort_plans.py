"""Cohort retention — the classic product-analytics triangle: users
grouped by first-seen week, each cohort's activity traced across
subsequent weeks. A distinct analytics class from the windowed/
sessionized event queries: the grouping DIMENSION itself is derived
from the fact table (first-touch attribution of every user), then
joined back — the self-derived-dimension shape warehouses call a
"cohort" or "vintage" analysis.

Spark-first shape: two aggregations over the distinct (user, week)
stream (one for first-seen, one for the cohort x week matrix) joined
on user_id — both keyed on user/week cardinalities, never raw events;
the cohort-size table is cohort-count-bounded and broadcasts onto the
matrix. Weeks are Monday-truncated dates rendered as ISO strings (the
engine-exact wire format), offsets are integer day-diffs div 7, and
retention is an integer percentage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY


@REGISTRY.add(
    "events_retention_cohorts",
    """
    WITH e AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1
    ), matrix AS (
      SELECT f.cohort_wk, e.wk,
             COUNT(DISTINCT e.user_id) AS active_users
      FROM e JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    ), sizes AS (
      SELECT cohort_wk, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT strftime(m.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', m.cohort_wk, m.wk) // 7 AS BIGINT)
             AS week_offset,
           CAST(m.active_users AS BIGINT) AS active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST((m.active_users * 100) // s.cohort_size AS BIGINT)
             AS retention_pct
    FROM matrix m JOIN sizes s USING (cohort_wk)
    ORDER BY cohort_week ASC, week_offset ASC
    """,
    doc="Weekly cohort retention triangle: every user is attributed "
    "to a first-seen (Monday-truncated) week, then each cohort's "
    "distinct-active-user count is traced across subsequent weeks "
    "with an integer retention percentage of the cohort size. The "
    "self-derived-dimension shape: the distinct (user, week) stream "
    "is aggregated once for first-touch and once (after a user-keyed "
    "join back) for the cohort x week matrix — raw events collapse "
    "map-side before any join; the cohort-size table broadcasts. "
    "Weeks render as ISO date strings (engine-exact wire format); "
    "offsets are integer day-diffs div 7.",
    tags=("events", "cohort", "retention", "agg"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).distinct()
    firsts = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    matrix = (
        e.join(firsts, "user_id")
        .groupBy("cohort_wk", "wk")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )
    sizes = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_wk")
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cohort_wk) div 7")
            .cast("long")
            .alias("week_offset"),
            "active_users",
            "cohort_size",
            F.expr("(active_users * 100L) div cohort_size").alias(
                "retention_pct"
            ),
        )
        .orderBy(F.asc("cohort_week"), F.asc("week_offset"))
    )
