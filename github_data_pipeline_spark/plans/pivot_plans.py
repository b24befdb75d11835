"""Pivot (long -> wide) — the one relational-API surface the registry
didn't exercise yet.  ``groupBy().pivot()`` with an EXPLICIT value
list: omitting the list makes Spark run a blocking distinct-scan over
the pivot column before it can even build the plan — at 100 TB that is
a full extra pass and a driver-side collect of unbounded cardinality,
so the explicit list is the scale contract, not a convenience.  The
oracle is the classic SUM(CASE) expansion, which is also exactly the
physical plan Spark lowers pivot to (one partial-aggregated shuffle,
no extra pass when values are given)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

# explicit pivot domain (alphabetical): the generator's event types.
# Unknown types would land in no column — the guard below counts them
# so schema drift fails loudly instead of dropping rows silently.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

USER_BUCKETS = 10


def _case_cols() -> str:
    out = []
    for t in EVENT_TYPES:
        out.append(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS {t}_events"
        )
        out.append(
            f"CAST(SUM(CASE WHEN event_type = '{t}'"
            f" THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)"
            f" AS BIGINT) AS {t}_cents"
        )
    return ",\n           ".join(out)


@_add(
    "events_type_pivot",
    f"""
    SELECT user_id % {USER_BUCKETS} AS user_bucket,
           {_case_cols()},
           CAST(SUM(CASE WHEN event_type NOT IN
             {tuple(EVENT_TYPES)} THEN 1 ELSE 0 END) AS BIGINT)
             AS unknown_events
    FROM events
    GROUP BY 1
    """,
    doc="Long->wide pivot of per-user-bucket event counts and spend "
    "by event type, via groupBy().pivot() with an EXPLICIT value "
    "list — without it Spark inserts a blocking distinct-scan of the "
    "pivot column plus an unbounded driver collect before planning, "
    "the hidden extra pass that matters at 100 TB. An unknown_events "
    "guard column counts types outside the declared domain so schema "
    "drift fails the oracle compare loudly instead of silently "
    "dropping rows. Oracle is the SUM(CASE) expansion pivot lowers "
    "to; one partial-aggregated shuffle either way.",
    tags=("events", "pivot"),
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % USER_BUCKETS).alias("user_bucket"),
        "event_type",
        cents("value").alias("cents"),
    )
    wide = (
        e.groupBy("user_bucket")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("cents").alias("cents"),
        )
    )
    unknown = e.groupBy("user_bucket").agg(
        F.sum(
            (~F.col("event_type").isin(*EVENT_TYPES)).cast("long")
        ).alias("unknown_events")
    )
    # pivot cells with no rows are NULL; the CASE oracle yields 0
    fixed = [
        F.coalesce(F.col(f"{t}_{m}"), F.lit(0)).cast("long").alias(f"{t}_{m}")
        for t in EVENT_TYPES
        for m in ("events", "cents")
    ]
    return wide.join(unknown, "user_bucket").select(
        "user_bucket", *fixed, "unknown_events"
    )
