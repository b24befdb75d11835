"""Bucketed range join: match point events to time intervals without a
cross join.

Spark's optimizer lowers ``l.ts BETWEEN r.start AND r.end`` to a
BroadcastNestedLoopJoin (a cross join with a filter) — O(|events| x
|intervals|), which is the first thing to die at scale. The standard
fix is bucketing: quantize time into fixed-width buckets, explode each
interval into the buckets it overlaps, and equi-join on the bucket key
before applying the precise range predicate. Cost becomes
O(|events| + |intervals| x avg_buckets_per_interval + collisions) with
an ordinary shuffled (or broadcast) hash join Catalyst already knows
how to optimize — the same trick DuckDB/Databricks apply internally
for range joins.

Bucket width is the tuning knob: ~the median interval length keeps the
per-interval explosion factor near 2 while keeping buckets selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    extra_key: str | None = None,
    how: str = "inner",
    closed: str = "both",
    max_buckets_per_interval: int = 64,
) -> DataFrame:
    """Join point rows to interval rows on containment, optionally
    also on an equality key (e.g. user_id) — via bucket quantization +
    equi-join.

    ``closed`` picks the interval convention: ``"both"`` =
    ``start <= ts <= end``; ``"right"`` = ``start < ts <= end`` (the
    attribution convention — an event AT the window-close instant
    counts, one exactly at window-open does not). Bucketing is pure
    candidate generation either way: the exact predicate filters after
    the equi-join, so results equal the naive range join on any input
    (pinned in tests/test_rangejoin.py and tests/test_temporal.py).

    ``how`` supports "inner" and "left_semi" (events that fall in any
    interval). Interval columns survive on the output for "inner".

    ``max_buckets_per_interval`` is the misconfiguration guard: an
    interval spanning more than this many buckets (a month-long
    interval over a 10-minute ``bucket_seconds``) means the bucket
    width is badly undersized for the data — at scale the explode
    would silently multiply the interval side by thousands. The job
    fails with a clear message instead; raise the limit or widen the
    bucket deliberately.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported join type {how!r}")
    if closed not in ("both", "right"):
        raise ValueError(f"closed must be 'both' or 'right': {closed!r}")

    ev_bucket = F.floor(F.col(event_ts).cast("long") / bucket_seconds)
    lo_bucket = F.floor(F.col(start_col).cast("long") / bucket_seconds)
    hi_bucket = F.floor(F.col(end_col).cast("long") / bucket_seconds)
    # Guard on the ARITHMETIC count, before any sequence() exists: a
    # badly undersized bucket (years over minute buckets) must hit this
    # message, not first allocate a huge array per interval row or trip
    # Spark's sequence element cap with a confusing error.
    n_buckets = hi_bucket - lo_bucket + F.lit(1)
    guarded = F.when(
        n_buckets <= max_buckets_per_interval,
        F.sequence(lo_bucket, hi_bucket),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: interval spans %s buckets "
                f"(> max_buckets_per_interval={max_buckets_per_interval}); "
                f"bucket_seconds={bucket_seconds} is undersized for this "
                "data — widen it or raise the limit explicitly",
                n_buckets.cast("string"),
            )
        )
    )
    exploded = intervals.withColumn("__bucket", F.explode(guarded))
    tagged = events.withColumn("__bucket", ev_bucket)

    on = [tagged["__bucket"] == exploded["__bucket"]]
    if extra_key is not None:
        on.append(tagged[extra_key] == exploded[extra_key])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    lo = (
        tagged[event_ts] > exploded[start_col]
        if closed == "right"
        else tagged[event_ts] >= exploded[start_col]
    )
    precise = lo & (tagged[event_ts] <= exploded[end_col])

    if how == "left_semi":
        return (
            tagged.join(exploded, cond & precise, "left_semi")
            .drop("__bucket")
        )
    dup = [c for c in ([extra_key] if extra_key else [])]
    out = tagged.join(exploded, cond & precise, "inner").drop(
        exploded["__bucket"]
    ).drop(tagged["__bucket"])
    for c in dup:
        out = out.drop(exploded[c])
    return out
