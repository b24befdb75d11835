"""Bucketed range join (operators/rangejoin.py): equals the naive
range predicate, and the plan stays a hash join (never a nested-loop
cross join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.rangejoin import interval_join
from github_data_pipeline_spark.sources.tables import load_table


def _intervals(spark, sf_dir):
    """Per-user activity intervals derived from events: first/last ts
    of each user's first UTC day of activity."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
        .limit(200)
    )


def test_bucketed_equals_naive(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    iv = _intervals(spark, sf_dir)

    got = interval_join(
        e, iv, extra_key="user_id", bucket_seconds=3600
    ).select("event_id", "day")
    naive = e.join(
        iv,
        (e.user_id == iv.user_id) & (e.ts >= iv.start) & (e.ts <= iv.end),
    ).select("event_id", "day")

    g = {(r["event_id"], r["day"]) for r in got.collect()}
    n = {(r["event_id"], r["day"]) for r in naive.collect()}
    assert g == n and len(n) > 0


def test_semi_variant(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    iv = _intervals(spark, sf_dir)
    semi = interval_join(e, iv, extra_key="user_id", how="left_semi")
    inner_ids = {
        r["event_id"]
        for r in interval_join(e, iv, extra_key="user_id")
        .select("event_id").distinct().collect()
    }
    assert {r["event_id"] for r in semi.collect()} == inner_ids
    assert semi.columns == ["event_id", "ts", "user_id"]


def test_plan_is_hash_join_not_nested_loop(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    iv = _intervals(spark, sf_dir)
    plan = (
        interval_join(e, iv, extra_key="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_fanout_guard_trips_on_undersized_bucket(spark):
    """A month-long interval over a 60 s bucket must fail loudly (the
    silent alternative is a thousands-x explode at scale); a compliant
    interval with the same call succeeds."""
    import datetime as dt

    import pytest
    from pyspark.sql.utils import PythonException

    t0 = dt.datetime(2024, 1, 1)
    e = spark.createDataFrame([(1, t0)], "user_id long, ts timestamp")
    bad = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(days=30))],
        "user_id long, start timestamp, end timestamp",
    )
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        interval_join(e, bad, bucket_seconds=60, extra_key="user_id").collect()
    ok = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(minutes=30))],
        "user_id long, start timestamp, end timestamp",
    )
    assert (
        interval_join(e, ok, bucket_seconds=60, extra_key="user_id").count()
        == 1
    )
