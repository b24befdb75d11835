"""Bucketed co-located joins — the pre-shuffle strategy for repeated
big-fact joins at 100 TB: write both fact tables bucketed on the join
key, and the join runs with ZERO exchanges (only per-bucket sorts)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    ot, lt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable(ot)
    load_table(spark, sf_dir, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable(lt)
    yield ot, lt
    spark.sql(f"DROP TABLE {ot}")
    spark.sql(f"DROP TABLE {lt}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    # disable auto-broadcast so the join strategy is driven by
    # co-location, not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(lt)
            .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("items"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not exchange either side
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is right
        got = {r["o_orderpriority"]: r["items"] for r in joined.collect()}
        want = {
            r["o_orderpriority"]: r["items"]
            for r in load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("items"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_registry_bucketed_entry_is_exchange_free_before_join(spark, sf_dir):
    """The driver-scored entry must carry the same declarative proof as
    the unit fixture: both scans bucketed, SortMergeJoin, zero
    exchanges below the join (the only exchanges are the post-join
    groupBy/orderBy ones)."""
    from github_data_pipeline_spark.plans import all_plans

    df = all_plans()["bucketed_priority_revenue"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_ensure_bucketed_pair_reregisters_committed_files(spark, sf_dir):
    """A fresh session (empty in-memory catalog, surviving warehouse
    dir) must RE-REGISTER the committed bucketed files via DDL — with
    the bucket spec intact — instead of rewriting them or failing with
    LOCATION_ALREADY_EXISTS."""
    import os

    from github_data_pipeline_spark.plans.bucket_plans import (
        ensure_bucketed_pair,
    )

    ot, lt = ensure_bucketed_pair(spark, sf_dir)
    loc = None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {ot}").collect():
        if row["col_name"] == "Location":
            loc = row["data_type"].removeprefix("file:")
    assert loc and os.path.exists(os.path.join(loc, "_SUCCESS"))
    mtimes = {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    }
    # simulate the next session: catalog forgets, files stay
    spark.sql(f"DROP TABLE {ot}")
    ot2, _ = ensure_bucketed_pair(spark, sf_dir)
    assert ot2 == ot and spark.catalog.tableExists(ot)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    }  # data NOT rewritten
    # and the re-registered table still proves co-location to the
    # planner (merge-hinted like the registry entry: an auto-broadcast
    # BHJ at test SF wouldn't exercise the bucket spec at all)
    joined = (
        spark.table(lt)
        .hint("merge")
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Bucketed: true") == 2
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
