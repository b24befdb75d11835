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
