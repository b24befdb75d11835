"""Column profiling + drift report (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.profile import drift_report, profile
from github_data_pipeline_spark.sources.tables import load_table


def test_profile_basic_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, None, 2.5), (4, "a", None)],
        "id bigint, s string, v double",
    )
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["id"]["rows"] == 4 and rows["id"]["non_null"] == 4
    assert rows["id"]["min"] == "1" and rows["id"]["max"] == "4"
    assert rows["s"]["null_fraction"] == pytest.approx(0.25)
    assert rows["s"]["approx_distinct"] == 2
    assert rows["v"]["null_fraction"] == pytest.approx(0.5)
    assert rows["v"]["min"] == "1.5" and rows["v"]["max"] == "2.5"


def test_profile_complex_types_skip_minmax(spark):
    df = spark.createDataFrame([(1, [1, 2]), (2, [3])], "id bigint, arr array<bigint>")
    rows = {r["column"]: r for r in profile(df).collect()}
    assert rows["arr"]["min"] is None and rows["arr"]["max"] is None
    assert rows["arr"]["non_null"] == 2


def test_profile_is_single_scan_no_wide_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prof = profile(orders)
    plan = prof._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("Scan parquet") == 1  # matches FileScan too
    # global agg => SinglePartition exchange only, never a hash shuffle
    assert "Exchange hashpartitioning" not in plan
    out = {r["column"]: r for r in prof.collect()}
    assert out["o_orderkey"]["null_fraction"] == 0.0
    assert set(out) == set(orders.columns)


def test_drift_report_flags_changes(spark):
    base = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id bigint, s string"
    )
    fresh = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "id bigint, s double"
    ).withColumn("added", F.lit("n"))
    rep = {r["column"]: r for r in drift_report(base, fresh).collect()}
    assert rep["s"]["dtype_changed"] is True
    assert rep["s"]["null_fraction_fresh"] == pytest.approx(0.25)
    assert rep["id"]["dtype_changed"] is False
    assert rep["id"]["cardinality_ratio"] == pytest.approx(4 / 3, rel=0.1)
    # column only in fresh -> base side null, change visible
    assert rep["added"]["dtype_base"] is None
    assert rep["added"]["dtype_fresh"] == "string"
