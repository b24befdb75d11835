"""Partition/key skew diagnostics (operators/diagnostics.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.diagnostics import (
    key_skew_report,
    partition_histogram,
)
from github_data_pipeline_spark.sources.tables import load_table, spread


def test_partition_histogram_counts_every_row(spark, sf_dir):
    events = spread(load_table(spark, sf_dir, "events"))
    hist = partition_histogram(events).collect()
    assert sum(r["rows"] for r in hist) == events.count()
    # spread() must have fanned the single parquet file out
    assert len(hist) > 1
    # and it surfaces the single-partition pathology it exists to catch
    one = load_table(spark, sf_dir, "events").coalesce(1)
    assert len(partition_histogram(one).collect()) == 1


def test_key_skew_report_math(spark):
    # 100 rows of key 'hot', 10 keys with 1 row each
    rows = [("hot",)] * 100 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, "k", top=5).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["rows"] == 100
    assert rep[0]["fraction"] == pytest.approx(100 / 110)
    # mean group size = 110/11 = 10 -> hot is 10x the mean
    assert rep[0]["skew_ratio"] == pytest.approx(10.0)
    assert len(rep) == 5
    assert rep[1]["skew_ratio"] == pytest.approx(0.1)


def test_key_skew_report_on_events(spark, sf_dir):
    events = spread(load_table(spark, sf_dir, "events"))
    rep = key_skew_report(events, "event_type", top=10).collect()
    fracs = [r["fraction"] for r in rep]
    assert sum(fracs) <= 1.0 + 1e-9
    assert fracs == sorted(fracs, reverse=True)
