"""Small-file compaction + sorted rewrite (operators/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.maintenance import (
    compact,
    file_report,
    sorted_rewrite,
)
from github_data_pipeline_spark.sources.tables import load_table


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_file_report_counts_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).withColumn("part", F.col("id") % 2)
    df.repartition(8).write.partitionBy("part").parquet(path)
    rep = {r["partition"]: r for r in file_report(spark, path).collect()}
    assert set(rep) == {"part=0", "part=1"}
    for r in rep.values():
        assert r["files"] > 1
        assert r["needs_compaction"]  # tiny files, far under target/2
        assert r["bytes"] > 0


def test_compact_merges_small_files_keeps_data(spark, tmp_path):
    path = str(tmp_path / "t")
    orders = load_table(spark, sf_dir="/root/testdata/sf0.001", name="orders")
    frag = orders.withColumn("part", F.col("o_orderkey") % 2)
    frag.repartition(16).write.partitionBy("part").parquet(path)
    before = _sorted_rows(spark.read.parquet(path).drop("part"))

    done = compact(spark, path)
    assert sorted(done) == ["part=0", "part=1"]
    rep = {r["partition"]: r for r in file_report(spark, path).collect()}
    # tiny partitions collapse to a single file each, nothing flagged
    assert all(r["files"] == 1 for r in rep.values())
    assert not any(r["needs_compaction"] for r in rep.values())
    assert _sorted_rows(spark.read.parquet(path).drop("part")) == before
    # second pass is a no-op
    assert compact(spark, path) == []


def test_compact_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(500).repartition(12).write.parquet(path)
    assert compact(spark, path) == [""]
    rep = file_report(spark, path).collect()
    assert len(rep) == 1 and rep[0]["files"] == 1
    assert spark.read.parquet(path).count() == 500


def test_sorted_rewrite_clusters_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    orders = load_table(spark, sf_dir="/root/testdata/sf0.001", name="orders")
    sorted_rewrite(orders, path, ["o_custkey"], num_files=4)

    back = spark.read.parquet(path)
    assert _sorted_rows(back) == _sorted_rows(orders)
    # files hold disjoint key ranges: per-file [min,max] must not overlap
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
        .collect()
    )
    assert len(spans) > 1
    spans = sorted((r["lo"], r["hi"]) for r in spans)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    # layout is real files on disk, not a metastore entry
    assert any(f.endswith(".parquet") for f in os.listdir(path))


def test_missing_partitions_backfill_plan(spark, tmp_path):
    from github_data_pipeline_spark.operators.maintenance import missing_partitions

    path = str(tmp_path / "cal")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id bigint, dt string"
    )
    df.write.partitionBy("dt").parquet(path)
    expected = [f"dt=2024-01-0{i}" for i in range(1, 5)]
    rep = {r["partition"]: r for r in missing_partitions(spark, path, expected).collect()}
    assert rep["dt=2024-01-01"]["present"] and rep["dt=2024-01-01"]["files"] >= 1
    assert rep["dt=2024-01-02"]["present"]
    assert not rep["dt=2024-01-03"]["present"] and rep["dt=2024-01-03"]["bytes"] == 0
    assert not rep["dt=2024-01-04"]["present"]
