"""Skew and partition diagnostics — the operational tooling for
keeping 100 TB jobs healthy: before adding salt or AQE hints to a
slow join, measure WHERE the weight actually sits.

Both reports are plain aggregations (one shuffle each) returning
small DataFrames; nothing here collects data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_histogram(df: DataFrame) -> DataFrame:
    """(partition_id, rows) for the DataFrame's CURRENT physical
    partitioning — the direct view of whether a stage will run on one
    core or all of them (single-file parquet reads, post-filter
    collapse, bad repartition keys all show up here)."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.desc("rows"))
    )


def key_skew_report(df: DataFrame, *keys: str, top: int = 20) -> DataFrame:
    """Top-``top`` heaviest key groups with their share of all rows and
    their ratio to the mean group size.

    ``skew_ratio`` is the number AQE's skew-join threshold reasons
    about: a key at 50x the mean is the one that stalls the join's
    final task; feed it to operators/skew.salted_join or raise
    spark.sql.adaptive.skewJoin thresholds accordingly.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("rows"))
    stats = counts.agg(
        F.sum("rows").alias("_total"), F.count(F.lit(1)).alias("_groups")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "rows",
            (F.col("rows") / F.col("_total")).alias("fraction"),
            (F.col("rows") * F.col("_groups") / F.col("_total")).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.desc("rows"), *keys)
        .limit(top)
    )
