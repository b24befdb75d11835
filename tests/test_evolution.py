"""Schema-evolution scan contracts the oracle can't see: the old
generation must REALLY lack the column on disk (otherwise the entry
demonstrates nothing), and the mergeSchema null-fill must land exactly
on the old generation's rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from github_data_pipeline_spark.plans.evolution_plans import (
    orders_two_generations,
    schema_evolution_report,
)
from github_data_pipeline_spark.sources.tables import load_table


def test_old_generation_lacks_the_column_on_disk(spark, sf_dir):
    path = orders_two_generations(spark, sf_dir)
    gen1 = spark.read.parquet(os.path.join(path, "gen1"))
    gen2 = spark.read.parquet(os.path.join(path, "gen2"))
    assert "o_channel" not in gen1.columns
    assert "o_channel" in gen2.columns


def test_nullfill_lands_exactly_on_the_old_generation(spark, sf_dir):
    path = orders_two_generations(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen1"), os.path.join(path, "gen2")
    )
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    # no rows lost or duplicated by the merged read
    assert merged.count() == n_orders
    # nulls exactly on the old generation — and every null row IS even
    nulls = merged.filter(F.col("o_channel").isNull())
    assert nulls.count() == n_even
    assert nulls.filter(F.col("o_orderkey") % 2 == 1).count() == 0
    # the report's legacy lane carries the same count
    rows = {r.channel: r.orders for r in schema_evolution_report(spark, sf_dir).collect()}
    assert rows["legacy"] == n_even
    assert sum(rows.values()) == n_orders
    # every new-generation lane is non-vacuous
    assert all(rows.get(c, 0) > 0 for c in ("web", "store", "phone"))
