"""KMV sketch + deterministic-sample quantiles: estimator sanity,
hash determinism, and top-k (not sort-all) plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from github_data_pipeline_spark.plans.sketch_plans import (
    KMV_K,
    _h32_col,
    kmv_sketch_stats,
)


def test_h32_matches_python_md5(spark):
    vals = [1, 42, 99999]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r.v: r.h
        for r in df.select("v", _h32_col(F.col("v")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == int(
            hashlib.md5(str(v).encode()).hexdigest()[:8], 16
        )


def test_kmv_estimate_within_expected_error(spark, sf_dir):
    row = kmv_sketch_stats(spark, sf_dir).collect()[0]
    # KMV standard error ~ 1/sqrt(k) ~ 6.25% at k=256; allow 4 sigma
    for est, exact in (
        (row.kmv_orders, row.exact_orders),
        (row.kmv_parts, row.exact_parts),
    ):
        if exact <= KMV_K:
            # fewer distincts than k: h_k is the max of all hashes and
            # the estimator degrades gracefully; just demand same scale
            assert 0 < est
        else:
            assert abs(est - exact) / exact < 0.25, (est, exact)
    # quantiles are ordered and from the sampled data
    assert row.p50_cents <= row.p95_cents <= row.p99_cents
    assert row.sample_rows > 0


def test_kmv_is_topk_not_full_sort(spark, sf_dir):
    plan = (
        kmv_sketch_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_sample_rate_determinism_across_partitionings(spark, sf_dir):
    from github_data_pipeline_spark.plans.sketch_plans import sketch_over
    from github_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = sketch_over(li.repartition(3)).collect()
    b = sketch_over(li.repartition(7)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_sketch_empty_input_engines_agree(spark, duck):
    """Zero sampled rows (ADVICE r4): Spark's empty collect_list vs
    DuckDB's NULL list() must normalize to the same row — sample_rows
    0, NULL quantiles, NULL kmv estimates — instead of a latent hash
    mismatch or an ANSI index error."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.sketch_plans import sketch_over
    from github_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").limit(0)
    row = sketch_over(li).collect()[0].asDict()
    assert row["sample_rows"] == 0
    assert row["p50_cents"] is None and row["p99_cents"] is None
    oracle = all_plans()["kmv_sketch_stats"].oracle.replace(
        "FROM lineitem", "FROM (SELECT * FROM lineitem LIMIT 0)"
    )
    orow = duck.execute(oracle).fetchdf().iloc[0]
    assert int(orow["sample_rows"]) == 0


def test_kmv_merge_equals_scratch_and_batches_partition(spark, sf_dir):
    """kmv_incremental_merge invariants that the oracle cannot see
    in isolation: (a) merged == scratch per engine (the lossless-merge
    claim), (b) the three shipdate batches PARTITION lineitem (a row
    lost to a boundary bug would silently shrink the merged sketch),
    (c) the envelope flags are 1 on the fixture."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.sketch_plans import (
        KMV_BATCH_BOUNDS,
    )
    from github_data_pipeline_spark.sources.tables import load_table

    reg = all_plans()
    rows = {
        r["key_col"]: r
        for r in reg["kmv_incremental_merge"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == {"l_orderkey", "l_partkey"}
    for r in rows.values():
        assert r["merged_kmv"] == r["scratch_kmv"]
        assert r["within_3se"] == 1
        assert r["exact_distinct"] > 0
    li = load_table(spark, sf_dir, "lineitem")
    lo, hi = KMV_BATCH_BOUNDS
    ship = F.col("l_shipdate")
    n = li.count()
    parts = (
        li.filter(ship < lo).count()
        + li.filter((ship >= lo) & (ship < hi)).count()
        + li.filter((ship >= hi) | ship.isNull()).count()
    )
    assert parts == n
