"""Round-10 additions: hardening regressions + new operator units.

Oracle equivalence for the new registry entries lives in the shared
sweep (tests/test_plans_oracle.py); these tests pin the behaviors the
oracle can't see — error routing, plan shapes, option paths.
"""

from __future__ import annotations

import os

import pytest

from github_data_pipeline_spark.sources.tables import load_table


def test_events_json_copy_reraises_non_race_rename_failure(
    spark, sf_dir, tmp_path, monkeypatch
):
    """os.replace failing when NO concurrent writer produced the target
    (cross-device cache mount, permissions) must surface at the copy
    site, not as a confusing spark.read.json error far from the cause."""
    from github_data_pipeline_spark.plans import events_plans

    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))

    def boom(src, dst):
        raise OSError("cross-device link")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="cross-device"):
        events_plans._events_json_copy(spark, sf_dir)


def test_events_json_copy_swallows_benign_lost_race(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If os.replace fails but the target exists (a concurrent writer
    won the rename), the loser must return the winner's path."""
    from github_data_pipeline_spark.plans import events_plans
    from github_data_pipeline_spark.plans.artifacts import artifact_cache_path

    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", str(tmp_path))
    real_replace = os.replace

    def lose_race(src, dst):
        # the "winner" commits first, then our rename fails
        os.makedirs(dst, exist_ok=True)
        raise OSError("would clobber")

    monkeypatch.setattr(os, "replace", lose_race)
    path = events_plans._events_json_copy(spark, sf_dir)
    monkeypatch.setattr(os, "replace", real_replace)
    assert os.path.isdir(path)
    assert path == artifact_cache_path(
        sf_dir, "events_json", extra_key=events_plans._RT_TS_FMT
    )


def test_covariance_pair_form_equals_one_row_form(spark, sf_dir):
    """The (dim_i, dim_j)-keyed shuffle formulation and the one-row
    O(d^2)-columns aggregate must be CELL-IDENTICAL — the re-keying is
    physical-plan surgery for high dimension, never a semantics change."""
    from github_data_pipeline_spark.plans import all_plans

    reg = all_plans()
    a = reg["embedding_covariance"].builder(spark, sf_dir).collect()
    b = reg["embedding_covariance_pairs"].builder(spark, sf_dir).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_covariance_pairs_shuffle_is_keyed_not_wide(spark, sf_dir):
    """The scale claim itself: the pair form's corpus-side aggregate
    carries O(1) aggregate expressions (one SUM + one COUNT over keyed
    rows), not O(d^2) columns — visible as a hashpartitioning exchange
    on (dim_i, dim_j)."""
    from github_data_pipeline_spark.plans import all_plans

    df = all_plans()["embedding_covariance_pairs"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(dim_i" in plan


def test_pca_power_iteration_partition_invariant(spark, sf_dir):
    """Every accumulation in the recurrence is integer fixed-point, so
    the extracted eigenvector must be BIT-identical under a different
    input partitioning (a float-sum implementation would differ in low
    bits and the truncated divisions would amplify the difference)."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.similarity_plans import COV_FP

    reg = all_plans()
    base = reg["pca_power_iteration"].builder(spark, sf_dir).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = reg["pca_power_iteration"].builder(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [r.asDict() for r in base] == [r.asDict() for r in alt]
    # infinity-norm normalization: the dominant component is exactly +-S
    assert max(abs(r["eigvec_fp"]) for r in base) == COV_FP


def test_heavy_hitters_output_is_partitioning_independent(spark, sf_dir):
    """The candidate SET depends on partition boundaries; the OUTPUT
    must not — exact recount + threshold discards false candidates, so
    1 partition and 13 partitions must agree cell-exactly."""
    from github_data_pipeline_spark.functions import text as T
    from github_data_pipeline_spark.operators.heavyhitters import (
        misra_gries_candidates,
    )
    from github_data_pipeline_spark.operators.hints import (
        broadcast_if_bounded,
    )
    from github_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    k = 99
    toks_base = load_table(spark, sf_dir, "documents").select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("token")
    )

    def run(parts: int):
        toks = toks_base.repartition(parts)
        summ = misra_gries_candidates(toks, k).localCheckpoint()
        n = summ.filter(F.col("token").isNull()).agg(F.sum("cnt")).first()[0]
        cands = broadcast_if_bounded(
            summ.filter(F.col("token").isNotNull()).select("token").distinct(),
            summ.count(),
        )
        return sorted(
            toks.join(cands, "token", "left_semi")
            .groupBy("token")
            .count()
            .filter(F.col("count") * (k + 1) > n)
            .collect()
        )

    assert run(1) == run(13) != []


def test_misra_gries_never_misses_a_true_heavy_hitter(spark):
    """Adversarial placement: a key spread thin across every partition
    (locally never dominant) but globally heavy MUST survive the
    per-partition cut — the N/(k+1) guarantee, not a best-effort."""
    from github_data_pipeline_spark.operators.heavyhitters import (
        misra_gries_candidates,
    )
    from pyspark.sql import functions as F

    # 40 partitions x (5 copies of "hot" + 95 distinct fillers):
    # locally "hot" is 5/100; globally 200/4000 = 5% > 1/(k+1) at k=39
    rows = []
    for p in range(40):
        rows += [("hot",)] * 5 + [(f"f{p}_{i}",) for i in range(95)]
    toks = spark.createDataFrame(rows, "token string").repartition(40)
    k = 39
    summ = misra_gries_candidates(toks, k)
    cands = {
        r["token"]
        for r in summ.filter(F.col("token").isNotNull()).collect()
    }
    assert "hot" in cands
    n = summ.filter(F.col("token").isNull()).agg(F.sum("cnt")).first()[0]
    assert n == 4000  # sentinels account every processed row
