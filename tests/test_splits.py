"""Leakage-safe splitting: cluster-cohesion invariant, determinism,
threshold math, and the naive-hash contrast on the real corpus."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.splits import (
    HASH_BUCKETS,
    assign_leakage_safe_splits,
    hash_bucket,
    leaky_cluster_count,
    split_col,
    split_thresholds,
)

FR = {"train": 0.90, "val": 0.05, "test": 0.05}


def test_split_thresholds_cumulative_and_validated():
    assert split_thresholds(FR) == [
        ("train", 900_000),
        ("val", 950_000),
        ("test", HASH_BUCKETS),
    ]
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_thresholds({})


def test_hash_bucket_matches_python_md5(spark):
    ids = [0, 1, 42, 10_000, 123_456_789]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r.id: r.b
        for r in df.select(
            "id", hash_bucket(F.col("id")).alias("b")
        ).collect()
    }
    for i in ids:
        expect = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % (
            HASH_BUCKETS
        )
        assert got[i] == expect, i


def test_cluster_members_share_split_and_singletons_key_self(spark):
    # chain A-B, B-C must land together even though A-C is no edge
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"]
    )
    rows = assign_leakage_safe_splits(docs, pairs, FR).collect()
    by_id = {r.doc_id: r for r in rows}
    assert {by_id[i].cluster_key for i in (1, 2, 3)} == {1}
    assert {by_id[i].split for i in (1, 2, 3)} == {by_id[1].split}
    assert {by_id[i].cluster_key for i in (5, 6)} == {5}
    assert by_id[4].cluster_key == 4 and by_id[7].cluster_key == 7
    # safe assignment leaks nothing, ever
    assigned = assign_leakage_safe_splits(docs, pairs, FR)
    (leak,) = leaky_cluster_count(assigned).collect()
    assert leak.leaky_clusters == 0


def test_assignment_deterministic_across_runs(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    a = sorted(
        (r.doc_id, r.split)
        for r in assign_leakage_safe_splits(
            docs.repartition(7), pairs, FR
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.split)
        for r in assign_leakage_safe_splits(
            docs.repartition(3), pairs, FR
        ).collect()
    )
    assert a == b


def test_incremental_update_equals_full_recompute(spark):
    from github_data_pipeline_spark.operators.splits import update_splits

    # batch 1: docs 1-10, edges {1-2, 2-3}, {5-6}
    d1 = spark.createDataFrame([(i,) for i in range(1, 11)], ["doc_id"])
    p1 = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"])
    old = assign_leakage_safe_splits(d1, p1, FR).select(
        "doc_id", "cluster_key", "split"
    )
    # batch 2: docs 11-16; new-new edge 11-12, new-old edge 13-5,
    # and an old-old edge discovered late (6-9) that merges nothing
    # new but must still rekey doc 9 into cluster 5
    d_all = spark.createDataFrame([(i,) for i in range(1, 17)], ["doc_id"])
    p2 = spark.createDataFrame(
        [(11, 12), (13, 5), (6, 9)], ["doc_a", "doc_b"]
    )
    incr_rows = update_splits(old, d_all, p2, FR).collect()
    full = assign_leakage_safe_splits(
        d_all, p1.unionByName(p2), FR
    )
    assert sorted(
        (r.doc_id, r.cluster_key, r.split) for r in incr_rows
    ) == sorted((r.doc_id, r.cluster_key, r.split) for r in full.collect())
    # stability: docs whose cluster was untouched keep their old split
    old_by_id = {r.doc_id: r for r in old.collect()}
    for r in incr_rows:
        if r.doc_id in old_by_id and r.cluster_key == old_by_id[
            r.doc_id
        ].cluster_key:
            assert r.split == old_by_id[r.doc_id].split
    # the merged cluster (5,6,9,13) is one key, one split
    by_id = {r.doc_id: r for r in incr_rows}
    assert {by_id[i].cluster_key for i in (5, 6, 9, 13)} == {5}
    assert len({by_id[i].split for i in (5, 6, 9, 13)}) == 1


def test_incremental_update_merging_two_old_clusters_rekeys(spark):
    from github_data_pipeline_spark.operators.splits import update_splits

    d1 = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    p1 = spark.createDataFrame([(1, 2), (5, 6)], ["doc_a", "doc_b"])
    old = assign_leakage_safe_splits(d1, p1, FR).select(
        "doc_id", "cluster_key", "split"
    )
    # a late edge merges old clusters {1,2} and {5,6}
    p2 = spark.createDataFrame([(2, 5)], ["doc_a", "doc_b"])
    incr_rows = update_splits(old, d1, p2, FR).collect()
    full = assign_leakage_safe_splits(d1, p1.unionByName(p2), FR)
    assert sorted(map(tuple, incr_rows)) == sorted(
        map(tuple, full.collect())
    )
    by_id = {r.doc_id: r for r in incr_rows}
    assert {by_id[i].cluster_key for i in (1, 2, 5, 6)} == {1}
    assert len({by_id[i].split for i in (1, 2, 5, 6)}) == 1


def test_registry_query_non_vacuous_on_corpus(spark, sf_dir):
    from github_data_pipeline_spark.plans import all_plans

    df = all_plans()["leakage_safe_splits"].builder(spark, sf_dir)
    rows = df.collect()
    splits = {r.split for r in rows}
    assert splits == {"train", "val", "test"}
    for r in rows:
        assert r.leaky_clusters == 0  # safe by construction, measured
        assert r.docs >= r.clusters > 0
    # the naive audit is shared (same scalar on every row)
    assert len({r.naive_leaky_clusters for r in rows}) == 1


def test_split_col_respects_fraction_order(spark):
    # a single-split dict degenerates to a constant
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    got = [
        r.s
        for r in df.select(
            split_col(F.col("id"), {"all": 1.0}).alias("s")
        ).collect()
    ]
    assert got == ["all", "all"]


def test_split_thresholds_zero_width_rejected():
    """A fraction smaller than the bucket resolution must raise, not
    silently produce an always-empty split (ADVICE r4)."""
    import pytest

    from github_data_pipeline_spark.operators.splits import (
        HASH_BUCKETS,
        split_thresholds,
    )

    tiny = 0.1 / HASH_BUCKETS
    with pytest.raises(ValueError, match="zero-width"):
        split_thresholds(
            {"train": 1.0 - tiny - 0.05, "val": tiny, "test": 0.05}
        )
    # two fractions rounding to the same cumulative bucket
    with pytest.raises(ValueError, match="zero-width"):
        split_thresholds(
            {"a": 0.5, "b": 0.3 / HASH_BUCKETS,
             "c": 0.5 - 0.3 / HASH_BUCKETS}
        )
    # sane fractions still resolve
    thr = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    assert [t for _, t in thr] == [900000, 950000, 1000000]
