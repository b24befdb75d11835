"""End-to-end build driver (run_databuild.py): the whole chain lands
artifacts whose invariants hold, and the build is deterministic."""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    from run_databuild import build

    out = str(tmp_path_factory.mktemp("databuild"))
    report = build(spark, sf_dir, out, n_shards=4)
    return out, report


def test_funnel_monotone_and_report_invariants(built):
    out, report = built
    funnel = json.load(open(os.path.join(out, "funnel.json")))
    counts = [n for _name, n in funnel]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0  # the funnel must not empty the corpus
    assert report["splits_cover_final"]
    assert report["packing_covers_train"]
    assert report["manifest_covers_train"]


def test_splits_disjoint_and_leakage_safe(spark, built):
    out, report = built
    splits = spark.read.parquet(os.path.join(out, "splits"))
    # every doc exactly once
    assert splits.count() == report["final_docs"]
    assert splits.select("doc_id").distinct().count() == report["final_docs"]
    # leakage safety: a near-dup cluster never straddles splits
    assert (
        splits.groupBy("cluster_key")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )


def test_packs_conserve_tokens(spark, built):
    from github_data_pipeline_spark.functions.text import token_count

    out, report = built
    packs = spark.read.parquet(os.path.join(out, "packs.parquet"))
    train = spark.read.parquet(os.path.join(out, "splits")).filter(
        F.col("split") == "train"
    )
    want_tokens = train.agg(
        F.sum(token_count("text")).alias("t")
    ).collect()[0]["t"]
    assert report["packed_tokens"] == want_tokens
    # each doc packed exactly once
    packed_ids = packs.select(F.explode("doc_ids").alias("d"))
    assert packed_ids.count() == report["train_docs"]
    assert packed_ids.distinct().count() == report["train_docs"]


def test_shards_match_manifest_and_are_deterministic(
    spark, sf_dir, built, tmp_path
):
    out, report = built
    manifest = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    shards = spark.read.parquet(os.path.join(out, "shards"))
    got = {
        (r["shard"], r["docs"], r["content_checksum"])
        for r in manifest.collect()
    }
    # recompute the manifest from the shard FILES: identical
    content32 = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    re_derived = {
        (r["shard"], r["docs"], r["content_checksum"])
        for r in shards.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(content32).alias("content_checksum"),
        )
        .collect()
    }
    assert got == re_derived and len(got) == report["n_shards"]

    # determinism: a fresh build in a new directory yields the same
    # manifest (same corpus, same seed -> same permutation)
    from run_databuild import build

    out2 = str(tmp_path / "rebuild")
    build(spark, sf_dir, out2, n_shards=4)
    again = {
        (r["shard"], r["docs"], r["content_checksum"])
        for r in spark.read.parquet(
            os.path.join(out2, "manifest.parquet")
        ).collect()
    }
    assert again == got


def test_incremental_build_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Driver-level incremental==full: build on the first 80% of doc
    ids, fold in the last 20% with incremental_update, and compare
    against a one-shot build over everything — final split table and
    shard manifest must be IDENTICAL (monotone ingest ids, so old
    near-dup keepers stay stable)."""
    from run_databuild import build, incremental_update

    T = 400  # first 80% of the 0-499 id space is the base corpus

    full_out = str(tmp_path / "full")
    build(spark, sf_dir, full_out, n_shards=4)

    inc_out = str(tmp_path / "inc")
    build(spark, sf_dir, inc_out, n_shards=4, doc_filter=F.col("doc_id") < T)
    report = incremental_update(
        spark, sf_dir, inc_out, F.col("doc_id") >= T
    )
    assert report["new_docs_ingested"] > 0

    def splits_set(out):
        return {
            (r["doc_id"], r["cluster_key"], r["split"])
            for r in spark.read.parquet(os.path.join(out, "splits")).collect()
        }

    assert splits_set(inc_out) == splits_set(full_out)

    def manifest_set(out):
        return {
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(out, "manifest.parquet")
            ).collect()
        }

    assert manifest_set(inc_out) == manifest_set(full_out)
    # the shard FILES must agree with the merged manifest too
    shards = spark.read.parquet(os.path.join(inc_out, "shards"))
    content32 = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "long"
    )
    re_derived = {
        (r["shard"], r["docs"], r["content_checksum"])
        for r in shards.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(content32).alias("content_checksum"),
        )
        .collect()
    }
    want = {
        (r["shard"], r["docs"], r["content_checksum"])
        for r in spark.read.parquet(
            os.path.join(inc_out, "manifest.parquet")
        ).collect()
    }
    assert re_derived == want


def test_incremental_append_path_merges_manifest(spark, sf_dir, tmp_path):
    """A batch that changes no old doc (no new benchmark slice, no
    cross-batch keeper change) must take the cheap path: shards
    APPENDED (not rebuilt) and the manifest produced by the mergeable
    old ⊎ delta aggregation — still identical to the full rebuild."""
    from run_databuild import build, incremental_update

    # ids 486-499: past the last benchmark id (485) and touching no
    # verified near-dup pair, so nothing old moves
    T = 486
    inc_out = str(tmp_path / "inc")
    build(spark, sf_dir, inc_out, n_shards=4, doc_filter=F.col("doc_id") < T)
    report = incremental_update(
        spark, sf_dir, inc_out, F.col("doc_id") >= T
    )
    assert report["moved_out_of_train"] == 0
    assert report["shards_rebuilt"] is False
    assert report["new_docs_ingested"] > 0

    full_out = str(tmp_path / "full")
    build(spark, sf_dir, full_out, n_shards=4)

    def manifest_set(out):
        return {
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(out, "manifest.parquet")
            ).collect()
        }

    assert manifest_set(inc_out) == manifest_set(full_out)
