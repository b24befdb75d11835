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
