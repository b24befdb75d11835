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


SYN_TEXTS = {
    1: "the old lighthouse keeper walked along the rocky shore every "
    "morning because he believed the sea would always tell him what "
    "kind of day was coming for the village",
    2: "a small bakery on the corner of the market square opened before "
    "dawn and the smell of fresh bread drifted through the quiet "
    "streets while most people were still asleep in their homes",
    3: "scientists who study glaciers have found that the ice keeps a "
    "record of the air from centuries ago and this record helps them "
    "understand how the climate of the planet has changed",
    4: "the orchestra rehearsed the difficult passage many times until "
    "every musician could play it from memory and the conductor was "
    "finally satisfied with the balance between the strings and brass",
    5: "during the long winter the farmers repaired their tools and "
    "planned which fields they would plant in spring because good "
    "preparation was the only thing that kept the harvest reliable",
    6: "the library at the end of our street keeps a shelf of maps "
    "from the last century and children often spend whole afternoons "
    "tracing the old roads that no longer appear on modern maps",
    7: "when the ferry crossed the narrow strait the passengers could "
    "see dolphins swimming beside the hull and the captain slowed "
    "the engines so that everyone had time to watch them play",
    8: "an engineer inspected the bridge after the storm and wrote a "
    "careful report about which cables needed to be replaced before "
    "heavy trucks could be allowed to cross the river again",
}


def _write_syn_documents(spark, out_dir):
    rows = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in SYN_TEXTS.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def test_incremental_moved_into_train_appends(
    spark, tmp_path, monkeypatch
):
    """The moved-IN case the append path must not silently drop: a
    new-batch edge chain merges two OLD clusters, the winning key
    hashes to train, and the losing cluster's docs flow INTO train
    with ``moved_out == 0``. The appended slice must carry those old
    movers (not just the batch's new docs) and the merged manifest
    must still cover train exactly.

    Synthetic 8-doc corpus (md5-bucket facts pinned by construction):
    doc 1 buckets to train, doc 4 to test. Base edges: (4,5) — cluster
    {4,5} keyed 4 -> test. Batch doc 7 brings edges (1,7) and (4,7),
    merging {1} and {4,5} under key 1 -> docs 4 and 5 move test ->
    train while no old train doc moves out."""
    from run_databuild import build, incremental_update
    from github_data_pipeline_spark.plans import dedup_plans

    syn_dir = str(tmp_path / "syn")
    os.makedirs(syn_dir)
    _write_syn_documents(spark, syn_dir)

    edges = spark.createDataFrame(
        [(4, 5), (1, 7), (4, 7)], "doc_a long, doc_b long"
    )
    monkeypatch.setattr(
        dedup_plans, "verified_pair_artifact", lambda *_a, **_k: edges
    )

    out = str(tmp_path / "inc")
    base = build(
        spark, syn_dir, out, n_shards=2, doc_filter=F.col("doc_id") <= 6
    )
    # every synthetic doc must survive the funnel, or the scenario is
    # silently weaker than designed
    assert base["final_docs"] == 6
    base_splits = {
        r["doc_id"]: r["split"]
        for r in spark.read.parquet(os.path.join(out, "splits")).collect()
    }
    assert base_splits[1] == "train"
    assert base_splits[4] == "test" and base_splits[5] == "test"

    report = incremental_update(spark, syn_dir, out, F.col("doc_id") >= 7)
    assert report["moved_out_of_train"] == 0
    assert report["shards_rebuilt"] is False
    assert report["moved_into_train"] == 2  # docs 4 and 5
    assert report["manifest_covers_train"]

    updated = {
        r["doc_id"]: r["split"]
        for r in spark.read.parquet(os.path.join(out, "splits")).collect()
    }
    assert updated[4] == "train" and updated[5] == "train"
    # the shard FILES must contain the movers — this is exactly what
    # the append-only-new-docs bug lost
    shard_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "shards"))
        .select("doc_id")
        .collect()
    }
    train_ids = {d for d, s in updated.items() if s == "train"}
    assert {4, 5} <= shard_ids
    assert shard_ids == train_ids
    # ...and the merged old ⊎ delta manifest equals one recomputed
    # from the shard files
    shards = spark.read.parquet(os.path.join(out, "shards"))
    content32 = F.conv(
        F.substring(F.md5(F.col("text")), 1, 8), 16, 10
    ).cast("long")
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
            os.path.join(out, "manifest.parquet")
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
