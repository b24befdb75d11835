"""End-to-end training-data build — the LLM-data twin of
``run_pipeline.py``'s GitHub workflow: one command from raw documents
to training shards, composing the engine's first-class operators in
the order a data team actually runs them.

    documents.parquet
      -> curation funnel (clean -> language -> quality -> repetition
         -> near-dup drop)                       [curation.curate]
      -> decontaminate vs the benchmark holdout  [operators/decontam]
      -> leakage-safe splits over the persisted near-dup pair
         artifact                                [operators/splits]
      -> sequence packing (train split)          [operators/packing]
      -> deterministic shards + manifest         [operators/sharding]

Outputs under ``--out``:

    funnel.json        per-stage survivor counts (monotone decreasing)
    splits/            split=train|val|test parquet partitions
    packs.parquet      (pack_id, doc_ids, n_docs, total_tokens, oversize)
    shards/            shard=K parquet of train docs in order-key order
    manifest.parquet   per-shard docs/chars/key-span/content checksum
    build_report.json  final counts + invariants the run itself checks

The benchmark holdout is the ``doc_id % 97 == 0`` slice — the same
deterministic convention as the oracle-checked ``decontam_overlap``
query, standing in for the external eval sets a real pipeline loads.

Every stage before the near-dup shuffle is a map-side filter Catalyst
pushes toward the scan; the pair table comes from the persisted
artifact (built once per corpus, reused by every consumer); packing
moves only (doc_id, n_tokens) longs through Arrow; shard writing is
one shuffle on the shard id. The same invocation shape runs at any
scale factor.

    python run_databuild.py [--sf-dir DIR] [--out DIR] [--shards N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _both_endpoints_in(pairs, docs):
    """Pair edges restricted to the given doc set (both endpoints)."""
    from pyspark.sql import functions as F

    ids = docs.select(F.col("doc_id"))
    return (
        pairs.join(
            F.broadcast(ids.withColumnRenamed("doc_id", "doc_a")),
            "doc_a",
            "left_semi",
        ).join(
            F.broadcast(ids.withColumnRenamed("doc_id", "doc_b")),
            "doc_b",
            "left_semi",
        )
    )


def build(spark, sf_dir: str, out: str, n_shards: int, doc_filter=None) -> dict:
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.curation import curate, funnel_report
    from github_data_pipeline_spark.operators.decontam import decontaminate
    from github_data_pipeline_spark.operators.packing import pack_sequences
    from github_data_pipeline_spark.operators.sharding import (
        shard_manifest,
        assign_shards,
        write_shards,
    )
    from github_data_pipeline_spark.operators.splits import (
        assign_leakage_safe_splits,
    )
    from github_data_pipeline_spark.plans.curation_plans import (
        DECONTAM_MIN_HITS,
    )
    from github_data_pipeline_spark.plans.dedup_plans import (
        verified_pair_artifact,
    )
    from github_data_pipeline_spark.sources.tables import load_table, spread

    os.makedirs(out, exist_ok=True)
    docs = spread(load_table(spark, sf_dir, "documents"))
    if doc_filter is not None:
        docs = docs.filter(doc_filter)

    # 1. curation funnel (the benchmark holdout never enters the corpus)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    final, stages = curate(corpus)

    # 2. decontamination against the benchmark shingles
    cleaned = decontaminate(final, benchmark, n=3, min_hits=DECONTAM_MIN_HITS)
    stages.append(("decontaminated", cleaned))
    # one materialization reused by every downstream count/write
    cleaned = cleaned.localCheckpoint()

    funnel = funnel_report(stages)
    with open(os.path.join(out, "funnel.json"), "w") as f:
        json.dump(funnel, f, indent=1)

    # 3. leakage-safe splits over the persisted pair artifact,
    # restricted to edges between SURVIVING docs (an edge to a
    # funnel-dropped doc must not drive a cluster key, and the
    # restriction is what makes the incremental path's edge algebra
    # exact: base edges ∪ new-touching edges == full edges)
    pairs = _both_endpoints_in(
        verified_pair_artifact(spark, sf_dir), cleaned
    )
    split_docs = assign_leakage_safe_splits(
        cleaned, pairs, SPLIT_FRACTIONS
    ).localCheckpoint()
    (
        split_docs.write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(out, "splits"))
    )
    train = split_docs.filter(F.col("split") == "train")

    # 4. sequence packing (train only)
    packs = pack_sequences(train, budget=512)
    packs.write.mode("overwrite").parquet(os.path.join(out, "packs.parquet"))

    # 5. deterministic shards + manifest
    write_shards(train, os.path.join(out, "shards"), n_shards)
    manifest = shard_manifest(assign_shards(train, n_shards))
    manifest.write.mode("overwrite").parquet(
        os.path.join(out, "manifest.parquet")
    )

    # invariants the run checks about itself (cheap at any scale:
    # every count is an aggregate over an already-written artifact)
    split_counts = {
        r["split"]: r["n"]
        for r in split_docs.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    pack_stats = packs.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("total_tokens").alias("tokens"),
    ).collect()[0]
    manifest_docs = manifest.agg(F.sum("docs")).collect()[0][0]
    n_final = cleaned.count()
    n_train = train.count()
    report = {
        "sf_dir": sf_dir,
        "final_docs": n_final,
        "split_counts": split_counts,
        "splits_cover_final": sum(split_counts.values()) == n_final,
        "train_docs": n_train,
        "packed_docs": int(pack_stats["docs"]),
        "packing_covers_train": int(pack_stats["docs"]) == n_train,
        "packed_tokens": int(pack_stats["tokens"]),
        "manifest_docs": int(manifest_docs),
        "manifest_covers_train": int(manifest_docs) == n_train,
        "n_shards": n_shards,
    }
    with open(os.path.join(out, "build_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def incremental_update(spark, sf_dir: str, out: str, new_pred) -> dict:
    """Fold a new ingest batch into an EXISTING build at ``out``.

    ``new_pred`` is the Column predicate selecting the batch's docs in
    the documents table. Work is proportional to the batch everywhere
    the math allows:

    * the curation funnel runs on the NEW docs only (it is per-doc);
    * split maintenance goes through ``operators/splits.update_splits``
      — new edges collapsed through the old manifest, components over
      the batch-sized collapsed graph (incremental==full proven in
      tests/test_splits.py; the driver-level equivalence is re-proven
      end-to-end in tests/test_databuild_e2e.py);
    * shards APPEND only the new train docs (order keys are
      per-doc-deterministic, so placement never depends on history);
    * the manifest is MERGEABLE by construction (sums + min/max), so
      the new manifest is old ⊎ delta — no full re-aggregation.

    One case forces a partial rebuild: a new edge merging two OLD
    clusters can re-key survivors OUT of train (the no-leakage
    invariant demands it). Those docs are detected and the shard
    store is rewritten only then (reported as ``shards_rebuilt``).
    The mirror case — old val/test survivors re-keyed INTO train with
    ``moved_out == 0`` — does NOT force a rebuild: the appended slice
    is every train doc not previously in train (new docs plus
    movers), and ``manifest_covers_train`` is recomputed from the
    written manifest so a missed doc can never pass silently.

    New-batch near-dup edges come from the corpus pair artifact here;
    in a live pipeline the incremental LSH index
    (operators/neardup.py maintenance path) produces exactly this
    edge set without re-scanning history.
    """
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.curation import (
        clean_stage,
        language_stage,
        neardup_drop_stage,
        quality_stage,
        repetition_stage,
    )
    from github_data_pipeline_spark.operators.decontam import decontaminate
    from github_data_pipeline_spark.operators.packing import pack_sequences
    from github_data_pipeline_spark.operators.sharding import (
        assign_shards,
        shard_manifest,
        write_shards,
    )
    from github_data_pipeline_spark.operators.splits import update_splits
    from github_data_pipeline_spark.plans.curation_plans import (
        DECONTAM_MIN_HITS,
    )
    from github_data_pipeline_spark.plans.dedup_plans import (
        verified_pair_artifact,
    )
    from github_data_pipeline_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # materialize BEFORE anything overwrites the directories being
    # read (splits/ and manifest.parquet are both rewritten below;
    # a lazy read evaluated after the overwrite hits deleted files)
    old_assigned = spark.read.parquet(
        os.path.join(out, "splits")
    ).localCheckpoint()
    prev_docs = old_assigned.drop("cluster_key", "split", "naive_split")

    # per-doc gates run on the batch ONLY (they are pointwise); the
    # near-dup drop must see old+new together — a new doc duplicating
    # an old survivor has to lose to it (monotone ids keep the old
    # keeper stable), and a new-new cluster keeps one member
    new_raw = docs.filter(new_pred)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    new_corpus = new_raw.filter(F.col("doc_id") % 97 != 0)
    new_gated = repetition_stage(
        quality_stage(language_stage(clean_stage(new_corpus)))
    )
    union = prev_docs.unionByName(new_gated.select(*prev_docs.columns))
    deduped = neardup_drop_stage(union).localCheckpoint()
    # decontam runs after dedup, mirroring build()'s stage order. Two
    # screens: new docs against the FULL benchmark, and — the part a
    # naive incremental forgets — OLD survivors against the NEW
    # benchmark slice (the eval set grew with this batch; a doc that
    # was clean yesterday can be contaminated against today's
    # benchmark). The new-benchmark side is tiny and broadcasts, so
    # the re-screen costs one pass over the survivors' shingles.
    new_dedup = deduped.join(
        F.broadcast(new_gated.select("doc_id")), "doc_id", "left_semi"
    )
    prev_dedup = deduped.join(
        F.broadcast(new_gated.select("doc_id")), "doc_id", "left_anti"
    )
    new_clean = decontaminate(
        new_dedup, benchmark, n=3, min_hits=DECONTAM_MIN_HITS
    ).localCheckpoint()
    new_benchmark = new_raw.filter(F.col("doc_id") % 97 == 0)
    prev_screened = decontaminate(
        prev_dedup, new_benchmark, n=3, min_hits=DECONTAM_MIN_HITS
    )
    all_docs = prev_screened.unionByName(new_clean)
    # edges touching the batch, endpoints restricted to survivors
    all_pairs = _both_endpoints_in(
        verified_pair_artifact(spark, sf_dir), all_docs
    )
    new_ids = new_clean.select("doc_id")
    new_pairs = all_pairs.join(
        F.broadcast(
            new_ids.withColumnRenamed("doc_id", "doc_a")
        ),
        "doc_a",
        "left_semi",
    ).unionByName(
        all_pairs.join(
            F.broadcast(new_ids.withColumnRenamed("doc_id", "doc_b")),
            "doc_b",
            "left_semi",
        )
    ).distinct()

    updated = update_splits(
        old_assigned.select(*all_docs.columns, "cluster_key"),
        all_docs,
        new_pairs,
        SPLIT_FRACTIONS,
    ).localCheckpoint()
    (
        updated.write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(out, "splits"))
    )

    train = updated.filter(F.col("split") == "train")
    # max id + 1, not row count: an empty shard has no manifest row.
    # An EMPTY manifest (zero-doc prior build) degenerates to the
    # configured default — max() over no rows is a ValueError.
    manifest_shard_ids = [
        r["shard"]
        for r in spark.read.parquet(
            os.path.join(out, "manifest.parquet")
        ).collect()
    ]
    n_shards = 1 + max(manifest_shard_ids) if manifest_shard_ids else 4
    # docs whose re-keying moved them OUT of train: the append-only
    # shard path cannot express a removal
    old_train_ids = old_assigned.filter(
        F.col("split") == "train"
    ).select("doc_id")
    moved_out = old_train_ids.join(
        train.select("doc_id"), "doc_id", "left_anti"
    ).count()
    # ...and OLD docs whose re-keying moved them INTO train (a new
    # edge chain merging two old clusters re-keys the losing cluster;
    # if the winning key hashes to train, val/test survivors flow in
    # with moved_out == 0). The append path CAN express an addition,
    # so these don't force a rebuild — they just must be part of the
    # appended slice. Appending every train doc not previously in
    # train (rather than only the batch's new docs) covers both.
    to_append = train.join(old_train_ids, "doc_id", "left_anti")
    moved_in = to_append.join(
        F.broadcast(new_ids), "doc_id", "left_anti"
    ).count()
    if moved_out:
        write_shards(train, os.path.join(out, "shards"), n_shards)
        manifest = shard_manifest(assign_shards(train, n_shards))
        rebuilt = True
    else:
        assigned_new = assign_shards(to_append, n_shards)
        (
            assigned_new.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "order_key")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(os.path.join(out, "shards"))
        )
        # mergeable manifest: old ⊎ delta
        old_manifest = spark.read.parquet(
            os.path.join(out, "manifest.parquet")
        ).localCheckpoint()
        delta = shard_manifest(assigned_new)
        manifest = (
            old_manifest.unionByName(delta)
            .groupBy("shard")
            .agg(
                F.sum("docs").alias("docs"),
                F.sum("chars").alias("chars"),
                F.min("first_key").alias("first_key"),
                F.max("last_key").alias("last_key"),
                F.sum("content_checksum").alias("content_checksum"),
            )
            .orderBy("shard")
        )
        rebuilt = False
    manifest = manifest.localCheckpoint()
    manifest.write.mode("overwrite").parquet(
        os.path.join(out, "manifest.parquet")
    )

    packs = pack_sequences(train, budget=512)
    packs.write.mode("overwrite").parquet(os.path.join(out, "packs.parquet"))

    n_final = updated.count()
    n_train = train.count()
    # the invariant that would expose a silently-missed train doc:
    # whatever path ran, the written manifest must account for exactly
    # the docs splits/ says are train
    manifest_docs = int(manifest.agg(F.sum("docs")).collect()[0][0] or 0)
    report = {
        "sf_dir": sf_dir,
        "final_docs": n_final,
        "new_docs_ingested": new_clean.count(),
        "train_docs": n_train,
        "moved_out_of_train": moved_out,
        "moved_into_train": moved_in,
        "shards_rebuilt": rebuilt,
        "manifest_docs": manifest_docs,
        "manifest_covers_train": manifest_docs == n_train,
        "n_shards": n_shards,
    }
    with open(os.path.join(out, "build_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main(argv: list[str] | None = None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/gdp_databuild")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args(argv)

    from github_data_pipeline_spark.session import get_spark

    spark = get_spark("databuild", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    report = build(spark, args.sf_dir, args.out, args.shards)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
