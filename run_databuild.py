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


def build(spark, sf_dir: str, out: str, n_shards: int) -> dict:
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

    # 3. leakage-safe splits over the persisted pair artifact
    pairs = verified_pair_artifact(spark, sf_dir)
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
