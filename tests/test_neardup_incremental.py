"""Incremental LSH maintenance (operators/neardup.py): a new ingest
batch must produce exactly the candidate pairs a full recompute would
add, without re-shingling the existing corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.neardup import (
    MINHASH_K,
    band_index,
    doc_shingles,
    incremental_lsh_candidates,
    lsh_candidates,
    minhash_signatures,
)
from github_data_pipeline_spark.sources.tables import load_table, spread


def _docs(spark, sf_dir):
    return spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # split the corpus: docs with doc_id % 5 == 0 arrive "later"
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    old_bands = band_index(minhash_signatures(doc_shingles(old)))
    full_bands = band_index(minhash_signatures(doc_shingles(docs)))

    full = _pairs(lsh_candidates(full_bands))
    prior = _pairs(lsh_candidates(old_bands))
    inc, new_bands = incremental_lsh_candidates(new, old_bands)
    inc_pairs = _pairs(inc)

    # the union reconstructs the full build exactly — no pair missed,
    # no pair invented
    assert prior | inc_pairs == full
    # and the incremental path only contributes pairs touching new docs
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert all(a in new_ids or b in new_ids for a, b in inc_pairs)
    # the full build actually finds near-dups in this corpus (the
    # planted pairs) — the invariant above is not vacuous
    assert len(full) > 0 and len(inc_pairs) > 0

    # the appended index rows cover exactly the new docs, one row per
    # band, same schema as the persisted index
    assert new_bands.columns == ["doc_id", "band", "key"]
    per_doc = new_bands.groupBy("doc_id").count().collect()
    assert {r["doc_id"] for r in per_doc} == new_ids
    assert all(r["count"] == MINHASH_K // 4 for r in per_doc)


def test_incremental_touches_only_new_batch_lineage(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    old_bands = band_index(minhash_signatures(doc_shingles(docs))).filter(
        F.col("doc_id") % 5 != 0
    )
    new = docs.filter(F.col("doc_id") % 5 == 0)
    inc, _ = incremental_lsh_candidates(new, old_bands)
    # the physical plan must not contain a second full-document scan
    # beyond the new batch + the provided index: the corpus text is
    # never re-shingled (scan count: new batch lineage + index lineage)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 4  # new-batch reads + index build
