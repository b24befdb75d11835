"""SCD Type-2 merge (operators/incremental.py) and edit-distance
candidate verification (operators/neardup.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.incremental import scd2_merge
from github_data_pipeline_spark.operators.neardup import (
    lsh_candidates,
    band_index,
    doc_shingles,
    minhash_signatures,
    verify_candidates_edit_distance,
)
from github_data_pipeline_spark.sources.tables import load_table, spread

TS = datetime.datetime


def _hist(spark, rows):
    return spark.createDataFrame(
        rows,
        "k bigint, v string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )


def test_scd2_bootstrap_and_merge(spark):
    empty = _hist(spark, [])
    upd1 = spark.createDataFrame(
        [(1, "a", TS(2024, 1, 1)), (2, "x", TS(2024, 1, 2))],
        "k bigint, v string, ts timestamp",
    )
    h1 = scd2_merge(empty, upd1, "k", "ts")
    rows = {r["k"]: r for r in h1.collect()}
    assert rows[1]["is_current"] and rows[1]["valid_to"] is None
    assert rows[1]["valid_from"] == TS(2024, 1, 1)

    # second batch: k=1 updated twice (chained), k=3 brand new
    upd2 = spark.createDataFrame(
        [(1, "b", TS(2024, 2, 1)), (1, "c", TS(2024, 3, 1)), (3, "n", TS(2024, 2, 15))],
        "k bigint, v string, ts timestamp",
    )
    h2 = scd2_merge(h1, upd2, "k", "ts")
    k1 = sorted(
        (r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in h2.filter(F.col("k") == 1).collect()
    )
    assert k1 == [
        ("a", TS(2024, 1, 1), TS(2024, 2, 1), False),
        ("b", TS(2024, 2, 1), TS(2024, 3, 1), False),
        ("c", TS(2024, 3, 1), None, True),
    ]
    # untouched key keeps its row; new key appears current
    k2 = h2.filter(F.col("k") == 2).collect()
    assert len(k2) == 1 and k2[0]["is_current"]
    k3 = h2.filter(F.col("k") == 3).collect()
    assert len(k3) == 1 and k3[0]["is_current"]


def test_scd2_invariants_one_current_contiguous(spark):
    empty = _hist(spark, [])
    upd = spark.createDataFrame(
        [(k, f"v{k}-{i}", TS(2024, 1 + i, 1)) for k in (1, 2, 3) for i in range(3)],
        "k bigint, v string, ts timestamp",
    )
    h = scd2_merge(empty, upd, "k", "ts")
    cur = h.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur) and len(cur) == 3
    # contiguity: each non-current row's valid_to is a later row's valid_from
    rows = sorted(
        h.filter(F.col("k") == 1).collect(), key=lambda r: r["valid_from"]
    )
    for prev, nxt in zip(rows, rows[1:]):
        assert prev["valid_to"] == nxt["valid_from"]


def test_edit_distance_verifier_exact_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dot"),  # dist 1
            (3, "a completely different animal sentence here"),
            (4, "the quick brown fox jumps over the lazy"),  # dist 4 vs 1
        ],
        "doc_id bigint, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in verify_candidates_edit_distance(cands, docs, max_dist=10).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 4)] == 4
    assert (1, 3) not in got  # over threshold -> dropped


def test_edit_distance_on_lsh_candidates(spark, sf_dir):
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    cands = lsh_candidates(band_index(minhash_signatures(doc_shingles(docs))))
    verified = verify_candidates_edit_distance(cands, docs, max_dist=50)
    rows = verified.collect()
    assert rows  # planted near-dups are small edits of each other
    assert all(0 <= r["edit_distance"] <= 50 for r in rows)
    # verified pairs are a subset of the candidate set
    c = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert all((r["doc_a"], r["doc_b"]) in c for r in rows)
