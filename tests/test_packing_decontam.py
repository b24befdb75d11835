"""Sequence packing (operators/packing.py) and benchmark
decontamination (operators/decontam.py) over the real documents
table."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.functions import text as T
from github_data_pipeline_spark.operators.decontam import (
    contamination_report,
    decontaminate,
)
from github_data_pipeline_spark.operators.packing import pack_sequences
from github_data_pipeline_spark.sources.tables import load_table, spread


def _docs(spark, sf_dir):
    return spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def test_packing_partitions_every_doc_once(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    budget = 60
    packs = pack_sequences(docs, budget=budget).collect()
    packed_ids = [d for r in packs for d in r["doc_ids"]]
    all_ids = [r["doc_id"] for r in docs.collect()]
    # exactly-once cover
    assert sorted(packed_ids) == sorted(all_ids)
    # budget respected except flagged oversize singletons
    for r in packs:
        if r["oversize"]:
            assert r["n_docs"] == 1 and r["total_tokens"] > budget
        else:
            assert r["total_tokens"] <= budget
        assert r["n_docs"] == len(r["doc_ids"])
    # totals agree with the JVM-side token counts
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", T.token_count("text").alias("n")
        ).collect()
    }
    for r in packs:
        assert r["total_tokens"] == sum(want[d] for d in r["doc_ids"])
    # packing actually packs: fewer packs than docs at this budget
    assert len(packs) < len(all_ids)
    # deterministic
    again = pack_sequences(docs, budget=budget).collect()
    assert sorted(map(repr, again)) == sorted(map(repr, packs))


def test_packing_deterministic_pid_is_partition_invariant(spark, sf_dir):
    """With the data-derived shard key the registry entry uses, the
    pack assignment must be a pure function of the data: bit-identical
    under a different input partitioning (the default
    spark_partition_id mode is deliberately partitioning-dependent —
    that is its zero-shuffle production trade)."""
    docs = _docs(spark, sf_dir)
    pid = F.pmod(F.col("doc_id"), F.lit(4))
    base = pack_sequences(docs, budget=96, pid=pid).collect()
    alt = pack_sequences(docs.repartition(7), budget=96, pid=pid).collect()
    assert sorted(map(repr, base)) == sorted(map(repr, alt))
    assert len(base) > 0


def test_packing_manifest_flags_all_green(spark, sf_dir):
    """The registry entry's invariant flags must all be 1 and its
    oversize lane must be non-vacuous at the entry's budget (fixture
    docs run 10-99 tokens, budget 96)."""
    from github_data_pipeline_spark.plans import all_plans

    row = (
        all_plans()["seq_packing_manifest"].builder(spark, sf_dir).collect()
    )
    assert len(row) == 1
    r = row[0].asDict()
    assert r["every_doc_packed_once"] == 1
    assert r["no_pack_over_budget"] == 1
    assert r["tokens_conserved"] == 1
    assert r["packs_within_ff_bound"] == 1
    assert r["oversize_docs"] > 0  # the flagged-singleton lane is real


def test_decontamination_flags_planted_overlap(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # benchmark = verbatim excerpts of a few corpus docs (the worst
    # case: exact leakage), plus one novel doc that must NOT flag
    leaked = docs.filter(F.col("doc_id") % 100 == 7).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(2_000_000, "completely unrelated zz qq ww ee rr tt yy uu ii oo pp")],
        "doc_id long, text string",
    )
    bench = leaked.unionByName(novel)

    report = contamination_report(docs, bench, min_hits=2)
    flagged = {r["doc_id"] for r in report.collect()}
    leaked_src = {
        r["doc_id"] for r in docs.filter(F.col("doc_id") % 100 == 7).collect()
    }
    # every leaked source doc is caught
    assert leaked_src <= flagged
    # the novel benchmark doc flags nothing
    assert not {
        r["doc_id"]
        for r in report.filter(F.col("bench_id") == 2_000_000).collect()
    }

    clean = decontaminate(docs, bench, min_hits=2)
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert clean_ids.isdisjoint(leaked_src)
    assert clean_ids | flagged >= {r["doc_id"] for r in docs.collect()}


def test_decontamination_benchmark_side_broadcasts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.limit(5)
    plan = (
        contamination_report(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, "benchmark shingles must broadcast"
