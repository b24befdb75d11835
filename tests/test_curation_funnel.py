"""End-to-end curation funnel (curation.py): stage composition,
monotonicity, and the dedup keeper rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.curation import (
    curate,
    funnel_report,
    neardup_drop_stage,
)
from github_data_pipeline_spark.sources.tables import load_table, spread


def _docs(spark, sf_dir):
    return spread(load_table(spark, sf_dir, "documents"))


def test_funnel_monotone_and_nonempty(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    final, stages = curate(docs, sample_rates=None)
    report = funnel_report(stages)
    names = [n for n, _ in report]
    assert names == [
        "raw", "cleaned_nonempty", "language", "quality", "repetition",
        "neardup_dropped",
    ]
    counts = [c for _, c in report]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > 0 and counts[-1] > 0
    # every gate must actually gate something on this corpus OR pass all
    # through — but the near-dup stage must drop the planted dups
    assert counts[4] > counts[5], "near-dup stage dropped nothing"


def test_neardup_drop_keeps_lowest_id(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    kept = neardup_drop_stage(docs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # recompute the verified pairs directly: for every dropped pair the
    # lower id must survive unless itself dropped by an earlier pair
    from github_data_pipeline_spark.plans import all_plans

    pairs = (
        all_plans()["neardup_jaccard_pairs"]
        .builder(spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    )
    assert len(pairs) > 0
    for r in pairs:
        assert not (r["doc_a"] in kept_ids and r["doc_b"] in kept_ids), (
            "both sides of a >=0.8 pair survived"
        )


def test_funnel_with_budget_sample(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    final, stages = curate(docs, sample_rates={s: 0.5 for s in sources})
    assert stages[-1][0] == "budget_sample"
    assert 0 < final.count() <= stages[-2][1].count()


def test_survivor_counts_match_stage_by_stage(spark, sf_dir):
    """The one-scan funnel report (funnel_survivor_counts — what the
    registry's curation_funnel_report ships) must equal counting each
    curate() stage directly: the two paths share the gate predicate
    functions, and this pins that the checkpoint/semi-join replumbing
    changed cost, not semantics."""
    from github_data_pipeline_spark.curation import funnel_survivor_counts

    docs = _docs(spark, sf_dir)
    _final, stages = curate(docs, sample_rates=None)
    want = [(n, df.count()) for n, df in stages]
    got = [
        (r["stage"], r["survivors"])
        for r in funnel_survivor_counts(docs).collect()
    ]
    assert got == want


def test_funnel_report_plan_has_no_full_refunnel(spark, sf_dir):
    """The report must execute from checkpointed flag/survivor state:
    its physical plan may scan `documents` for the raw count and the
    survivor semi-join, but must NOT contain the cleaning regexes more
    than twice (the naive per-stage report carries them 5x)."""
    from github_data_pipeline_spark.curation import funnel_survivor_counts

    docs = _docs(spark, sf_dir)
    plan = funnel_survivor_counts(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    assert plan.count("<EMAIL>") <= 2, "cleaning regexes re-run per stage"


def test_survivor_boundary_stores_are_equivalent(spark, sf_dir, tmp_path):
    """The survivor-text materialization must yield the identical
    funnel report under all three storage options — localCheckpoint
    (bench SFs), DISK_ONLY persist, and a parquet scratch table (the
    100-TB boundary that survives executor loss)."""
    import pytest

    from github_data_pipeline_spark.curation import funnel_survivor_counts

    docs = _docs(spark, sf_dir)
    base = funnel_survivor_counts(docs).collect()
    disk = funnel_survivor_counts(docs, survivor_store="disk").collect()
    table = funnel_survivor_counts(
        docs, survivor_store="table", scratch_dir=str(tmp_path)
    ).collect()
    assert [r.asDict() for r in base] == [r.asDict() for r in disk]
    assert [r.asDict() for r in base] == [r.asDict() for r in table]
    with pytest.raises(ValueError, match="scratch_dir"):
        funnel_survivor_counts(docs, survivor_store="table")
    with pytest.raises(ValueError, match="unknown boundary store"):
        funnel_survivor_counts(docs, survivor_store="ram")
