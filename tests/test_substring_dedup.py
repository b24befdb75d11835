"""Cross-document substring dedup (operators/substring_dedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.substring_dedup import (
    duplicate_spans,
    excise_duplicate_spans,
    flagged_windows,
    positional_ngrams,
)
from github_data_pipeline_spark.sources.tables import load_table, spread

BOILER = "this boilerplate footer text is repeated across many documents verbatim"
# 10 tokens -> three 8-token windows (starts 0,1,2) when it leads a doc


def _docs(spark):
    rows = [
        (1, f"{BOILER} plus unique tail one"),
        (2, f"{BOILER} and another unique ending two"),
        (3, "completely original text with no duplication at all in here ok"),
        (4, f"prefix words here {BOILER}"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_positional_ngrams_positions(spark):
    df = spark.createDataFrame([(7, "a b c d e f g h i")], "doc_id bigint, text string")
    rows = positional_ngrams(df, n=8).collect()
    assert sorted(r["start"] for r in rows) == [0, 1]
    # doc shorter than the window emits nothing
    short = spark.createDataFrame([(8, "too short")], "doc_id bigint, text string")
    assert positional_ngrams(short, n=8).count() == 0


def test_flagged_windows_keep_canonical_owner(spark):
    flagged = flagged_windows(_docs(spark), n=8).collect()
    # doc 1 is the smallest id containing the boilerplate -> never flagged
    assert all(r["doc_id"] != 1 for r in flagged)
    assert all(r["owner_doc"] == 1 for r in flagged)
    # docs 2 and 4 both carry flagged windows; doc 3 is clean
    assert {r["doc_id"] for r in flagged} == {2, 4}


def test_duplicate_spans_merge_overlaps(spark):
    spans = {r["doc_id"]: r for r in duplicate_spans(_docs(spark), n=8).collect()}
    # the 10-token shared run -> one merged span of 3 overlapping windows
    assert spans[2]["span_start"] == 0 and spans[2]["span_end"] == 9
    assert spans[2]["windows"] == 3
    # in doc 4 the run starts at token 3
    assert spans[4]["span_start"] == 3 and spans[4]["span_end"] == 12


def test_excise_removes_duplicates_keeps_canonical(spark):
    out = {r["doc_id"]: r for r in excise_duplicate_spans(_docs(spark), n=8).collect()}
    assert BOILER in out[1]["text"] and out[1]["tokens_removed"] == 0
    assert BOILER not in out[2]["text"]
    assert out[2]["text"] == "and another unique ending two"
    assert out[2]["tokens_removed"] == 10
    assert out[3]["text"].startswith("completely original")
    assert out[4]["text"] == "prefix words here"
    # total token accounting: removed == window coverage
    assert out[4]["tokens_removed"] == 10


def test_substring_dedup_on_documents_table(spark, sf_dir):
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    out = excise_duplicate_spans(docs, n=8)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("tokens_removed") > 0, 1).otherwise(0)).alias("touched"),
    ).collect()[0]
    assert agg["docs"] == docs.count()
    # the testdata plants near-duplicate documents -> spans must fire
    assert agg["touched"] > 0


def test_plan_stays_jvm_side(spark):
    plan = excise_duplicate_spans(_docs(spark), n=8)._jdf.queryExecution().explainString(
        _docs(spark).sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_matches_full_recompute(spark, sf_dir):
    from github_data_pipeline_spark.operators.substring_dedup import (
        gram_index,
        incremental_flagged_windows,
        merge_gram_index,
    )

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    batch1 = docs.filter(F.col("doc_id") < 100)
    batch2 = docs.filter(F.col("doc_id") >= 100)  # monotone: ids above batch1

    idx = gram_index(batch1)
    inc = incremental_flagged_windows(batch2, idx)
    full = flagged_windows(docs).filter(F.col("doc_id") >= 100)
    key = lambda r: (r["doc_id"], r["start"], r["end"], r["owner_doc"])  # noqa: E731
    inc_rows = sorted(key(r) for r in inc.collect())
    full_rows = sorted(key(r) for r in full.collect())
    assert inc_rows == full_rows
    assert inc_rows  # planted near-dups must span the batch boundary

    # merged index == index built from the union (replay-idempotent)
    merged = merge_gram_index(idx, batch2)
    direct = gram_index(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    twice = merge_gram_index(merged, batch2)
    assert sorted(map(tuple, twice.collect())) == sorted(
        map(tuple, merged.collect())
    )
