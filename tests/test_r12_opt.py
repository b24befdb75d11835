"""Round-12 optimization pins.

The funnel optimization let ``neardup_drop_stage`` read a
caller-materialized token-array column instead of re-tokenizing the
text; the two call forms must keep identical survivor sets (the
components-init optimization is pinned by tests/test_components.py's
union-find comparisons, which run the fused init on 30 random graphs
plus a 45-node path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.curation import neardup_drop_stage
from github_data_pipeline_spark.functions import text as T


def test_neardup_drop_stage_toks_col_parity(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "a completely different document about spark plans"),
            (4, "the quick brown fox jumps over the lazy dog tonight"),
            (5, "another unrelated text with its own words entirely"),
        ],
        "doc_id long, text string",
    )
    plain = {r["doc_id"] for r in neardup_drop_stage(docs).collect()}
    with_toks = {
        r["doc_id"]
        for r in neardup_drop_stage(
            docs.withColumn("toks", T.tokens("text")), toks_col="toks"
        ).collect()
    }
    assert plain == with_toks
    # the exact-duplicate pair 1/4 collapses to its smallest id (doc 2
    # differs in one token: 3-gram Jaccard 7/9 < 0.8, so it survives)
    assert plain == {1, 2, 3, 5}
