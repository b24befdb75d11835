"""Hybrid Borda fusion (plans/hybrid_plans.py): hand-checked ranks on
a corpus where the lexical and vector lists OVERLAP (the fixture's
random embeddings never overlap, so the sum branch needs this)."""

from __future__ import annotations

import duckdb
import pandas as pd


def test_fusion_sums_overlapping_ranks(spark):
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans import hybrid_plans as hp

    reg = all_plans()
    # candidate ids live on the corpus slice (doc_id % SLICE_MOD ==
    # SLICE_REM); doc 1: strong lexical AND vector match -> points
    # from both lists
    docs = pd.DataFrame(
        [
            (0, "nothing relevant here", "en", "s", 21),
            (1, "spark joins streaming tables spark joins", "en", "s", 40),
            (26, "spark tables", "en", "s", 12),
            (51, "unrelated filler text", "en", "s", 21),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    emb = pd.DataFrame(
        [
            (0, [1.0, 0.0], 0),  # the query vector
            (1, [0.9, 0.1], 0),  # closest -> vec_rank 1
            (26, [0.0, 1.0], 0),  # orthogonal -> last
            (51, [0.5, 0.5], 0),  # middle -> vec_rank 2
        ],
        columns=["vec_id", "embedding", "label"],
    )
    sdf = {
        "documents": spark.createDataFrame(docs),
        "embeddings": spark.createDataFrame(emb),
    }
    orig = hp.load_table
    hp.load_table = lambda _s, _d, t: sdf[t]
    try:
        got = [
            tuple(r)
            for r in reg["doc_hybrid_retrieval"].builder(spark, "x").collect()
        ]
    finally:
        hp.load_table = orig

    con = duckdb.connect()
    con.register("documents", docs)
    con.register("embeddings", emb)
    want = [
        tuple(r)
        for r in con.execute(reg["doc_hybrid_retrieval"].oracle).fetchall()
    ]
    con.close()
    assert got == want
    by_doc = {r[0]: r for r in got}
    # doc 1: lex_rank 1 (most query-term hits) AND vec_rank 1 -> 40
    assert by_doc[1] == (1, 1, 1, 40)
    # with 3 candidates, every vector lands in the top-20 list: doc 26
    # is the orthogonal one (vec_rank 3) but also a lexical hit;
    # doc 51 has no query terms, so its points are vector-only
    assert by_doc[26][1] > 0 and by_doc[26][2] == 3
    assert by_doc[51][2] == 2 and by_doc[51][1] == 0
    # fused order: overlapping doc first
    assert got[0][0] == 1


def test_oracle_slice_overlap_nonvacuous(spark, sf_dir):
    """The REAL fixture run (the same corpus the driver oracles at
    sf0.01) must exercise the both-lists Borda sum branch: the corpus
    slice is sized so the vector top-K covers it, hence every lexical
    hit appears in both ranked lists. If regenerated testdata ever
    breaks this, the branch goes vacuous again — fail loudly here."""
    from github_data_pipeline_spark.plans import all_plans

    reg = all_plans()
    rows = reg["doc_hybrid_overlap_slice"].builder(spark, sf_dir).collect()
    both = [r for r in rows if r["lex_rank"] > 0 and r["vec_rank"] > 0]
    assert len(both) >= 1, "overlap branch vacuous on fixture data"


def test_capability_entry_is_whole_corpus(spark, sf_dir):
    """doc_hybrid_retrieval must fuse over the WHOLE embedded corpus
    (r7 ADVICE: no silent slice in the capability entry): its vector
    list may contain doc_ids off the overlap slice."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans import hybrid_plans as hp

    reg = all_plans()
    rows = reg["doc_hybrid_retrieval"].builder(spark, sf_dir).collect()
    off_slice = [
        r
        for r in rows
        if r["doc_id"] % hp.SLICE_MOD != hp.SLICE_REM
    ]
    assert off_slice, "capability entry is slice-restricted again"
