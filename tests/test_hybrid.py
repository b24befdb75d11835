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
    # doc 1: strong lexical AND vector match -> points from both lists
    docs = pd.DataFrame(
        [
            (0, "nothing relevant here", "en", "s", 21),
            (1, "spark joins streaming tables spark joins", "en", "s", 40),
            (2, "spark tables", "en", "s", 12),
            (3, "unrelated filler text", "en", "s", 21),
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    emb = pd.DataFrame(
        [
            (0, [1.0, 0.0], 0),  # the query vector
            (1, [0.9, 0.1], 0),  # closest -> vec_rank 1
            (2, [0.0, 1.0], 0),  # orthogonal -> last
            (3, [0.5, 0.5], 0),  # middle -> vec_rank 2
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
    # with 3 candidates, every vector lands in the top-20 list: doc 2
    # is the orthogonal one (vec_rank 3) but also a lexical hit;
    # doc 3 has no query terms, so its points are vector-only
    assert by_doc[2][1] > 0 and by_doc[2][2] == 3
    assert by_doc[3][2] == 2 and by_doc[3][1] == 0
    # fused order: overlapping doc first
    assert got[0][0] == 1
