"""Full-text stack: analyzer parity across the three implementations,
BM25 against a hand-computed oracle, phrase positional semantics, and
the persisted inverted-index path matching the scan path."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from github_data_pipeline_spark.functions import fulltext as FT
from github_data_pipeline_spark.operators import fulltext as ft

# tools/property_gate.py raises this for the pre-release thorough pass
HYPO_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "0")) or 40

WORDS = st.sampled_from(
    "the a of and is spark join stream table tables joins streaming "
    "merges merged running classes dresses studies ties ss value x "
    "big2 4k".split()
)
TEXTS = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


# -- analyzer: one spec, three engines -------------------------------------


@settings(max_examples=HYPO_EXAMPLES, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_analyze_py_matches_duckdb(texts):
    import duckdb

    con = duckdb.connect()
    for t in texts:
        (got,) = con.execute(
            f"SELECT {FT.analyze_sql('?')}", [t]
        ).fetchone()
        assert got == FT.analyze_py(t), t


def test_analyze_spark_matches_py(spark):
    texts = [
        "Spark, JOIN!  stream--tables",
        "the a of and is it on",
        "studies classes dresses running merged ties ss",
        "",
        "  leading trailing  ",
        "UPPER lower MiXeD 123 4k",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(FT.analyze("text")).collect()]
    assert got == [FT.analyze_py(t) for t in texts]


def test_stem_rules_first_match_only():
    # "classes" must take the es-rule (-> "class"), never reach the
    # s-rule; "dress" keeps its double-s; final-e unifies table/tables.
    assert FT.stem_py("classes") == "class"
    assert FT.stem_py("dress") == "dress"
    assert FT.stem_py("tables") == "tabl" == FT.stem_py("table")
    assert FT.stem_py("studies") == "study"
    assert FT.stem_py("streaming") == "stream"
    assert FT.stem_py("is") == "is"  # too short for every rule


# -- BM25 vs a hand-computed oracle ----------------------------------------


def _bm25(tf, df, n_docs, dl, avgdl, k1=ft.K1, b=ft.B):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_scan_matches_hand_computation(spark):
    corpus = [
        (1, "spark join join table"),
        (2, "spark stream"),
        (3, "filter sort window"),
        (4, "join"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r.doc_id: (r.score, r.matched_terms)
        for r in ft.bm25_scan_topk(docs, "spark joins", k=10).collect()
    }
    # analyzed docs: all terms survive (no stopwords), no stems change
    # except none apply; dl = token counts; N=4, avgdl=10/4
    dls = {1: 4, 2: 2, 3: 3, 4: 1}
    avgdl = sum(dls.values()) / 4
    tf_spark = {1: 1, 2: 1}
    tf_join = {1: 2, 4: 1}
    expect = {}
    for d in (1, 2, 4):
        s = _bm25(tf_spark.get(d, 0), 2, 4, dls[d], avgdl) if d in tf_spark else 0.0
        s += _bm25(tf_join.get(d, 0), 2, 4, dls[d], avgdl) if d in tf_join else 0.0
        expect[d] = (
            round(s, 4),
            int(d in tf_spark) + int(d in tf_join),
        )
    assert got == {d: v for d, v in expect.items() if v[0] > 0}
    # doc 3 matches nothing -> filtered out
    assert 3 not in got


def test_bm25_rank_order_sane(spark):
    # higher tf of a rarer term must outrank a common-term-only doc
    docs = spark.createDataFrame(
        [(i, "join join join") for i in range(1, 9)]
        + [(9, "spark join"), (10, "spark spark unrelated")],
        ["doc_id", "text"],
    )
    rows = ft.bm25_scan_topk(docs, "spark", k=3).collect()
    assert [r.doc_id for r in rows][:2] == [10, 9]


# -- phrase (token-position) semantics -------------------------------------


def test_phrase_hit_requires_adjacency(spark):
    docs = spark.createDataFrame(
        [
            (1, "the join stream runs"),  # hit ("the" is a stopword)
            (2, "join the big stream"),  # NOT adjacent after analysis? ...
            (3, "joining stream"),  # "joining"->"join" stem: hit
            (4, "stream join"),  # wrong order
            (5, "join"),  # shorter than phrase
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.hit
        for r in docs.select(
            "doc_id",
            ft.phrase_hit(FT.analyze("text"), ["join", "stream"]).alias("hit"),
        ).collect()
    }
    # doc 2: stopword removal makes toks [join, big, stream] — NOT
    # adjacent, must not match (this is what substring matching over
    # the raw text would get wrong in the other direction).
    assert got == {1: True, 2: False, 3: True, 4: False, 5: False, 6: False}


def test_phrase_hit_single_term_and_empty(spark):
    docs = spark.createDataFrame([(1, "spark x"), (2, "y")], ["doc_id", "text"])
    toks = FT.analyze("text")
    got = {
        r.doc_id: (r.one, r.zero)
        for r in docs.select(
            "doc_id",
            ft.phrase_hit(toks, ["spark"]).alias("one"),
            ft.phrase_hit(toks, []).alias("zero"),
        ).collect()
    }
    assert got == {1: (True, False), 2: (False, False)}


# -- persisted inverted index ==========================================


def test_index_path_matches_scan_path(spark, sf_dir):
    from github_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    query = "spark joins streaming tables"
    table = "t_fulltext_idx_test"
    try:
        ft.build_text_index(docs, table, buckets=8)
        scan = ft.bm25_scan_topk(docs, query, k=25).collect()
        idx = ft.bm25_index_topk(spark, table, query, k=25).collect()
        assert [
            (r.doc_id, r.score, r.matched_terms) for r in scan
        ] == [(r.doc_id, r.score, r.matched_terms) for r in idx]
        # the index path must not touch the documents table, and the
        # posting lookup must prune on the analyzed query terms
        plan = ft.bm25_index_topk(
            spark, table, query, k=25
        )._jdf.queryExecution().executedPlan().toString()
        assert "documents" not in plan
        assert "tabl" in plan  # analyzed (stemmed) term reached the filter
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_stats")


def test_registry_query_plan_is_jvm_only(spark, sf_dir):
    from github_data_pipeline_spark.plans import all_plans

    q = all_plans()["doc_fulltext_search"]
    df = q.builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Catalyst
    assert "TakeOrderedAndProject" in plan  # top-k, not sort-all
    rows = df.collect()
    assert 0 < len(rows) <= 15
    assert any(r.phrase_hit for r in rows)  # non-vacuous phrase flag


def test_guarded_analyze_term_contract(spark):
    """The guard_terms fast path must be observation-equivalent to the
    full porter analyzer for every contracted consumption: size (dl),
    equality against the terms (tf/df), and term n-grams (phrase)."""
    from github_data_pipeline_spark.functions.fulltext import (
        term_guard_prefixes,
    )

    texts = [
        "joins and joined tables keep joining streams",
        "the ays pony ponies cried crying cries",
        "plays played playing stays stayed ays eys",
        "completely unrelated words here zebra quartz",
        "",
    ]
    terms = ["join", "stream", "poni", "ai"]  # note 'ai' <- 'ays'
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    full = df.select(
        "doc_id", FT.analyze("text", "porter").alias("toks")
    )
    guarded = df.select(
        "doc_id",
        FT.analyze("text", "porter", guard_terms=terms).alias("toks"),
    )

    def _eq(term):
        # 1-arg lambda: F.filter reads a 2-arg function as (elem, idx)
        return lambda t: t == F.lit(term)

    def observe(frame):
        cols = [F.col("doc_id"), F.size("toks").alias("dl")]
        for i, term in enumerate(terms):
            cols.append(
                F.size(F.filter(F.col("toks"), _eq(term))).alias(f"tf_{i}")
            )
        return {r.doc_id: r.asDict() for r in frame.select(*cols).collect()}

    assert observe(full) == observe(guarded)
    # the y->i widening is present in the prefix set
    assert "ay" in term_guard_prefixes(["ai"])
    assert term_guard_prefixes([]) == []
