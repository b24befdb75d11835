"""Porter stemmer: canonical vectors, rule-table invariants, and
three-engine parity (Python reference vs Catalyst vs DuckDB)."""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from github_data_pipeline_spark.functions import fulltext as FT
from github_data_pipeline_spark.functions.porter import (
    STEP2,
    STEP3,
    STEP4,
    porter_col,
    porter_py,
    porter_sql,
)

HYPO_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "0")) or 150

# Classic examples from the 1980 paper's per-step walkthroughs, plus
# the corpus-relevant inflections the registry queries rely on.
VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+ phase 2)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # multi-step chains
    "generalizations": "gener", "oscillators": "oscil",
    "relational": "relat", "rational": "ration", "valenci": "valenc",
    # corpus inflections used by doc_fulltext_porter
    "tables": "tabl", "table": "tabl", "joins": "join",
    "joining": "join", "streaming": "stream", "streams": "stream",
    # entry guard
    "a": "a", "ab": "ab", "is": "is", "": "",
}

EDGE_WORDS = [
    "ss", "yyy", "syzygy", "xyyy", "e", "oed", "eys", "dying", "dies",
    "ion", "sions", "ations", "big2", "4k", "x9ing", "authentication",
    "authorization", "dependencies", "configurations", "probability",
    "possibilities", "ll", "controll", "controlling", "roll", "rolls",
    # words containing the letter v — regression for the marker-
    # collision bug (a lowercase 'v' pattern marker misread the
    # consonant v as a vowel in the Spark/DuckDB renderings)
    "removal", "living", "leaves", "arrival", "division", "survival",
    "avoidance", "revival", "available", "vvv", "evolve", "velvety",
]


def test_canonical_vectors():
    for w, expect in VECTORS.items():
        assert porter_py(w) == expect, w


def test_rule_tables_ordered_longest_superstring_first():
    # The linear first-match scan reproduces Porter's dispatch only if
    # whenever suffix A is a proper suffix of B, B is listed first.
    for table in (STEP2, STEP3, STEP4):
        sufs = [s for s, _ in table]
        for i, a in enumerate(sufs):
            for b in sufs[i + 1 :]:
                assert not b.endswith(a) or a == b, (
                    f"{b!r} listed after its own suffix {a!r}"
                )


def _duck_stem(con: duckdb.DuckDBPyConnection, words: list[str]) -> list[str]:
    frag = porter_sql("t")
    out = []
    for w in words:
        (got,) = con.execute(
            f"SELECT list_extract(list_transform([?::VARCHAR], t -> {frag}), 1)",
            [w],
        ).fetchone()
        out.append(got)
    return out


@settings(max_examples=HYPO_EXAMPLES, deadline=None)
@given(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=14)
)
def test_duckdb_matches_python(word):
    con = duckdb.connect()
    assert _duck_stem(con, [word]) == [porter_py(word)], word


def test_duckdb_matches_python_edge_words():
    con = duckdb.connect()
    words = list(VECTORS) + EDGE_WORDS
    assert _duck_stem(con, words) == [porter_py(w) for w in words]


def test_spark_matches_python(spark):
    words = list(VECTORS) + EDGE_WORDS
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = [
        r.s for r in df.select(porter_col(F.col("w")).alias("s")).collect()
    ]
    assert got == [porter_py(w) for w in words]
    # the real usage shape: inside a higher-order transform
    arr = spark.createDataFrame([(words,)], ["toks"])
    (row,) = arr.select(F.transform("toks", porter_col).alias("s")).collect()
    assert row.s == [porter_py(w) for w in words]


def test_spark_matches_python_on_corpus_tokens(spark, sf_dir):
    # every distinct analyzed token of the real documents table
    from github_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(FT.analyze("text", mode="standard")).alias("t")
        )
        .distinct()
        .select("t", porter_col(F.col("t")).alias("s"))
        .collect()
    )
    assert len(toks) > 0
    for r in toks:
        assert r.s == porter_py(r.t), r.t


def test_analyze_modes_differ_as_specified():
    s = "The joins are streaming tables quickly"
    std = FT.analyze_py(s, mode="standard")
    light = FT.analyze_py(s, mode="light_en")
    porter = FT.analyze_py(s, mode="porter")
    # "the" is a stopword; "are" is not in EN_STOPWORDS
    assert std == ["joins", "are", "streaming", "tables", "quickly"]
    assert light == ["join", "are", "stream", "tabl", "quickly"]
    assert porter == ["join", "ar", "stream", "tabl", "quickli"]
    with pytest.raises(ValueError):
        FT.analyze_py(s, mode="nope")


def test_porter_index_path_matches_scan_path(spark, sf_dir):
    # the persisted inverted index honors the analyzer mode end-to-end
    from github_data_pipeline_spark.operators import fulltext as ft
    from github_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    query = "spark joins streaming tables"
    table = "t_fulltext_porter_idx_test"
    try:
        ft.build_text_index(docs, table, buckets=8, mode="porter")
        scan = ft.bm25_scan_topk(docs, query, k=25, mode="porter").collect()
        idx = ft.bm25_index_topk(
            spark, table, query, k=25, mode="porter"
        ).collect()
        assert [(r.doc_id, r.score, r.matched_terms) for r in scan] == [
            (r.doc_id, r.score, r.matched_terms) for r in idx
        ]
        assert scan  # non-vacuous
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}_stats")


def test_porter_registry_entry_plan_and_recall(spark, sf_dir):
    from github_data_pipeline_spark.plans import all_plans

    plans = all_plans()
    porter_df = plans["doc_fulltext_porter"].builder(spark, sf_dir)
    plan = porter_df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Catalyst, no Python UDF
    assert "TakeOrderedAndProject" in plan
    porter_rows = porter_df.collect()
    std_rows = plans["doc_fulltext_standard"].builder(spark, sf_dir).collect()
    assert porter_rows and std_rows
    # the stemmed analyzer must reach strictly more query terms on the
    # base-form corpus than the faithful standard analyzer
    assert max(r.matched_terms for r in porter_rows) > max(
        r.matched_terms for r in std_rows
    )


@settings(max_examples=HYPO_EXAMPLES, deadline=None)
@given(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=14)
)
def test_prefix_invariant(word):
    """Porter rewrites only suffixes: output[:2] is a prefix of the
    input, except a trailing y -> i landing at index 1 ("ays" ->
    "ai").  The analyze(guard_terms=...) fast path rests on exactly
    this (also verified exhaustively for all words up to length 4)."""
    out = porter_py(word)
    p = out[:2]
    assert word.startswith(p) or (
        len(p) == 2
        and p[1] == "i"
        and word[:1] == p[0]
        and word[1:2] == "y"
    ), (word, out)
