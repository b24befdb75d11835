"""Registry entry for BM25 ranked search + positional phrase match.

Covers the reference's Elasticsearch ``match`` / ``match_phrase``
query surface (reference ``src/indexing/schema.py:13-20`` declares the
``english`` analyzer; ES ranks matches with Lucene BM25) — the one
SURVEY §1.2 residual VERDICT r01 flagged ("no stemming/token-position
semantics").

Oracle parity notes: the DuckDB SQL mirrors the Spark expression tree
shape (same association order, casts, and Lucene idf form) so both
engines produce bit-identical doubles before the shared ROUND(,4);
ordering and the top-k boundary are deterministic because both sides
rank by the ROUNDED score with doc_id as tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.fulltext import analyze_sql
from ..operators.fulltext import K1, B, bm25_scan_topk, query_terms
from ..sources.tables import load_table, spread
from .core import REGISTRY

QUERY = "spark joins streaming tables"
PHRASE = "join stream"
TOP_K = 15

_TERMS = query_terms(QUERY)
_PTERMS = query_terms(PHRASE)
_PHRASE_STR = " ".join(_PTERMS)
_PN = len(_PTERMS)


def _tf_sql(i: int, term: str) -> str:
    return f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"


def _contrib_sql(i: int) -> str:
    # Mirrors operators/fulltext._bm25_sum association order exactly:
    # idf * tf * (k1+1) / (tf + k1 * ((1-b) + b*dl/avgdl))
    idf = (
        f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
    )
    norm = (
        f"{1.0 - B} + {B} * CAST(dl AS DOUBLE)"
        f" / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    )
    return (
        f"{idf} * CAST(tf_{i} AS DOUBLE) * {K1 + 1.0}"
        f" / (CAST(tf_{i} AS DOUBLE) + {K1} * ({norm}))"
    )


_SCORE_SQL = "0.0 + " + " + ".join(_contrib_sql(i) for i in range(len(_TERMS)))
_MATCHED_SQL = " + ".join(
    f"CAST(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END AS BIGINT)"
    for i in range(len(_TERMS))
)
_PHRASE_SQL = (
    f"CASE WHEN len(toks) >= {_PN} THEN list_contains("
    f"list_transform(generate_series(1, len(toks) - {_PN - 1}), "
    f"i -> array_to_string(toks[i:i+{_PN - 1}], ' ')), '{_PHRASE_STR}') "
    "ELSE FALSE END"
)

_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {analyze_sql("text")} AS toks FROM documents
), per AS (
  SELECT doc_id, len(toks) AS dl,
    {", ".join(_tf_sql(i, t) for i, t in enumerate(_TERMS))},
    {_PHRASE_SQL} AS phrase_hit
  FROM base
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl,
    {", ".join(f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(_TERMS)))}
  FROM per
), scored AS (
  SELECT doc_id,
    ROUND({_SCORE_SQL}, 4) AS score,
    {_MATCHED_SQL} AS matched_terms,
    phrase_hit
  FROM per, stats
)
SELECT doc_id, score, matched_terms, phrase_hit
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {TOP_K}
"""


@REGISTRY.add(
    "doc_fulltext_search",
    _ORACLE,
    doc="BM25 ranked search (Lucene idf, k1=1.2 b=0.75) over a "
    "simplified english analyzer (lowercase/tokenize/stopword/light "
    "stem — functions/fulltext.py, one spec rendered for Spark, "
    "DuckDB, and Python) plus a match_phrase flag from adjacent-token "
    "n-grams, all in ONE corpus pass: per-doc term frequencies are "
    "map-side array ops (no explode), corpus stats (N, Σdl, per-term "
    "df) are a single-row aggregate attached by 1-row broadcast, "
    "scoring is pure expression, top-k is TakeOrderedAndProject. The "
    "persisted inverted-index variant (operators/fulltext."
    "bm25_index_topk, postings bucketed by term) is pinned equal in "
    "tests/test_fulltext.py. Covers the reference's ES match/"
    "match_phrase surface: indexing/schema.py:13-20.",
    tags=("text", "fulltext", "bm25"),
)
def doc_fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return bm25_scan_topk(docs, QUERY, TOP_K, phrase=PHRASE)
