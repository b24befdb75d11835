"""Simplified English full-text analysis, one spec — three engines.

The reference indexes ``title``/``body`` through Elasticsearch's
``english`` analyzer (reference ``src/indexing/schema.py:13-20``) and
every ES ``match`` query ranks hits with BM25 (Lucene's default
similarity).  SURVEY §1.2 mapped the analyzer to ``lower()`` +
``contains`` and VERDICT r01 flagged the residual: no stemming and no
token-position semantics.  This module closes it with a deterministic,
intentionally small analysis chain defined ONCE as data
(:data:`STEM_RULES`) and rendered three ways:

* :func:`analyze`      — Spark ``Column`` (pure Catalyst higher-order
  functions; no Python in the hot path, codegen-friendly);
* :func:`analyze_sql`  — DuckDB SQL fragment for the driver oracle;
* :func:`analyze_py`   — plain Python, for analyzing query strings on
  the driver and for cross-implementation tests.

Chain (Elasticsearch ``english``-analyzer order): lowercase → split on
non-alphanumerics → drop empty tokens → drop stopwords → light suffix
stemming.  The stemmer is NOT Porter — it is a first-match-wins rule
list (plural / participle / final-e stripping) chosen to be exactly
re-implementable in all three engines; ``tests/test_fulltext.py``
cross-checks the implementations property-style.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import EN_STOPWORDS

TOKEN_PATTERN = "[^a-z0-9]+"

# (suffix, replacement, min_token_len, excluded_suffixes) — applied
# first-match-only, in order. min_token_len guards short tokens
# ("is", "ties") from over-stripping; the "ss" exclusion keeps
# "class"/"dress" plurals from losing their stem consonant.
STEM_RULES: tuple[tuple[str, str, int, tuple[str, ...]], ...] = (
    ("ies", "y", 5, ()),
    ("ing", "", 6, ()),
    ("ed", "", 5, ()),
    ("es", "", 5, ()),
    ("s", "", 4, ("ss",)),
    ("e", "", 5, ()),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- Python ----------------------------------------------------------------


def stem_py(t: str) -> str:
    for suf, repl, min_len, excl in STEM_RULES:
        if (
            len(t) >= min_len
            and t.endswith(suf)
            and not any(t.endswith(e) for e in excl)
        ):
            return t[: len(t) - len(suf)] + repl
    return t


def analyze_py(s: str) -> list[str]:
    toks = [t for t in re.split(TOKEN_PATTERN, s.lower()) if t]
    return [stem_py(t) for t in toks if t not in EN_STOPWORDS]


# -- Spark -----------------------------------------------------------------


def stem_col(t: Column) -> Column:
    out = None
    for suf, repl, min_len, excl in STEM_RULES:
        cond = (F.length(t) >= F.lit(min_len)) & t.endswith(F.lit(suf))
        for e in excl:
            cond = cond & ~t.endswith(F.lit(e))
        stemmed = F.regexp_replace(t, suf + "$", repl)
        out = F.when(cond, stemmed) if out is None else out.when(cond, stemmed)
    return out.otherwise(t)


def analyze(c: Column | str) -> Column:
    """Analyzed token array — pure Catalyst, first-match-wins stemming."""
    stopset = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = F.split(F.lower(_col(c)), TOKEN_PATTERN)
    kept = F.filter(
        toks,
        lambda t: (t != F.lit("")) & ~F.array_contains(stopset, t),
    )
    return F.transform(kept, stem_col)


# -- DuckDB ----------------------------------------------------------------


def _stem_sql_case() -> str:
    whens = []
    for suf, repl, min_len, excl in STEM_RULES:
        cond = f"length(t) >= {min_len} AND t LIKE '%{suf}'"
        for e in excl:
            cond += f" AND t NOT LIKE '%{e}'"
        whens.append(f"WHEN {cond} THEN regexp_replace(t, '{suf}$', '{repl}')")
    return "CASE " + " ".join(whens) + " ELSE t END"


def analyze_sql(expr: str) -> str:
    """DuckDB fragment computing the same analyzed token list."""
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        "list_transform("
        "list_filter("
        f"string_split_regex(lower({expr}), '{TOKEN_PATTERN}'), "
        f"t -> t <> '' AND NOT list_contains([{stops}], t)), "
        f"t -> {_stem_sql_case()})"
    )
