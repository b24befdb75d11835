"""English full-text analysis, one spec — three engines, three modes.

The reference indexes ``title``/``body`` through Elasticsearch using
the ``text_en`` analyzer its schema declares (reference
``src/indexing/schema.py:13-20``): a **standard** analyzer with
English stopwords — tokenize, lowercase, drop stopwords, NO stemming.
Every ES ``match`` query then ranks hits with BM25 (Lucene's default
similarity).  Each analysis function here takes a ``mode``:

* ``"standard"`` — the faithful twin of the reference's declared
  analyzer: lowercase → split on non-alphanumerics → drop empties →
  drop stopwords.  (Known tokenizer difference, documented: ES's
  standard tokenizer keeps ``john's`` as one token; our
  ``[^a-z0-9]+`` split yields ``john``, ``s``.)
* ``"light_en"`` — the historical default: standard chain + a small
  first-match-wins suffix rule list (:data:`STEM_RULES`, plural /
  participle / final-e stripping), chosen to be exactly
  re-implementable in all three engines.
* ``"porter"`` — standard chain + the classic 1980 Porter stemmer
  (:mod:`.porter`), the enhanced-recall analyzer ES's ``english``
  analyzer family provides beyond the reference's declared mapping.

Each mode is rendered three ways:

* :func:`analyze`      — Spark ``Column`` (pure Catalyst higher-order
  functions; no Python in the hot path, codegen-friendly);
* :func:`analyze_sql`  — DuckDB SQL fragment for the driver oracle;
* :func:`analyze_py`   — plain Python, for analyzing query strings on
  the driver and for cross-implementation tests.

``tests/test_fulltext.py`` and ``tests/test_porter.py`` cross-check
the implementations property-style.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .porter import porter_col, porter_py, porter_sql
from .text import EN_STOPWORDS

TOKEN_PATTERN = "[^a-z0-9]+"

MODES = ("standard", "light_en", "porter")
DEFAULT_MODE = "light_en"


def _check_mode(mode: str) -> None:
    if mode not in MODES:
        raise ValueError(f"unknown analyzer mode {mode!r}; one of {MODES}")

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


def analyze_py(s: str, mode: str = DEFAULT_MODE) -> list[str]:
    _check_mode(mode)
    toks = [t for t in re.split(TOKEN_PATTERN, s.lower()) if t]
    kept = [t for t in toks if t not in EN_STOPWORDS]
    if mode == "standard":
        return kept
    stem = porter_py if mode == "porter" else stem_py
    return [stem(t) for t in kept]


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


def term_guard_prefixes(terms: list[str]) -> list[str]:
    """Candidate token prefixes for equality-vs-``terms`` consumers.

    Every Porter rewrite acts on a suffix, with exactly one way a
    character at index 1 can change: a trailing ``y -> i`` when the
    post-step-1a/b stem has length 2 ("ays" -> "ai").  Index 0 never
    changes and output length never exceeds input length, so
    ``porter(t) == term`` implies ``t`` starts with ``term[:2]`` or —
    when ``term[1] == 'i'`` — with ``term[0] + 'y'``.  Verified
    exhaustively for every [a-z0-9] word up to length 4 plus 500k
    random longer words, and pinned property-style
    (tests/test_porter.py::test_prefix_invariant)."""
    out: set[str] = set()
    for term in terms:
        out.add(term[:2])
        if len(term) >= 2 and term[1] == "i":
            out.add(term[0] + "y")
    return sorted(out)


def analyze(
    c: Column | str,
    mode: str = DEFAULT_MODE,
    guard_terms: list[str] | None = None,
) -> Column:
    """Memoizing wrapper around :func:`_analyze_build`.

    The porter tree is ~10k py4j round trips (~2 s) to construct and
    is a deterministic function of (column name, mode, guard terms) —
    cache the COLUMN TREE per process when the input is a plain
    column name (r12, guide §5.3; see functions/colcache.py: plan
    fragments only, never data).
    """
    if isinstance(c, str):
        from .colcache import memo_col

        key = (
            "fulltext.analyze",
            c,
            mode,
            None if guard_terms is None else tuple(guard_terms),
        )
        return memo_col(key, lambda: _analyze_build(c, mode, guard_terms))
    return _analyze_build(c, mode, guard_terms)


def _analyze_build(
    c: Column | str,
    mode: str = DEFAULT_MODE,
    guard_terms: list[str] | None = None,
) -> Column:
    """Analyzed token array — pure Catalyst in every mode.

    ``guard_terms`` (porter mode only) is a term-matching contract:
    the caller promises to use the array ONLY for equality against
    those terms, n-grams of them, and its size (tf / df / dl / phrase
    — exactly ``bm25_scan_topk``'s consumption).  Tokens that cannot
    stem to any guard term (first-two-chars test, see
    :func:`term_guard_prefixes`) then pass through UNSTEMMED: they
    compare unequal to every term either way, the array size is
    unchanged, and the ~1k-node Porter expression — interpreted
    per-element inside the higher-order ``transform``, the dominant
    cost of the porter scan — runs only on the few prefix-candidate
    tokens instead of every token of the corpus."""
    _check_mode(mode)
    stopset = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    toks = F.split(F.lower(_col(c)), TOKEN_PATTERN)
    kept = F.filter(
        toks,
        lambda t: (t != F.lit("")) & ~F.array_contains(stopset, t),
    )
    if mode == "standard":
        return kept
    if mode == "porter" and guard_terms is not None:
        prefixes = term_guard_prefixes(guard_terms)
        if not prefixes:
            return kept

        def guarded(t: Column) -> Column:
            cond = None
            for p in prefixes:
                hit = t.startswith(F.lit(p))
                cond = hit if cond is None else (cond | hit)
            return F.when(cond, porter_col(t)).otherwise(t)

        return F.transform(kept, guarded)
    return F.transform(kept, porter_col if mode == "porter" else stem_col)


# -- DuckDB ----------------------------------------------------------------


def _stem_sql_case() -> str:
    whens = []
    for suf, repl, min_len, excl in STEM_RULES:
        cond = f"length(t) >= {min_len} AND t LIKE '%{suf}'"
        for e in excl:
            cond += f" AND t NOT LIKE '%{e}'"
        whens.append(f"WHEN {cond} THEN regexp_replace(t, '{suf}$', '{repl}')")
    return "CASE " + " ".join(whens) + " ELSE t END"


def analyze_sql(expr: str, mode: str = DEFAULT_MODE) -> str:
    """DuckDB fragment computing the same analyzed token list."""
    _check_mode(mode)
    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    kept = (
        "list_filter("
        f"string_split_regex(lower({expr}), '{TOKEN_PATTERN}'), "
        f"t -> t <> '' AND NOT list_contains([{stops}], t))"
    )
    if mode == "standard":
        return kept
    body = porter_sql("t") if mode == "porter" else _stem_sql_case()
    return f"list_transform({kept}, t -> {body})"
