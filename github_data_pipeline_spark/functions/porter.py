"""Porter stemmer (classic 1980 algorithm) — one spec, three engines.

The reference's full-text fields are analyzed by Elasticsearch
(reference ``src/indexing/schema.py:13-20``).  The schema there
declares a *standard* analyzer with English stopwords (no stemming) —
``functions/fulltext.py`` mode ``"standard"`` is the faithful twin.
This module supplies the *enhanced-recall* analyzer ES users reach for
next (the ``english`` analyzer's stemmer): Martin Porter's 1980
suffix-stripping algorithm, rendered three ways off ONE rule spec:

* :func:`porter_py`  — plain Python, the reference implementation the
  other two are property-tested against (``tests/test_porter.py``);
* :func:`porter_col` — a Spark ``Column`` function usable inside
  ``F.transform`` over a token array (pure Catalyst, no Python UDF);
* :func:`porter_sql` — a DuckDB SQL fragment for the driver oracle.

Engine-parity techniques worth naming:

**Additive expression binding.**  Porter is 8 sequential steps, each
referencing its input many times.  Naively substituting the previous
step's expression everywhere multiplies tree size per step
(~30x per step -> 30^8 nodes).  Both non-Python renderings instead
bind each intermediate once as a single-element-array lambda variable
(``element_at(transform(array(x), w -> step(w)), 1)`` in Spark,
``list_extract(list_transform([x], w -> step(w)), 1)`` in DuckDB), so
the total tree grows additively (~1k nodes).

**Regex-derived consonant/vowel pattern.**  The measure ``m`` (number
of VC sequences), ``*v*``, ``*o`` and ``*d`` conditions all derive
from the word's c/v pattern.  Porter's ``y`` rule (vowel iff preceded
by a consonant, consonant at position 0) is rendered in the two
regex-based engines (Spark, DuckDB) as three sequential
non-overlapping replaces: ``[aeiou] -> V``, then ``([^V])y -> $1V``,
then ``[^V] -> C``; ``m`` is then the count of non-overlapping
``"VC"`` occurrences.  Those markers are UPPERCASE precisely because
they must sit outside the token alphabet ``[a-z0-9]`` — a lowercase
``v`` marker would collide with the consonant letter v in the input
("removal", "living") and misclassify it as a vowel.  The Python
reference builds the pattern with a positional loop (no marker
aliasing possible) and is the arbiter the regex renderings are
property-tested against.  Digits pattern as consonants in every
engine.

One deliberate simplification, shared by all three renderings and
documented here: the double-consonant test ``*d`` is "last two chars
equal and not a vowel letter", which treats a double ``y`` as a double
consonant regardless of what precedes it.  Canonical Porter
disambiguates by position; the cases diverge only for words ending
``...Vyy + ed/ing``, which do not occur in English.

Words of length <= 2 are returned unchanged (the algorithm's entry
guard), checked against the ORIGINAL token, not intermediates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VOWELS = "aeiou"

# Step 2/3/4 suffix maps, first-match-wins.  Ordering invariant
# (pinned by tests): whenever suffix A is a proper suffix of B, B
# comes first (ational < tional, ization < ation, ement < ment < ent),
# so linear first-match scanning reproduces Porter's
# penultimate-letter dispatch exactly.
STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
STEP4 = (
    ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
    ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""), ("ment", ""),
    ("ent", ""), ("ion", ""), ("ou", ""), ("ism", ""), ("ate", ""),
    ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
)


# -- Python (reference implementation) -------------------------------------


def _pat(w: str) -> str:
    out: list[str] = []
    for i, ch in enumerate(w):
        if ch in VOWELS:
            out.append("v")
        elif ch == "y" and i > 0 and out[i - 1] == "c":
            out.append("v")
        else:
            out.append("c")
    return "".join(out)


def _m(w: str) -> int:
    return _pat(w).count("vc")


def _has_vowel(w: str) -> bool:
    return "v" in _pat(w)


def _doublec(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and w[-1] not in VOWELS


def _cvc_o(w: str) -> bool:
    return _pat(w).endswith("cvc") and w[-1] not in "wxy"


def _py_1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-4] + "ss"
    if w.endswith("ies"):
        return w[:-3] + "i"
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _py_phase2(v: str) -> str:
    if v.endswith(("at", "bl", "iz")):
        return v + "e"
    if _doublec(v) and v[-1] not in "lsz":
        return v[:-1]
    if _m(v) == 1 and _cvc_o(v):
        return v + "e"
    return v


def _py_1b(w: str) -> str:
    if w.endswith("eed"):
        return w[:-1] if _m(w[:-3]) > 0 else w
    if w.endswith("ed"):
        return _py_phase2(w[:-2]) if _has_vowel(w[:-2]) else w
    if w.endswith("ing"):
        return _py_phase2(w[:-3]) if _has_vowel(w[:-3]) else w
    return w


def _py_1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


def _py_rules(
    w: str, rules, min_m: int, *, ion_st: bool = False
) -> str:
    for suf, repl in rules:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            ok = _m(stem) > min_m
            if ok and ion_st and suf == "ion":
                ok = stem[-1:] in ("s", "t")
            return stem + repl if ok else w
    return w


def _py_5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _m(stem)
        if m > 1 or (m == 1 and not _cvc_o(stem)):
            return stem
    return w


def _py_5b(w: str) -> str:
    if w.endswith("l") and _doublec(w) and _m(w) > 1:
        return w[:-1]
    return w


def porter_py(word: str) -> str:
    """Stem one lowercase token (classic Porter 1980)."""
    if len(word) <= 2:
        return word
    w = _py_1a(word)
    w = _py_1b(w)
    w = _py_1c(w)
    w = _py_rules(w, STEP2, 0)
    w = _py_rules(w, STEP3, 0)
    w = _py_rules(w, STEP4, 1, ion_st=True)
    w = _py_5a(w)
    w = _py_5b(w)
    return w


# -- Spark (pure Catalyst) --------------------------------------------------


def _bind(col: Column, fn) -> Column:
    """Bind ``col`` once as a lambda variable (additive tree growth)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _chop(c: Column, n: int) -> Column:
    return c.substr(F.lit(1), F.length(c) - F.lit(n))


def _pat_c(c: Column) -> Column:
    # markers 'V'/'C' are OUTSIDE the token alphabet [a-z0-9]: using
    # lowercase 'v' would collide with the consonant letter v in the
    # input ("removal" -> pattern treats v as a vowel)
    p = F.regexp_replace(c, "[aeiou]", "V")
    p = F.regexp_replace(p, "([^V])y", "$1V")
    return F.regexp_replace(p, "[^V]", "C")


def _m_c(c: Column) -> Column:
    return F.regexp_count(_pat_c(c), F.lit("VC"))


def _has_vowel_c(c: Column) -> Column:
    return _pat_c(c).contains("V")


def _last_c(c: Column) -> Column:
    return F.substring(c, -1, 1)


def _last2_c(c: Column) -> Column:
    return F.substring(c, -2, 1)


def _doublec_c(c: Column) -> Column:
    return (
        (F.length(c) >= 2)
        & (_last_c(c) == _last2_c(c))
        & ~_last_c(c).isin(*VOWELS)
    )


def _cvc_o_c(c: Column) -> Column:
    return _pat_c(c).endswith("CVC") & ~_last_c(c).isin("w", "x", "y")


def _c_1a(w: Column) -> Column:
    return (
        F.when(w.endswith("sses"), F.concat(_chop(w, 4), F.lit("ss")))
        .when(w.endswith("ies"), F.concat(_chop(w, 3), F.lit("i")))
        .when(w.endswith("ss"), w)
        .when(w.endswith("s"), _chop(w, 1))
        .otherwise(w)
    )


def _c_phase2(v: Column) -> Column:
    return (
        F.when(
            v.endswith("at") | v.endswith("bl") | v.endswith("iz"),
            F.concat(v, F.lit("e")),
        )
        .when(_doublec_c(v) & ~_last_c(v).isin("l", "s", "z"), _chop(v, 1))
        .when((_m_c(v) == 1) & _cvc_o_c(v), F.concat(v, F.lit("e")))
        .otherwise(v)
    )


def _c_1b(w: Column) -> Column:
    ed2 = _chop(w, 2)
    ing2 = _chop(w, 3)
    return (
        F.when(
            w.endswith("eed"),
            F.when(_m_c(_chop(w, 3)) > 0, _chop(w, 1)).otherwise(w),
        )
        .when(
            w.endswith("ed"),
            F.when(_has_vowel_c(ed2), _bind(ed2, _c_phase2)).otherwise(w),
        )
        .when(
            w.endswith("ing"),
            F.when(_has_vowel_c(ing2), _bind(ing2, _c_phase2)).otherwise(w),
        )
        .otherwise(w)
    )


def _c_1c(w: Column) -> Column:
    stem = _chop(w, 1)
    return F.when(
        w.endswith("y") & _has_vowel_c(stem), F.concat(stem, F.lit("i"))
    ).otherwise(w)


def _c_rules(w: Column, rules, min_m: int, *, ion_st: bool = False) -> Column:
    out = None
    for suf, repl in rules:
        stem = _chop(w, len(suf))
        cond = _m_c(stem) > min_m
        if ion_st and suf == "ion":
            cond = cond & _last_c(stem).isin("s", "t")
        new = F.concat(stem, F.lit(repl)) if repl else stem
        val = F.when(cond, new).otherwise(w)
        out = (
            F.when(w.endswith(suf), val)
            if out is None
            else out.when(w.endswith(suf), val)
        )
    return out.otherwise(w)


def _c_5a(w: Column) -> Column:
    stem = _chop(w, 1)
    m = _m_c(stem)
    return F.when(
        w.endswith("e"),
        F.when((m > 1) | ((m == 1) & ~_cvc_o_c(stem)), stem).otherwise(w),
    ).otherwise(w)


def _c_5b(w: Column) -> Column:
    return F.when(
        w.endswith("l") & _doublec_c(w) & (_m_c(w) > 1), _chop(w, 1)
    ).otherwise(w)


_C_STEPS = (
    _c_1a,
    _c_1b,
    _c_1c,
    lambda w: _c_rules(w, STEP2, 0),
    lambda w: _c_rules(w, STEP3, 0),
    lambda w: _c_rules(w, STEP4, 1, ion_st=True),
    _c_5a,
    _c_5b,
)


def porter_col(t: Column) -> Column:
    """Stem one token Column — composable inside ``F.transform``."""
    w = t
    for step in _C_STEPS:
        w = _bind(w, step)
    return F.when(F.length(t) <= 2, t).otherwise(w)


# -- DuckDB (oracle SQL text) ----------------------------------------------


def _pat_s(e: str) -> str:
    # markers 'V'/'C' sit outside [a-z0-9] — see _pat_c
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        + e
        + r", '[aeiou]', 'V', 'g'), '([^V])y', '\1V', 'g'), '[^V]', 'C', 'g')"
    )


def _m_s(e: str) -> str:
    return f"len(regexp_extract_all({_pat_s(e)}, 'VC'))"


def _has_vowel_s(e: str) -> str:
    return f"contains({_pat_s(e)}, 'V')"


def _chop_s(e: str, n: int) -> str:
    return f"substr({e}, 1, greatest(length({e}) - {n}, 0))"


def _last_s(e: str) -> str:
    return f"substr({e}, length({e}), 1)"


def _last2_s(e: str) -> str:
    return f"substr({e}, length({e}) - 1, 1)"


def _doublec_s(e: str) -> str:
    return (
        f"(length({e}) >= 2 AND {_last_s(e)} = {_last2_s(e)}"
        f" AND {_last_s(e)} NOT IN ('a','e','i','o','u'))"
    )


def _cvc_o_s(e: str) -> str:
    return (
        f"(suffix({_pat_s(e)}, 'CVC')"
        f" AND {_last_s(e)} NOT IN ('w','x','y'))"
    )


class _Gensym:
    def __init__(self) -> None:
        self.n = 0

    def var(self) -> str:
        self.n += 1
        return f"pw{self.n}"


def _bind_s(e: str, fn, g: _Gensym) -> str:
    v = g.var()
    return f"list_extract(list_transform([{e}], {v} -> {fn(v, g)}), 1)"


def _s_1a(w: str, g: _Gensym) -> str:
    return (
        f"CASE WHEN suffix({w}, 'sses') THEN {_chop_s(w, 4)} || 'ss'"
        f" WHEN suffix({w}, 'ies') THEN {_chop_s(w, 3)} || 'i'"
        f" WHEN suffix({w}, 'ss') THEN {w}"
        f" WHEN suffix({w}, 's') THEN {_chop_s(w, 1)}"
        f" ELSE {w} END"
    )


def _s_phase2(v: str, g: _Gensym) -> str:
    return (
        f"CASE WHEN suffix({v}, 'at') OR suffix({v}, 'bl')"
        f" OR suffix({v}, 'iz') THEN {v} || 'e'"
        f" WHEN {_doublec_s(v)} AND {_last_s(v)} NOT IN ('l','s','z')"
        f" THEN {_chop_s(v, 1)}"
        f" WHEN {_m_s(v)} = 1 AND {_cvc_o_s(v)} THEN {v} || 'e'"
        f" ELSE {v} END"
    )


def _s_1b(w: str, g: _Gensym) -> str:
    ed2 = _chop_s(w, 2)
    ing2 = _chop_s(w, 3)
    return (
        f"CASE WHEN suffix({w}, 'eed') THEN"
        f" CASE WHEN {_m_s(_chop_s(w, 3))} > 0 THEN {_chop_s(w, 1)}"
        f" ELSE {w} END"
        f" WHEN suffix({w}, 'ed') THEN"
        f" CASE WHEN {_has_vowel_s(ed2)} THEN {_bind_s(ed2, _s_phase2, g)}"
        f" ELSE {w} END"
        f" WHEN suffix({w}, 'ing') THEN"
        f" CASE WHEN {_has_vowel_s(ing2)} THEN {_bind_s(ing2, _s_phase2, g)}"
        f" ELSE {w} END"
        f" ELSE {w} END"
    )


def _s_1c(w: str, g: _Gensym) -> str:
    stem = _chop_s(w, 1)
    return (
        f"CASE WHEN suffix({w}, 'y') AND {_has_vowel_s(stem)}"
        f" THEN {stem} || 'i' ELSE {w} END"
    )


def _s_rules(rules, min_m: int, *, ion_st: bool = False):
    def render(w: str, g: _Gensym) -> str:
        whens = []
        for suf, repl in rules:
            stem = _chop_s(w, len(suf))
            cond = f"{_m_s(stem)} > {min_m}"
            if ion_st and suf == "ion":
                cond += f" AND {_last_s(stem)} IN ('s','t')"
            new = f"{stem} || '{repl}'" if repl else stem
            whens.append(
                f"WHEN suffix({w}, '{suf}') THEN"
                f" CASE WHEN {cond} THEN {new} ELSE {w} END"
            )
        return "CASE " + " ".join(whens) + f" ELSE {w} END"

    return render


def _s_5a(w: str, g: _Gensym) -> str:
    stem = _chop_s(w, 1)
    m = _m_s(stem)
    return (
        f"CASE WHEN suffix({w}, 'e') THEN"
        f" CASE WHEN {m} > 1 OR ({m} = 1 AND NOT {_cvc_o_s(stem)})"
        f" THEN {stem} ELSE {w} END"
        f" ELSE {w} END"
    )


def _s_5b(w: str, g: _Gensym) -> str:
    return (
        f"CASE WHEN suffix({w}, 'l') AND {_doublec_s(w)}"
        f" AND {_m_s(w)} > 1 THEN {_chop_s(w, 1)} ELSE {w} END"
    )


_S_STEPS = (
    _s_1a,
    _s_1b,
    _s_1c,
    _s_rules(STEP2, 0),
    _s_rules(STEP3, 0),
    _s_rules(STEP4, 1, ion_st=True),
    _s_5a,
    _s_5b,
)


def porter_sql(e: str) -> str:
    """DuckDB fragment stemming the (lowercase token) expression ``e``.

    ``e`` must be a simple expression (a lambda variable or column
    reference) — it is interpolated more than once.
    """
    g = _Gensym()
    w = e
    for step in _S_STEPS:
        w = _bind_s(w, step, g)
    return f"CASE WHEN length({e}) <= 2 THEN {e} ELSE {w} END"
