"""Text-analysis column expressions for the training-data pipeline.

Language-ID, quality scoring, token counting and document fingerprinting
over the ``documents`` table — all as built-in-function expressions
(JVM-side, codegen-friendly), no Python in the hot path. Designed so the
same arithmetic is expressible in ANSI SQL for oracle checking: integer
counts and single final divisions only (see functions/money.py for why).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_PATTERN = r"\s+"

# Tiny deterministic marker-word lists per language for the n-gram/stopword
# language-ID heuristic. Real corpora would use trained profiles; the
# heuristic structure (per-language hit counts -> argmax with lexicographic
# tiebreak) is what matters and is what the oracle re-implements.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "les", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

EN_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "on")

FINGERPRINT_MOD = 1_000_003


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization with empty tokens dropped."""
    return F.filter(
        F.split(F.trim(_col(c)), TOKEN_SPLIT_PATTERN), lambda t: t != F.lit("")
    )


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def stopword_hits(tok: Column, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Number of tokens found in `words` (lowercased exact match)."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda t: F.array_contains(wordset, F.lower(t))))


def char_count(tok: Column) -> Column:
    """Total characters across tokens (exact int, order-independent)."""
    return F.aggregate(tok, F.lit(0), lambda acc, t: acc + F.length(t))


def lang_scores(tok: Column) -> dict[str, Column]:
    """Per-language marker-hit counts."""
    return {lang: stopword_hits(tok, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(tok: Column) -> Column:
    """Argmax language by marker hits; ties break lexicographically.

    Implemented as a fold over languages in sorted order keeping the
    strictly-greater score — identical logic is a CASE cascade in SQL.
    """
    scores = lang_scores(tok)
    ordered = sorted(scores)  # lexicographic -> deterministic tiebreak
    best_lang = F.lit(ordered[0])
    best_score = scores[ordered[0]]
    for lang in ordered[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def word_ngrams(tok: Column, n: int) -> Column:
    """Word n-gram shingles: ARRAY<STRING> of space-joined n-token windows."""
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n)))
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def token_poly_hash(t: Column) -> Column:
    """Cheap deterministic per-token hash from length + boundary chars.

    Used by the *oracle-checkable* fingerprint path; production
    fingerprints should use :func:`fingerprint64`.
    """
    return (
        F.length(t) * 961
        + F.ascii(F.substring(t, 1, 1)) * 31
        + F.ascii(F.substring(t, -1, 1))
    ).cast("long")


def fingerprint_rolling(tok: Column) -> Column:
    """Order-sensitive rolling document fingerprint (Karp-Rabin shape).

    ``acc = (acc * 31 + h(token)) mod 1_000_003`` folded left-to-right —
    exactly reproducible in ANSI SQL via a reduce/fold, unlike engine-
    specific hash functions.
    """
    return F.aggregate(
        tok,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + token_poly_hash(t)) % FINGERPRINT_MOD,
    )


def fingerprint64(c: Column | str) -> Column:
    """Production 64-bit content fingerprint (xxhash64, JVM-side)."""
    return F.xxhash64(_col(c))


# --- curation cleaning (pre-tokenization normalization) -----------------
#
# The standard text-cleaning passes a training pipeline applies before
# quality scoring / dedup / tokenization. All pure regexp_replace
# chains — JVM-side, whole-stage-codegen, no Python in the path.

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_LONG_ID_RE = r"\b\d{9,}\b"
_HTML_TAG_RE = r"<[^<>]{1,256}>"
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def strip_html(c: Column | str) -> Column:
    """Drop HTML/XML tags (bounded tag length guards against quadratic
    regex behavior on adversarial '<' runs)."""
    return F.regexp_replace(_col(c), _HTML_TAG_RE, " ")


def remove_control_chars(c: Column | str) -> Column:
    """Strip C0 control characters (keep \\t \\n \\r)."""
    return F.regexp_replace(_col(c), _CONTROL_RE, "")


def normalize_whitespace(c: Column | str) -> Column:
    """Collapse whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(_col(c), r"\s+", " "))


def mask_pii(c: Column | str) -> Column:
    """Replace emails, IPv4 addresses and long digit runs with typed
    placeholder tokens — the redaction pass before text leaves the
    curation boundary."""
    out = F.regexp_replace(_col(c), _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _IPV4_RE, "<IP>")
    return F.regexp_replace(out, _LONG_ID_RE, "<ID>")


def clean_text(c: Column | str) -> Column:
    """The composed curation cleaner: tags -> control chars -> PII ->
    whitespace. Order matters (tag innards may contain PII-ish runs;
    whitespace collapse last)."""
    return normalize_whitespace(mask_pii(remove_control_chars(strip_html(c))))


# --- intra-document repetition (C4/RefinedWeb-style) --------------------


def dedupe_lines(c: Column | str) -> Column:
    """Keep the FIRST occurrence of each line, drop later repeats and
    blank lines — the boilerplate-line pass (nav bars, cookie banners,
    repeated headers) that runs before whitespace normalization
    collapses newlines. array_distinct preserves first-occurrence
    order, so this is pure codegen with no Python in the path."""
    lines = F.transform(F.split(_col(c), r"\n"), lambda l: F.trim(l))
    kept = F.filter(F.array_distinct(lines), lambda l: F.length(l) > 0)
    return F.array_join(kept, "\n")


def max_ngram_repetition(tok: Column, n: int = 2) -> Column:
    """Fraction of a doc's n-gram occurrences taken by its single most
    frequent n-gram — the standard intra-doc repetition score (a doc
    that is one phrase looped scores near 1.0; natural text stays
    low). Computed as the longest run in the SORTED shingle array via
    one array fold: no explode, no shuffle, no UDF."""
    grams = F.array_sort(word_ngrams(tok, n))
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc: Column, g: Column) -> Column:
        new_run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    best = F.aggregate(grams, acc0, step, lambda a: a["best"])
    return F.when(
        F.size(grams) > 0, best.cast("double") / F.size(grams)
    ).otherwise(F.lit(0.0))
