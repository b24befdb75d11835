"""Issue-reference and cross-repo-reference extraction as pure Spark SQL.

Re-expresses the reference's core custom logic
(``src/retrieval/linkers.py:17-52``) as Catalyst expressions — no Python
UDF in the hot path, so the whole extraction stays inside whole-stage
codegen and scales linearly with executors.

Semantics pinned to the reference:

* ``ISSUE_REF_PATTERN`` — optional closing keyword (``close[sd]?`` /
  ``fixe?[sd]?`` / ``resolve[sd]?``) followed by ``owner/repo#N`` or bare
  ``#N``, case-insensitive (linkers.py:17-21).
* Sentence scoping — text splits on ``(?<=[.!?\\n])\\s+``; a reference
  inherits ``has_closing_kw`` when its *sentence* contains a closing
  keyword anywhere, not just adjacent (linkers.py:35-46).
* ``CROSS_REPO_PATTERN`` — optional ``https://github.com/`` prefix +
  ``owner/repo/issues/N`` | ``owner/repo/pull/N`` | ``owner/repo#N``
  (linkers.py:22-26).

Java regex (Spark) supports the lookbehind sentence split natively.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# groups: 1=kw 2=full_repo 3=num(with repo) 4=num(bare)
ISSUE_REF_PATTERN = (
    r"(?i)(?:(close[sd]?|fixe?[sd]?|resolve[sd]?)\s*[:\-–—]*\s+)?"
    r"(?:([A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+)#(\d+)|#(\d+))"
)

# groups: 1=full_repo 2=kind 3=num(path form) 4=num(hash form)
CROSS_REPO_PATTERN = (
    r"(?i)(?:(?:https?://github\.com/)?([A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+)"
    r"(?:(?:/(issues|pull))/(\d+)|#(\d+)))"
)

SENTENCE_SPLIT_PATTERN = r"(?<=[.!?\n])\s+"

CLOSING_KW_PATTERN = r"(?i)\b(close[sd]?|fixe?[sd]?|resolve[sd]?)\b"

REF_STRUCT_SCHEMA = (
    "full_repo string, number int, has_closing_kw boolean"
)


def _nullif_empty(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


# str-keyed call sites memoize their fragment per process (r12,
# guide §5.3 — several gh-family builders rebuild these nested
# regexp/HOF trees on every call; see functions/colcache.py)
from .colcache import memoize_when_keyable  # noqa: E402


@memoize_when_keyable
def extract_issue_refs(text: Column | str) -> Column:
    """text -> ARRAY<STRUCT<full_repo, number, has_closing_kw>>.

    Flattens per-sentence matches in document order, mirroring
    ``extract_issue_refs_detailed`` row-for-row.
    """
    col = F.col(text) if isinstance(text, str) else text
    sentences = F.split(col, SENTENCE_SPLIT_PATTERN)

    def refs_in_sentence(sent: Column) -> Column:
        sentence_has_kw = sent.rlike(CLOSING_KW_PATTERN)
        matches = F.regexp_extract_all(sent, F.lit(ISSUE_REF_PATTERN), F.lit(0))
        return F.transform(
            matches,
            lambda m: F.struct(
                _nullif_empty(
                    F.regexp_extract(m, ISSUE_REF_PATTERN, 2)
                ).alias("full_repo"),
                F.coalesce(
                    _nullif_empty(F.regexp_extract(m, ISSUE_REF_PATTERN, 3)),
                    _nullif_empty(F.regexp_extract(m, ISSUE_REF_PATTERN, 4)),
                )
                .cast("int")
                .alias("number"),
                (
                    _nullif_empty(
                        F.regexp_extract(m, ISSUE_REF_PATTERN, 1)
                    ).isNotNull()
                    | sentence_has_kw
                ).alias("has_closing_kw"),
            ),
        )

    flat = F.flatten(F.transform(sentences, refs_in_sentence))
    # reference skips matches without a number (defensive; regex guarantees one)
    return F.filter(flat, lambda r: r["number"].isNotNull())


@memoize_when_keyable
def extract_cross_repo_refs(text: Column | str) -> Column:
    """text -> ARRAY<STRUCT<target_repo, target_number>> (linkers.py:245-320).

    No sentence scoping — the reference scans the whole text buckets.
    """
    col = F.col(text) if isinstance(text, str) else text
    matches = F.regexp_extract_all(col, F.lit(CROSS_REPO_PATTERN), F.lit(0))
    return F.transform(
        matches,
        lambda m: F.struct(
            _nullif_empty(F.regexp_extract(m, CROSS_REPO_PATTERN, 1)).alias(
                "target_repo"
            ),
            F.coalesce(
                _nullif_empty(F.regexp_extract(m, CROSS_REPO_PATTERN, 3)),
                _nullif_empty(F.regexp_extract(m, CROSS_REPO_PATTERN, 4)),
            )
            .cast("int")
            .alias("target_number"),
        ),
    )


@memoize_when_keyable
def one_line(msg: Column | str) -> Column:
    """First line of a (possibly multi-line) message, trimmed.

    Mirrors ``one_line`` (collectors.py:51-55): ``msg.splitlines()[0].strip()``.
    """
    col = F.col(msg) if isinstance(msg, str) else msg
    normalized = F.regexp_replace(col, r"\r\n?", "\n")
    return F.trim(F.substring_index(normalized, "\n", 1))


def author_key(*candidates: Column | str) -> Column:
    """Identity coalesce: login -> name -> email -> 'unknown'
    (``author_key_from_commit_author``, collectors.py:42-48)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in candidates]
    return F.coalesce(*cols, F.lit("unknown"))
