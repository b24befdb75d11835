"""Randomized parity: the Catalyst ref-extraction expressions against a
pure-Python spec executing the reference's algorithm (same regexes, same
sentence scoping — linkers.py:29-52, 274-276) over 300 seeded
adversarial texts. One batch Spark job, per-text comparison."""

from __future__ import annotations

import random
import re

from github_data_pipeline_spark.functions.refs import (
    CLOSING_KW_PATTERN,
    CROSS_REPO_PATTERN,
    ISSUE_REF_PATTERN,
    SENTENCE_SPLIT_PATTERN,
    extract_cross_repo_refs,
    extract_issue_refs,
)

FRAGMENTS = [
    "Fixes #12",
    "fixes#3",                      # kw glued to ref: bare-ref + sentence kw
    "closes other/repo#45",
    "Resolve: #7",
    "resolved  -- #8",
    "see owner/proj#99 maybe",
    "prefixes #2",                  # 'fixes' inside a word: no kw
    "Close",                        # kw with no ref
    "#666",
    "https://github.com/a-b/c.d/issues/5",
    "https://github.com/x/y/pull/31",
    "plain text without refs",
    "FIXED #0013",
    "resolve– #4",             # en-dash separator
    "multi\nline #21 body",
    "trailing punctuation #5.",
    "a/b#1 and c/d#2 in one breath",
    "(parenthetical close #11)",
    "Ünïcode tèxt #77",
    "issue#notanumber",
    "ends with bang! Fix #3",
    "question? #9 next",
]
SEPS = [" ", ". ", "! ", "? ", "\n", "\n\n", "; ", " ... "]


def gen_texts(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        parts = [rng.choice(FRAGMENTS) for _ in range(k)]
        seps = [rng.choice(SEPS) for _ in range(k - 1)]
        text = parts[0]
        for s, p in zip(seps, parts[1:]):
            text += s + p
        out.append(text)
    return out


def spec_issue_refs(text: str) -> list[tuple]:
    """The reference algorithm in plain Python over the same patterns."""
    out = []
    if not text:
        return out
    for sent in re.split(SENTENCE_SPLIT_PATTERN, text):
        if not sent:
            continue
        sent_kw = bool(re.search(CLOSING_KW_PATTERN, sent))
        for m in re.finditer(ISSUE_REF_PATTERN, sent):
            num = m.group(3) or m.group(4)
            if not num:
                continue
            out.append(
                (m.group(2), int(num), bool(m.group(1)) or sent_kw)
            )
    return out


def spec_cross_refs(text: str) -> list[tuple]:
    out = []
    for m in re.finditer(CROSS_REPO_PATTERN, text or ""):
        num = m.group(3) or m.group(4)
        out.append((m.group(1) or None, int(num)))
    return out


def test_issue_refs_match_python_spec_on_random_corpus(spark):
    texts = gen_texts(300)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    ).select("i", extract_issue_refs("text").alias("refs"))
    got = {
        r["i"]: [
            (x["full_repo"], x["number"], x["has_closing_kw"])
            for x in r["refs"]
        ]
        for r in df.collect()
    }
    mismatches = [
        (i, texts[i], got[i], spec_issue_refs(texts[i]))
        for i in range(len(texts))
        if got[i] != spec_issue_refs(texts[i])
    ]
    assert not mismatches, f"first mismatch: {mismatches[0]}"


def test_cross_refs_match_python_spec_on_random_corpus(spark):
    texts = gen_texts(300, seed=7)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    ).select("i", extract_cross_repo_refs("text").alias("refs"))
    got = {
        r["i"]: [(x["target_repo"], x["target_number"]) for x in r["refs"]]
        for r in df.collect()
    }
    mismatches = [
        (i, texts[i], got[i], spec_cross_refs(texts[i]))
        for i in range(len(texts))
        if got[i] != spec_cross_refs(texts[i])
    ]
    assert not mismatches, f"first mismatch: {mismatches[0]}"
