"""Round-8 mining operators (plans/mining_plans.py): semantic pins
beyond the registry oracle — label-disjointness of hard negatives,
exact-quota determinism, the edge-term unigram derivation, and
hand-checked dup-gram rates."""

from __future__ import annotations

import hashlib

import pandas as pd

# registry import BEFORE any direct plan-module import: a plan module
# imported at collection time would re-seat the driver window (see
# test_driver_window_invariants)
from github_data_pipeline_spark.plans import all_plans

REG = all_plans()

from github_data_pipeline_spark.plans import mining_plans as mp  # noqa: E402


def test_hard_negatives_never_share_anchor_label(spark, sf_dir):
    from github_data_pipeline_spark.sources.tables import load_table

    rows = REG["hard_negative_mining"].builder(spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    assert rows, "no negatives mined"
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != labels[r["anchor_id"]]
        assert r["neg_label"] == labels[r["negative_id"]]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rs in by_anchor.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)), anchor
        # ranks follow cosine descending
        srt = sorted(rs, key=lambda x: x["rank"])
        cosines = [x["cosine"] for x in srt]
        assert cosines == sorted(cosines, reverse=True)


def test_stratified_quota_exact_and_deterministic(spark, sf_dir):
    rows = REG["stratified_sample_exact"].builder(spark, sf_dir).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["doc_id"])
    # the fixture has 25+ docs per source, so every stratum fills its
    # exact quota — not "approximately Q" like a rate-based sampler
    assert all(len(v) == mp.Q_PER_STRATUM for v in per_src.values())
    # selection matches the pure-Python md5 ordering (engine-free spec)
    from github_data_pipeline_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id")
        .collect()
    )
    want: dict[str, list] = {}
    for r in docs:
        want.setdefault(r["source"], []).append(r["doc_id"])
    for src, ids in want.items():
        picked = sorted(
            ids,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[: mp.Q_PER_STRATUM]
        assert sorted(per_src[src]) == sorted(picked), src


def test_bigram_lift_edge_term_unigram_derivation(spark, duck):
    """The one-scan trick's load-bearing property: unigram counts
    derived from the bigram stream + NULL-right edge terms must equal
    direct token counts — and the lift of a planted collocation must
    dominate."""
    texts = [
        "alpha beta gamma alpha beta",
        "alpha beta delta",
        "gamma delta gamma",
        "solo",
    ]
    docs = pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    sdf = spark.createDataFrame(docs)
    orig = mp.load_table
    mp.load_table = lambda _s, _d, t: sdf
    try:
        # drop the stability floor so the tiny corpus emits rows
        old_min = mp.MIN_PAIR
        mp.MIN_PAIR = 1
        try:
            got = {
                (r["left_tok"], r["right_tok"]): r
                for r in mp.lm_bigram_lift(spark, "x").collect()
            }
        finally:
            mp.MIN_PAIR = old_min
    finally:
        mp.load_table = orig

    toks = [t for s in texts for t in s.split()]
    n_uni = len(toks)
    n_bi = sum(max(len(s.split()) - 1, 0) for s in texts)
    from collections import Counter

    cu = Counter(toks)
    cab = Counter(
        (w[i], w[i + 1])
        for s in texts
        for w in [s.split()]
        for i in range(len(w) - 1)
    )
    for (a, b), r in got.items():
        want = (
            ((cab[(a, b)] * n_uni * mp.LIFT_SCALE) // (cu[a] * cu[b]))
            * n_uni
        ) // n_bi
        assert r["lift_e6"] == want, (a, b)
        assert r["pair_count"] == cab[(a, b)]
    # planted collocation: 'alpha beta' occurs every time alpha does
    assert ("alpha", "beta") in got


def test_dup_ngram_rate_hand_checked(spark):
    shared = "the quick brown fox jumps"
    texts = {
        1: shared + " one extra tail",
        2: shared + " two other words",
        3: "completely different text with no overlap at all",
    }
    docs = pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    sdf = spark.createDataFrame(docs)
    orig = mp.load_table
    mp.load_table = lambda _s, _d, t: sdf
    try:
        rows = {r["doc_id"]: r for r in mp.doc_dup_ngram_rate(spark, "x").collect()}
    finally:
        mp.load_table = orig
    # docs 1 and 2 share exactly the 3 shingles inside `shared`
    for d in (1, 2):
        assert rows[d]["n_grams"] == 6  # 8 tokens -> 6 shingles
        assert rows[d]["n_dup"] == 3
        assert rows[d]["dup_pct"] == 50
    assert rows[3]["n_dup"] == 0 and rows[3]["dup_pct"] == 0
