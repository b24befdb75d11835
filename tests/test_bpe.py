"""BPE trainer vs an independent pure-Python reference, and the
Catalyst merge fold vs the Python encoder."""

from __future__ import annotations

import os
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators import bpe

# tools/property_gate.py raises this for the pre-release thorough pass
HYPO_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "0")) or 10


# -- independent reference trainer (no Spark) ------------------------------


def ref_learn_bpe(texts, n_merges, min_freq=2):
    import re

    pat = re.compile(bpe.PRETOKEN_PATTERN)
    vocab = Counter()
    for t in texts:
        for w in pat.findall(t):
            vocab[w.lower()] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # deterministic argmax: freq desc, then (left, right) asc
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if freq < min_freq:
            break
        merges.append((left, right, freq))
        for w in syms:
            s, out = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


WORDS = st.sampled_from(
    "low lower lowest new newest wide widest ab abc aab aaa b2b x".split()
)
CORPORA = st.lists(
    st.lists(WORDS, min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=5,
)


@settings(max_examples=HYPO_EXAMPLES, deadline=None)
@given(CORPORA)
def _check_trainer_matches_reference(corpora):
    spark = _check_trainer_matches_reference.spark
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpora)], ["doc_id", "text"]
    )
    assert bpe.learn_bpe(docs, n_merges=6) == ref_learn_bpe(corpora, 6)


def test_trainer_matches_reference(spark):
    # hypothesis drives the inner check; the session rides in on an
    # attribute because @given doesn't mix with pytest fixtures
    _check_trainer_matches_reference.spark = spark
    _check_trainer_matches_reference()


def test_classic_example(spark):
    # the canonical BPE toy corpus: "low lowest newer wider" variants
    texts = ["low low low lower lower", "newest newest widest lowest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe.learn_bpe(docs, n_merges=4)
    assert merges == ref_learn_bpe(texts, 4)
    # "lo" must be an early merge: 'l','o' appears in low/lower/lowest
    assert (merges[0][0], merges[0][1]) == ("l", "o")


def test_learn_bpe_never_touches_caller_confs(spark):
    """Training runs on a dedicated spark.newSession(): a thread
    polling the CALLER session's confs throughout the whole run must
    never observe the training overrides (AQE off, shrunk shuffle
    partitions), so queries running concurrently on the caller's
    session are safe — the last open r6 ADVICE item."""
    import threading
    import time

    texts = ["low low low lower lower", "newest newest widest lowest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    keys = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    before = {k: spark.conf.get(k, None) for k in keys}
    seen: dict[str, set] = {k: set() for k in keys}
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            for k in keys:
                seen[k].add(spark.conf.get(k, None))
            time.sleep(0.005)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        merges = bpe.learn_bpe(docs, n_merges=4)
    finally:
        stop.set()
        t.join(timeout=5)
    # same merges as ever, and no observation of a mutated conf
    assert merges == ref_learn_bpe(texts, 4)
    for k in keys:
        assert seen[k] == {before[k]}, f"caller conf {k} mutated: {seen[k]}"
        assert spark.conf.get(k, None) == before[k]


def test_learn_bpe_reuses_one_training_session(spark):
    """Repeated training calls in one JVM must NOT accumulate
    conf-pinned sessions in the registry (r7 ADVICE): the dedicated
    training session is cached per SparkContext and reused, and the
    results stay identical across reuses."""
    texts = ["low low low lower lower", "newest newest widest lowest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    m1 = bpe.learn_bpe(docs, n_merges=3)
    sess1 = bpe._TRAIN_SESSION
    m2 = bpe.learn_bpe(docs, n_merges=3)
    sess2 = bpe._TRAIN_SESSION
    assert sess1 is sess2 and sess1 is not spark
    assert sess1.sparkContext is spark.sparkContext
    assert m1 == m2 == ref_learn_bpe(texts, 3)


def test_merge_fold_leftmost_first(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), ([],)], ["syms"]
    )
    got = [
        r[0]
        for r in df.select(
            bpe.merge_pair_col(F.col("syms"), "a", "a")
        ).collect()
    ]
    assert got[0] == ["aa", "a"] and got[2] == []
    got2 = [
        r[0]
        for r in df.select(
            bpe.merge_pair_col(F.col("syms"), "a", "b")
        ).collect()
    ]
    assert got2[1] == ["ab", "ab"]


def test_encoder_matches_python_and_counts(spark):
    texts = ["low lower lowest", "newest widest low low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe.learn_bpe(docs, n_merges=6)
    ranks = {(l, r): i for i, (l, r, _f) in enumerate(merges)}
    got = {
        (r.doc_id, r.subword): r.n
        for r in bpe.encode_words(docs, merges).collect()
    }
    import re

    pat = re.compile(bpe.PRETOKEN_PATTERN)
    expect: Counter = Counter()
    for i, t in enumerate(texts):
        for w in pat.findall(t):
            for s in bpe.encode_word_py(w.lower(), ranks):
                expect[(i, s)] += 1
    assert got == dict(expect)
    # round-trip: concatenated subwords rebuild each word
    for w in ("lowest", "widest", "b2b"):
        assert "".join(bpe.encode_word_py(w, ranks)) == w


def test_registry_entry_shape(spark, sf_dir):
    from github_data_pipeline_spark.plans import all_plans

    q = all_plans()["bpe_learned_merges"]
    rows = q.builder(spark, sf_dir).collect()
    assert len(rows) > 0
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert all(r.freq >= 2 for r in rows)


def test_batched_equals_one_at_a_time(spark):
    """The safe-prefix batch trainer must reproduce the classic
    one-merge-per-job list exactly — on the toy corpus and with an
    awkward window size."""
    texts = ["low low low lower lower", "newest newest widest lowest",
             "aaa aab b2b x abc ab ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sequential = bpe.learn_bpe(docs, n_merges=8, batch_candidates=1)
    for window in (2, 3, 64):
        assert bpe.learn_bpe(docs, n_merges=8, batch_candidates=window) == sequential
    assert sequential == ref_learn_bpe(texts, 8)


def test_self_pair_counterexample(spark):
    """Pinned round-4 Hypothesis counterexample: the merge of the
    self-pair (a, a) creates (aa, a) with freq bounded by (a, a)'s own
    count; the batched trainer must not accept (l, o) alongside it —
    sequential BPE's second merge is (aa, a) ("aa" < "l" wins the
    lexicographic tie-break at freq 2)."""
    texts = ["low low aaa aaa"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    expect = ref_learn_bpe(texts, 6)
    assert bpe.learn_bpe(docs, n_merges=6) == expect
    assert bpe.learn_bpe(docs, n_merges=6, batch_candidates=1) == expect
    # the divergence round 4 shipped: ("aa","a") must precede ("l","o")
    assert [(l, r) for l, r, _f in expect[:3]] == [
        ("a", "a"), ("aa", "a"), ("l", "o")
    ]


def test_safe_prefix_self_pair_ends_batch():
    """An accepted self-pair bounds its own created pairs, so nothing
    after it is provably safe — even a symbol-disjoint runner-up."""
    from collections import namedtuple

    P = namedtuple("P", "left right freq")
    top = [P("a", "a", 100), P("d", "e", 95), P("f", "g", 90)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("a", "a")]
    # a LATER self-pair also ends the prefix after its acceptance
    top = [P("a", "b", 100), P("d", "d", 95), P("f", "g", 90)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("a", "b"), ("d", "d")]


def test_safe_prefix_unit():
    """Decision table for the batch-acceptance rule."""
    from collections import namedtuple

    P = namedtuple("P", "left right freq")
    # disjoint runner-up accepted; overlapping pair stops the prefix
    top = [P("a", "b", 100), P("d", "e", 95), P("b", "c", 90)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("a", "b"), ("d", "e")]
    # adjacency threat: (b,c).freq >= candidate freq -> only argmax
    top = [P("a", "b", 100), P("d", "e", 90), P("b", "c", 95)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("a", "b")]
    # full window: candidate at the floor freq is rejected
    top = [P("a", "b", 100), P("d", "e", 95)]
    got = bpe._safe_merge_prefix(top, window_full=True, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("a", "b")]
    # budget truncates
    top = [P("a", "b", 100), P("d", "e", 95), P("f", "g", 80)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=1, min_freq=2)
    assert len(got) == 1


def test_merge_pairs_col_multi(spark):
    df = spark.createDataFrame(
        [(["c", "a", "b", "d"],), (["c", "d", "a", "b"],), ([],)], ["syms"]
    )
    got = [
        r[0]
        for r in df.select(
            bpe.merge_pairs_col(F.col("syms"), [("a", "b"), ("c", "d")])
        ).collect()
    ]
    assert got == [["c", "ab", "d"], ["cd", "ab"], []]


def test_safe_prefix_collision_guards():
    """Merged-string collisions end the prefix: intra-batch (two pairs
    producing one string defeats the per-merge threat bound) and
    existing-symbol (counts of pairs referencing it can GROW)."""
    from collections import namedtuple

    P = namedtuple("P", "left right freq")
    # intra-batch: ("x","yz") and ("xy","z") both make "xyz"
    top = [P("x", "yz", 100), P("xy", "z", 95), P("d", "e", 90)]
    got = bpe._safe_merge_prefix(top, window_full=False, budget=8, min_freq=2)
    assert [(p.left, p.right) for p in got] == [("x", "yz")]
    # existing-symbol: merged "abc" already in the vocabulary
    top = [P("ab", "c", 100), P("d", "e", 95)]
    got = bpe._safe_merge_prefix(
        top, window_full=False, budget=8, min_freq=2,
        known_symbols=frozenset({"abc"}),
    )
    assert [(p.left, p.right) for p in got] == [("ab", "c")]
    # a non-colliding known symbol does not restrict the batch
    got = bpe._safe_merge_prefix(
        top, window_full=False, budget=8, min_freq=2,
        known_symbols=frozenset({"zz"}),
    )
    assert [(p.left, p.right) for p in got] == [("ab", "c"), ("d", "e")]


def test_catalyst_encoder_matches_arrow_encoder(spark, sf_dir):
    """The in-order-replace Catalyst encoder (bpe_encoded_profile's
    hot path) must produce the same subword stream as the rank-greedy
    Arrow encoder (encode_words) — per-source totals AND the exact
    per-subword distribution."""
    from collections import Counter

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.bpe_plans import (
        learned_merges_artifact,
    )
    from github_data_pipeline_spark.sources.tables import load_table

    merges = learned_merges_artifact(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    arrow = Counter()
    for r in bpe.encode_words(docs, merges).collect():
        arrow[r.subword] += r.n
    prof = {
        r.source: r
        for r in all_plans()["bpe_encoded_profile"]
        .builder(spark, sf_dir)
        .collect()
    }
    # totals: subword mass must agree exactly
    assert sum(r.subwords for r in prof.values()) == sum(arrow.values())
    # distribution: re-derive the catalyst per-subword counts
    from pyspark.sql import functions as F
    from github_data_pipeline_spark.operators.bpe import PRETOKEN_PATTERN

    clean = F.replace(F.lower("text"), F.lit("\x01"), F.lit(" "))
    toks = F.regexp_extract_all(clean, F.lit(PRETOKEN_PATTERN), F.lit(0))
    s = F.concat(
        F.lit("  "),
        F.regexp_replace(F.array_join(toks, "\x01"), "(.)", "$1  "),
    )
    for left, right, _f in merges:
        s = F.replace(s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))
    subs = F.filter(
        F.split(F.trim(s), " +"),
        lambda x: (x != F.lit("\x01")) & (x != F.lit("")),
    )
    catalyst = Counter()
    for r in (
        docs.select(F.explode(subs).alias("sw"))
        .groupBy("sw")
        .count()
        .collect()
    ):
        catalyst[r.sw] = r["count"]
    assert catalyst == arrow
