"""Fixed-point PageRank: Spark plan vs an independent pure-Python
fixed-point reference on a hand-built event log, plus structural
invariants (sink nodes keep base rank, determinism across runs)."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime, timedelta

from github_data_pipeline_spark.plans.graph_plans import (
    _BASE,
    DAMP_DEN,
    DAMP_NUM,
    N_ITERS,
    SCALE,
)


def ref_pagerank(sequences: list[list[int]]) -> dict[int, int]:
    """Pure-Python twin of the fixed-point iteration."""
    edges: Counter = Counter()
    for seq in sequences:
        for a, b in zip(seq, seq[1:]):
            edges[(a, b)] += 1
    ow: Counter = Counter()
    for (a, _b), w in edges.items():
        ow[a] += w
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    r = {n: SCALE for n in nodes}
    for _ in range(N_ITERS):
        c: defaultdict = defaultdict(int)
        for (a, b), w in edges.items():
            c[b] += (r[a] * w * DAMP_NUM) // (ow[a] * DAMP_DEN)
        r = {n: _BASE + c[n] for n in nodes}
    return r


def _events_df(spark, sequences):
    rows = []
    eid = 0
    t0 = datetime(2024, 1, 1)
    for uid, seq in enumerate(sequences):
        for j, item in enumerate(seq):
            rows.append(
                (
                    eid,
                    t0 + timedelta(minutes=j),
                    uid,
                    "view",
                    1.0,
                    '{"k": %d}' % item,
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def _run(spark, sequences):
    import github_data_pipeline_spark.plans.graph_plans as G

    df = _events_df(spark, sequences)
    orig = G.load_table
    G.load_table = lambda _s, _d, _t: df
    try:
        return {
            r.item: r.pagerank_fp
            for r in G.events_item_pagerank(spark, "unused").collect()
        }
    finally:
        G.load_table = orig


def test_matches_python_reference(spark):
    seqs = [
        [1, 2, 3, 2, 1],
        [2, 3, 4],
        [4, 1, 1, 2],
        [5, 2],
        [3, 3, 3],
    ]
    got = _run(spark, seqs)
    ref = ref_pagerank(seqs)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == dict(top)


def test_sink_keeps_base_rank_and_hub_wins(spark):
    # star into node 9 (a pure sink), node 0 never receives
    seqs = [[0, 9], [1, 9], [2, 9], [3, 9]]
    got = _run(spark, seqs)
    assert got[9] > got[0] == _BASE
    # every source has rank exactly base after first iteration settles
    assert all(got[n] == _BASE for n in (0, 1, 2, 3))


def test_deterministic_across_partitionings(spark):
    seqs = [[i % 7, (i * 3) % 7, (i * 5 + 1) % 7] for i in range(40)]
    a = _run(spark, seqs)
    b = _run(spark, seqs)
    assert a == b
