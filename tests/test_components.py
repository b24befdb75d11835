"""Connected-components cluster resolution (operators/components.py):
must agree with a driver-side union-find on the real LSH candidate
graph, and elect deterministic keepers."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.components import (
    connected_components,
    dedup_keepers,
)
from github_data_pipeline_spark.operators.neardup import (
    band_index,
    doc_shingles,
    lsh_candidates,
    minhash_signatures,
)
from github_data_pipeline_spark.sources.tables import load_table, spread


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_and_triangle(spark):
    # chain 1-2-3-4 (diameter 3: exercises multiple rounds) + triangle
    # 10-11-12 + pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_random_graphs_single_job(spark):
    # 30 seeded random graphs, disjoint id ranges, resolved in ONE
    # distributed run and compared per-graph against union-find —
    # includes a 45-node path (diameter 44) that only converges inside
    # 20 rounds because of pointer jumping
    import random

    rng = random.Random(42)
    edges: list[tuple[int, int]] = []
    for case in range(30):
        base = case * 10_000
        n = rng.randint(2, 40)
        for _ in range(rng.randint(1, 60)):
            edges.append((base + rng.randrange(n), base + rng.randrange(n)))
    edges += [(990_000 + i, 990_000 + i + 1) for i in range(44)]  # path
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    want = _union_find([(a, b) for a, b in edges if a != b])
    assert got == want


def test_components_match_union_find_on_lsh_graph(spark, sf_dir):
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    pairs = lsh_candidates(band_index(minhash_signatures(doc_shingles(docs))))
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edge_list, "planted near-dups must produce candidate edges"
    want = _union_find(edge_list)

    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == want

    keepers = dedup_keepers(docs, pairs).collect()
    n_docs = docs.count()
    assert len(keepers) == n_docs
    by_id = {r["doc_id"]: r for r in keepers}
    for doc_id, r in by_id.items():
        expect = want.get(doc_id, doc_id)
        assert r["keeper_doc_id"] == expect
        assert r["is_keeper"] == (doc_id == expect)
    # every component elects exactly one keeper, and it is a member
    assert all(by_id[r["keeper_doc_id"]]["is_keeper"] for r in keepers)
