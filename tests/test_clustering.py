"""k-means invariants: nearest-centroid assignments, monotone inertia,
deterministic output across runs."""

from __future__ import annotations

from github_data_pipeline_spark.operators.clustering import (
    inertia,
    kmeans_fit,
)
from github_data_pipeline_spark.sources.tables import load_table


def test_kmeans_invariants(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    c1, a1 = kmeans_fit(e, k=5, n_iter=1)
    c3, a3 = kmeans_fit(e, k=5, n_iter=3)
    j1, j3 = inertia(a1), inertia(a3)
    # Lloyd never increases the objective
    assert j3 <= j1 + 1e-9
    # every vector lands in exactly one of k clusters
    n = e.count()
    assert a3.count() == n
    clusters = {r["cluster"] for r in a3.select("cluster").distinct().collect()}
    assert clusters <= set(range(5)) and len(clusters) >= 2
    # determinism: same seeds -> identical assignments
    _, a3b = kmeans_fit(e, k=5, n_iter=3)
    got = sorted(map(tuple, a3.select("vec_id", "cluster").collect()))
    again = sorted(map(tuple, a3b.select("vec_id", "cluster").collect()))
    assert got == again


def test_kmeans_assignment_is_nearest(spark, sf_dir):
    import math

    e = load_table(spark, sf_dir, "embeddings")
    cents, assign = kmeans_fit(e, k=4, n_iter=2)
    vecs = {r["vec_id"]: r["embedding"] for r in e.limit(50).collect()}
    amap = {r["vec_id"]: r["cluster"] for r in assign.collect()}

    def sqd(v, c):
        return sum((float(a) - b) ** 2 for a, b in zip(v, c))

    for vid, v in vecs.items():
        dists = [sqd(v, c) for c in cents]
        best = min(range(len(cents)), key=lambda i: (dists[i], i))
        assert amap[vid] == best
        assert math.isfinite(dists[best])
