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


def test_assign_cells_bounds_pairwise_cost(spark, sf_dir):
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.operators.clustering import assign_cells

    emb = load_table(spark, sf_dir, "embeddings")

    def pair_cost(k: int) -> tuple[int, int]:
        cells = assign_cells(emb, k=k, n_iter=2)
        sizes = [r["n"] for r in cells.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")).collect()]
        return max(sizes), sum(n * (n - 1) // 2 for n in sizes)

    max4, cost4 = pair_cost(4)
    max16, cost16 = pair_cost(16)
    # more cells -> smaller biggest cell and fewer within-cell pairs
    assert max16 < max4
    assert cost16 < cost4
    # every vector lands in exactly one cell
    cells = assign_cells(emb, k=8, n_iter=2)
    assert cells.count() == emb.count()
    assert cells.filter(F.col("cell").isNull()).count() == 0
    # deterministic
    a = sorted((r["vec_id"], r["cell"]) for r in cells.collect())
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in assign_cells(emb, k=8, n_iter=2).collect()
    )
    assert a == b
