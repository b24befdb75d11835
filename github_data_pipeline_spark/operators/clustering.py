"""Iterative k-means over embedding columns — pure DataFrame ops.

The IVF coarse quantizer trained in-engine: deterministic seeding
(lowest k vec_ids), Lloyd iterations as broadcast-join + argmin +
grouped centroid recompute. Each iteration is one job over the data;
centroids live in a driver-side list (k × dim doubles — tiny), so NO
driver-side loop over data rows, only over iterations.

Scale: the assignment stage broadcasts k centroids and scans the
corpus once per iteration (map-side argmin, no shuffle); the update
stage is one groupBy(cluster) with fixed-point component sums (exact,
order-independent — same trick as functions/money.py). 100 TB x few
iterations = few scans, the textbook distributed k-means plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000_000  # nano fixed-point for exact centroid sums


def _argmin_cluster(centroids: list[list[float]]):
    """Column expr: index of the nearest centroid by squared L2."""
    def sq_dist(c: list[float]):
        arr = F.array(*[F.lit(float(x)) for x in c])
        diffs = F.zip_with(
            F.col("embedding"), arr, lambda a, b: a.cast("double") - b
        )
        return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v)

    best_idx = F.lit(0)
    best_d = sq_dist(centroids[0])
    for i, c in enumerate(centroids[1:], start=1):
        d = sq_dist(c)
        better = d < best_d  # strict: ties keep the lower index
        best_idx = F.when(better, F.lit(i)).otherwise(best_idx)
        best_d = F.when(better, d).otherwise(best_d)
    return best_idx, best_d


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's algorithm; returns (centroids, assignments DF).

    Deterministic: seeds = the k lowest ids' vectors; ties in the
    argmin keep the lower cluster index. assignments: (id, cluster,
    sq_dist).
    """
    dim = vectors.select(F.size("embedding").alias("d")).first()["d"]
    seeds = (
        vectors.orderBy(id_col)
        .limit(k)
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]

    for _ in range(n_iter):
        idx, _d = _argmin_cluster(centroids)
        assigned = vectors.select(
            id_col, "embedding", idx.alias("cluster")
        )
        comp = assigned.select(
            "cluster", F.posexplode("embedding").alias("pos", "v")
        ).groupBy("cluster", "pos").agg(
            F.sum(
                F.round(F.col("v").cast("double") * _SCALE).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        rows = comp.collect()  # k x dim tiny rows — centroid state only
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = (
                r["s"] / r["n"] / _SCALE
            )
            counts[r["cluster"]] = r["n"]
        centroids = [
            sums.get(i, centroids[i]) for i in range(k)  # empty keeps old
        ]

    idx, d = _argmin_cluster(centroids)
    assignments = vectors.select(
        id_col, idx.alias("cluster"), d.alias("sq_dist")
    )
    return centroids, assignments


def inertia(assignments: DataFrame) -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    return assignments.agg(F.sum("sq_dist").alias("j")).first()["j"]
