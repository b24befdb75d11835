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
    """Column exprs (index, sq_dist) of the nearest centroid by squared
    L2, ties to the lower index.

    Built as ONE k x dim literal array scored by a higher-order
    ``transform`` + ``array_min`` over (dist, idx) structs (struct
    ordering is field-lexicographic, so equal distances keep the lower
    index). Expression size is O(k * dim) — the obvious alternative, a
    chained ``when(d_i < best, ...)`` fold, embeds the running best
    expression TWICE per step and grows 2^k: k=16 on 64-dim vectors
    OOMs the driver during analysis.

    The expression is rendered as ONE SQL string parsed JVM-side, not
    composed through the Column API: building k x dim literals through
    py4j costs ~0.6 s of driver round-trips PER LLOYD ITERATION (every
    iteration has fresh centroid literals, so nothing caches), where
    the parser takes ~9 ms — a measured 2.7 -> 1.1 s on a 5-iteration
    loop at sf0.1, bit-identical assignments. ``{x!r}D`` renders each
    centroid component as a Spark DOUBLE literal from Python's
    shortest round-tripping repr, so the parsed value is the exact
    same IEEE double the F.lit form carried; the fold is the same
    left-to-right aggregate, so distances are bit-identical too.
    """
    cents_sql = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        for c in centroids
    )
    best = F.expr(
        f"array_min(transform(array({cents_sql}), (c, i) -> "
        "struct(aggregate(zip_with(embedding, c, "
        "(a, b) -> CAST(a AS DOUBLE) - b), "
        "0.0D, (acc, v) -> acc + v * v) AS d, i AS i)))"
    )
    return best["i"], best["d"]


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


def assign_cells(
    vectors: DataFrame, k: int = 8, n_iter: int = 3, id_col: str = "vec_id"
) -> DataFrame:
    """IVF coarse re-cell: learn k centroids in-engine and attach an
    argmin ``cell`` column (no join — the centroid argmin is a closed
    expression over the broadcast centroid literals).

    This is the scale knob for the per-cell-quadratic stages
    (embedding near-dup, IVF ANN): grow k with the corpus
    (k ~ n / target_cell_size) and per-cell pairwise cost stays
    constant while total cost stays linear — SCALING.md measures the
    fixed-cell worst case this avoids.
    """
    centroids, _ = kmeans_fit(vectors, k, n_iter, id_col)
    idx, _d = _argmin_cluster(centroids)
    return vectors.withColumn("cell", idx)


def inertia(assignments: DataFrame) -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    return assignments.agg(F.sum("sq_dist").alias("j")).first()["j"]
