"""Random-hyperplane (signed-random-projection) LSH for embedding
columns — shared by the ANN probe (plans/ann_lsh_plans.py) and the
scale-adaptive celling of embedding near-dup (plans/dedup_plans.py).

The ±1 hyperplane entries derive from md5 parity at import (hashlib),
so both engines embed the SAME literals: no RNG, no engine hash. The
signed dot folds in array order on both engines (functions/vectors.py
convention) — bucket-boundary sign tests are bit-identical.

``adaptive_n_planes`` makes the bucket count grow with the corpus:
the smallest p with N <= target * 2^p, computed with pure integer
comparisons (no log/ceil float boundary hazards), so per-bucket
occupancy — and therefore any per-bucket quadratic stage — stays
bounded as the corpus scales. This is the static-oracle-checkable
twin of the learned re-cell knob (operators/clustering.assign_cells).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from .colcache import memoize_when_keyable

MAX_PLANES = 16
DIM = 64


def _plane(j: int) -> list[int]:
    """±1 hyperplane entries from md5 parity — same ints both engines."""
    return [
        1
        if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) % 2
        else -1
        for i in range(DIM)
    ]


PLANES = [_plane(j) for j in range(MAX_PLANES)]


def adaptive_n_planes(n_rows: int, target: int) -> int:
    """Plane count so that ~``target`` rows share a bucket: the number
    of doublings of ``target`` that still fall short of ``n_rows``.
    Integer-only; mirror in SQL as a SUM of CASE comparisons."""
    return sum(1 for p in range(MAX_PLANES) if n_rows > target << p)


@memoize_when_keyable
def bucket_col(vec: Column | str, n_planes: int) -> Column:
    """LSH bucket id from the first ``n_planes`` sign bits (0 planes ->
    constant bucket 0, the single-cell degenerate case)."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    acc: Column = F.lit(0)
    for j in range(n_planes):
        signed = F.zip_with(
            vec,
            F.array(*[F.lit(s) for s in PLANES[j]]),
            lambda x, s: x.cast("double") * s.cast("double"),
        )
        d = F.aggregate(signed, F.lit(0.0), lambda a, v: a + v)
        acc = acc + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc.cast("long")


def _duck_dot(tbl: str, j: int) -> str:
    """DuckDB signed dot of ``tbl.embedding`` with plane ``j`` — the
    single source for the fold shape both bucket renderers share."""
    lst = "list_value(" + ", ".join(str(s) for s in PLANES[j]) + ")"
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> {tbl}.embedding[i]::DOUBLE * ({lst})[i]::DOUBLE), "
        "(x, y) -> x + y)"
    )


def duck_bucket(tbl: str, n_planes: int) -> str:
    """DuckDB twin of ``bucket_col`` with a literal plane count."""
    if n_planes == 0:
        return "0"
    terms = [
        f"(CASE WHEN {_duck_dot(tbl, j)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    ]
    return "(" + " + ".join(terms) + ")"


def duck_bucket_masked(tbl: str, np_expr: str) -> str:
    """DuckDB bucket using the first ``np_expr`` planes, where
    ``np_expr`` is a SQL expression (e.g. a scalar-subquery column) —
    all MAX_PLANES terms are emitted and masked by the plane count, so
    the plane set never depends on data while the bucket width does."""
    terms = [
        f"(CASE WHEN {j} < {np_expr} AND {_duck_dot(tbl, j)} > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(MAX_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"
