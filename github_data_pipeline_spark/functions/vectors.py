"""Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns.

Higher-order functions (``zip_with`` + ``aggregate``) keep the math inside
Catalyst — no Python round trip — and fold in array order, which is
deterministic across partitionings (unlike a shuffled SUM of doubles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))
