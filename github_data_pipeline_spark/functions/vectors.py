"""Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns.

Higher-order functions (``zip_with`` + ``aggregate``) keep the math inside
Catalyst — no Python round trip — and fold in array order, which is
deterministic across partitionings (unlike a shuffled SUM of doubles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .colcache import memoize_when_keyable


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


@memoize_when_keyable
def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


@memoize_when_keyable
def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


@memoize_when_keyable
def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@memoize_when_keyable
def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v))


# --- quantization (the ANN memory-scale path) ---------------------------


@memoize_when_keyable
def quantize_int8(v: Column | str) -> Column:
    """Per-vector max-abs int8 quantization: returns a struct
    ``(scale DOUBLE, q ARRAY<TINYINT>)`` with ``x ≈ q * scale``.

    4x memory reduction for embedding columns — the difference between
    an in-memory IVF probe and spilling at 100 TB. Pure codegen
    (transform + aggregate), no UDF; symmetric scaling keeps zero
    exact and dequantization a single multiply.
    """
    col = _col(v)
    maxabs = F.aggregate(
        col,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(maxabs > 0.0, maxabs / 127.0).otherwise(F.lit(1.0))
    q = F.transform(
        col, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qv: Column | str) -> Column:
    """Inverse of quantize_int8: ARRAY<DOUBLE> ≈ the original vector."""
    col = _col(qv)
    return F.transform(
        col.getField("q"),
        lambda x: x.cast("double") * col.getField("scale"),
    )
