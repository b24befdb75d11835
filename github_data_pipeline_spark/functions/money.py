"""Exact money arithmetic for hash-stable aggregates.

Doubles summed in different orders (Spark partitions vs a single-threaded
oracle) differ in the last bits, which breaks value-hash comparison and is
also a real reproducibility concern at 100 TB. All monetary inputs in the
testdata are exact 2-decimal values, so we aggregate in integer cents:

    SUM(CAST(ROUND(x * 100) AS BIGINT))   -- exact, order-independent

and divide once at the end. The single final division of identical
integers produces bit-identical doubles on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cents(c: Column | str) -> Column:
    """2-decimal double -> exact integer cents (long)."""
    return F.round(_col(c) * 100).cast("long")


def cents_of(c: Column | str, decimals: int = 2) -> Column:
    """Generalized fixed-point: double -> integer at 10^decimals."""
    return F.round(_col(c) * (10**decimals)).cast("long")


def dollars(c: Column | str, scale: int = 100) -> Column:
    """Integer fixed-point back to double with one exact division."""
    return (_col(c) / F.lit(float(scale))).cast("double")
