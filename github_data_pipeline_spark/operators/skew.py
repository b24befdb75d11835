"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime; explicit salting remains the tool when one key
dominates so hard that even split partitions bottleneck, or when the
engine must join skewed data under a fixed partitioning (e.g. inside
streaming state). Semantics are unchanged: the salted join returns
exactly the rows of the unsalted join.

Shape: the big (skewed) side gets a uniform random salt in [0, n);
the small side is replicated n times with every salt value; the join
key becomes (key, salt), spreading each hot key over n reducers at
the cost of n-fold replication of the small side — the classic
space-for-balance trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the hot side salted over ``buckets`` reducers.

    ``how`` must preserve big-side semantics ('inner' or 'left'):
    the small side's rows are replicated, so right/full joins would
    multiply unmatched right rows and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        SALT_COL, (F.rand(seed) * buckets).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias(SALT_COL)
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [*keys, SALT_COL], how)
    return joined.drop(SALT_COL)


def key_frequencies(df: DataFrame, on: list[str] | str, top: int = 20):
    """Hot-key census — the decision input for salting/broadcast: the
    top-N join-key frequencies as (key..., rows)."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.desc("rows"), *[F.asc(k) for k in keys])
        .limit(top)
    )
