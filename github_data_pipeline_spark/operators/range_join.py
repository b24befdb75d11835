"""Binned range (interval) join — a custom temporal operator composed
from Spark primitives (SURVEY §7 class: operators the reference lacks,
built as compositions when semantics allow; sibling of
``operators/asof.py``).

For each left row carrying a time interval ``(start, end]``, match
every right row with the same key whose timestamp falls inside the
interval.  A naive ``left JOIN right ON key AND ts BETWEEN ...`` makes
Spark equi-join on the key alone and apply the range predicate as a
post-join filter — one hot key (a bot user, a mega-repo) turns that
join group into an O(n_left x n_right) quadratic straggler, the exact
shape that killed the round-4 streaming attribution join at 30x skew
before it was salted.

The scalable composition bins the time axis into buckets of fixed
width and joins on the COMPOSITE key ``(key, bucket)``:

* each right row lands in exactly one bucket (``floor(epoch / w)``);
* each left interval explodes to the (few) buckets it overlaps —
  ``ceil(interval / w) + 1`` rows, a compile-time constant fan-out;
* the exact interval predicate then filters the candidates, so
  bucketing is pure candidate generation and never changes results.

A hot key is thereby sliced into per-time-window join groups: the
worst task handles one key x one bucket, not one key x all time.
Choose ``bucket_width_sec`` ~ the interval length (fan-out 2) unless
intervals vary wildly.  This is the standard binned range-join
rewrite (Spark's own range-join hints on Databricks, DuckDB's IEJoin
paper discuss the same family); at 100 TB the shuffle carries each
left row twice and each right row once — linear, skew-bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_candidates(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_width_sec: int,
    closed: str = "right",
) -> DataFrame:
    """Inner range join: left rows x right rows with ``right_ts`` in
    the left interval, same ``key``.

    ``closed`` picks the interval convention: ``"right"`` = match
    ``start < ts <= end`` (the attribution convention — an event AT
    the purchase instant counts, one exactly at window-open does
    not), ``"both"`` = ``start <= ts <= end``.

    Returns all left columns plus the right columns (right's key
    column is dropped; right's ts column must not collide with a left
    column name).  Each matching pair appears exactly once: the right
    row owns a single bucket, so only one exploded left row can meet
    it.
    """
    if closed not in ("right", "both"):
        raise ValueError(f"closed must be 'right' or 'both': {closed!r}")
    w = int(bucket_width_sec)
    if w <= 0:
        raise ValueError("bucket_width_sec must be positive")

    def _bucket(c: Column) -> Column:
        # epoch seconds are positive in every dataset we read, so
        # long-cast truncation == floor; keep it a plain cast to stay
        # inside whole-stage codegen
        return (c.cast("long") / F.lit(w)).cast("long")

    l_exp = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _bucket(F.col(left_start)), _bucket(F.col(left_end))
            )
        ),
    )
    r_tag = right.withColumnRenamed(key, "_rkey").withColumn(
        "_rbkt", _bucket(F.col(right_ts))
    )

    lo = (
        F.col(right_ts) > F.col(left_start)
        if closed == "right"
        else F.col(right_ts) >= F.col(left_start)
    )
    joined = l_exp.join(
        r_tag,
        on=[
            F.col(key) == F.col("_rkey"),
            F.col("_bkt") == F.col("_rbkt"),
        ],
        how="inner",
    )
    return (
        joined.filter(lo & (F.col(right_ts) <= F.col(left_end)))
        .drop("_bkt", "_rbkt", "_rkey")
    )
