"""As-of join — a custom temporal operator composed from Spark
primitives (SURVEY §7: operators the reference lacks, built as
compositions when semantics allow).

For each left row, attach the latest right row with
``right.ts <= left.ts`` sharing the key. Implemented with the
union-merge trick: tag both sides, union, and carry the last right
value forward with a running-window ``last(ignorenulls)`` over
(key, ts). One shuffle on the key, no range cross-join, no
per-row lookup — the shape that scales to 100 TB event streams
(and the same algorithm backtest/tick-data engines use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left rows + latest right values as of each left timestamp.

    Ties (equal ts on both sides) resolve right-before-left, matching
    the usual as-of convention (a quote at trade time is visible).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    ).select(*lcols, "_side", *[f"_r_{c}" for c in right_value_cols])

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (_side=0) sort before left rows at equal ts
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + suffix)
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
