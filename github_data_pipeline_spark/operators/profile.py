"""One-pass column profiling — the data-quality audit step a 100 TB
ingest runs before publishing a table (null explosions, collapsed
cardinality, and out-of-range values are cheaper to catch here than in
a downstream training run).

Everything is computed in a SINGLE aggregate over one scan: per column
``count / nulls / approx distinct / min / max``, then unpivoted to one
row per column with ``stack``. No shuffle at all on the data — a global
aggregate is a partial-agg + 1-row exchange; approximate distinct uses
HLL++ so the state per column is constant-size regardless of input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# complex types: min/max are meaningless, profile presence/cardinality only
_ORDERED_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
    "string",
    "date",
    "timestamp",
    "boolean",
)


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats: (column, dtype, rows, non_null, null_fraction,
    approx_distinct, min, max) — min/max stringified so heterogeneous
    column types fit one result schema (null for complex types)."""
    dtypes = dict(df.dtypes)
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        ordered = dtypes[c].startswith(_ORDERED_PREFIXES)
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.approx_count_distinct(c).alias(f"_ad_{c}"),
            (F.min(c).cast("string") if ordered else F.lit(None).cast("string")).alias(
                f"_min_{c}"
            ),
            (F.max(c).cast("string") if ordered else F.lit(None).cast("string")).alias(
                f"_max_{c}"
            ),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', `_nn_{c}`, `_ad_{c}`, `_min_{c}`, `_max_{c}`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column, dtype, non_null, approx_distinct, min, max)"
        ),
        F.col("_rows").alias("rows"),
    ).select(
        "column",
        "dtype",
        "rows",
        "non_null",
        F.when(F.col("rows") > 0, (F.col("rows") - F.col("non_null")) / F.col("rows"))
        .otherwise(F.lit(0.0))
        .alias("null_fraction"),
        "approx_distinct",
        "min",
        "max",
    )


def drift_report(
    baseline: DataFrame, fresh: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Schema/stat drift between two snapshots of the same table:
    joins the two profiles on column name and surfaces dtype changes,
    null-fraction movement, and cardinality ratio. Columns present in
    only one side appear with nulls on the other — an add/drop signal.
    """
    b = profile(baseline, columns).select(
        "column",
        F.col("dtype").alias("dtype_base"),
        F.col("null_fraction").alias("null_fraction_base"),
        F.col("approx_distinct").alias("approx_distinct_base"),
    )
    f = profile(fresh, columns).select(
        "column",
        F.col("dtype").alias("dtype_fresh"),
        F.col("null_fraction").alias("null_fraction_fresh"),
        F.col("approx_distinct").alias("approx_distinct_fresh"),
    )
    return (
        b.join(f, "column", "full_outer")
        .select(
            "column",
            "dtype_base",
            "dtype_fresh",
            (F.col("dtype_base") != F.col("dtype_fresh")).alias("dtype_changed"),
            "null_fraction_base",
            "null_fraction_fresh",
            (F.col("approx_distinct_fresh") / F.nullif(
                F.col("approx_distinct_base"), F.lit(0)
            )).alias("cardinality_ratio"),
        )
        .orderBy("column")
    )
