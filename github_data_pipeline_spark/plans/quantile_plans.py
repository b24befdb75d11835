"""Exact grouped quantiles — the sort-based counterpart of the KMV
sketch (``kmv_sketch_stats``): ``percentile_disc`` picks an actual
data element (no interpolation, no doubles), so the result is
hash-exact across engines and the operator contrast is explicit —
exact-but-shuffles-the-column vs mergeable-O(k)-sketch.

Spark executes inverse-distribution functions with a partial
TypedImperativeAggregate (per-group sorted buffers merged on the
reduce side), not a global sort; DuckDB runs its own quantile_disc.
Both implement the ANSI PERCENTILE_DISC convention (smallest element
with cumulative distribution >= q), verified element-identical here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

QUANTILES = (50, 90, 99)


def _disc(q: int) -> str:
    return (
        f"CAST(percentile_disc({q / 100}) WITHIN GROUP (ORDER BY n_chars)"
        f" AS BIGINT) AS p{q}_chars"
    )


@_add(
    "doc_length_percentiles",
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           {", ".join(_disc(q) for q in QUANTILES)}
    FROM documents
    GROUP BY source
    """,
    doc="Exact per-source length percentiles via ANSI percentile_disc "
    "(p50/p90/p99 of n_chars) — the exact twin of the KMV sketch "
    "quantiles in kmv_sketch_stats. percentile_disc returns an actual "
    "element, so no interpolated doubles cross the hash comparison. "
    "At 100 TB the exact path shuffles every (source, n_chars) pair "
    "into per-group sort buffers, which is why the sketch exists; "
    "this query IS the documented trade-off, and the projection "
    "carries only the 2 needed columns to the exchange.",
    tags=("documents", "quantile"),
)
def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    aggs = [F.count(F.lit(1)).alias("docs")] + [
        F.expr(
            f"percentile_disc({q / 100}) WITHIN GROUP (ORDER BY n_chars)"
        )
        .cast("long")
        .alias(f"p{q}_chars")
        for q in QUANTILES
    ]
    return d.groupBy("source").agg(*aggs)
