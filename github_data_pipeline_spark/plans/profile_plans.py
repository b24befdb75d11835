"""Corpus profile via CUBE grouping sets (round 8).

``orders_rollup`` covers the ROLLUP hierarchy; CUBE is the other
grouping-sets lowering — all 2^k dimension subsets in ONE Expand +
one shuffle, the shape a corpus dashboard (per-source, per-language,
per-cell, grand total) wants without four separate scans. The Expand
multiplies the stream 4x by construction — that IS the semantics
(contrast with the accidental EXPAND of mixing COUNT(DISTINCT) into a
multi-aggregate, the r7 approx-stats incident) — and the aggregate
state stays bounded by |sources| x |langs| cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY


@REGISTRY.add(
    "doc_source_lang_cube",
    """
    SELECT
      COALESCE(source, 'ALL') AS source,
      COALESCE(lang, 'ALL') AS lang,
      CAST(COUNT(*) AS BIGINT) AS docs,
      CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY CUBE (source, lang)
    ORDER BY source ASC, lang ASC
    """,
    doc="Corpus profile over ALL 2^2 grouping sets — per (source, "
    "lang) cell, per source, per lang, and the grand total — in one "
    "CUBE aggregation: one Expand (the deliberate 4x of grouping "
    "sets), one shuffle, state bounded by the dimension-cell count. "
    "The one-scan replacement for the four separate profile scans a "
    "mixture dashboard would otherwise run. COALESCE folds grouping "
    "nulls into stable 'ALL' labels for the oracle (no fixture value "
    "collides).",
    tags=("agg", "cube", "profile", "curation"),
)
def doc_source_lang_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.cube("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            "docs",
            "chars",
        )
        .orderBy(F.asc("source"), F.asc("lang"))
    )
