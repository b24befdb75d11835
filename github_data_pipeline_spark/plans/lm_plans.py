"""N-gram language-model count tables — the classic small-LM prep
step over a curated corpus (Kneser-Ney smoothing consumes exactly
these statistics: raw n-gram counts plus CONTINUATION counts, i.e.
in how many distinct left contexts a unit appears; Kneser & Ney 1995,
Chen & Goodman 1999).

Spark-first shape: one tokenize + one explode produce the bigram
stream; the count table is a hash aggregation with map-side combine
(the key space is the distinct-bigram vocabulary, far smaller than
the stream, so partial aggregation collapses most of the traffic
before the exchange); the continuation count is a second aggregation
over the DISTINCT (left, right) pairs — derived from the same
grouped table, no second corpus scan. All counts are BIGINTs; the
top-k report is deterministic via count-desc / bigram-asc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.tables import load_table, spread
from .core import REGISTRY

TOP_N = 50

# filtered tokens — phantom-''-token guard, as in repetition_plans
_TOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
    "t -> t <> '')"
)


@REGISTRY.add(
    "lm_bigram_counts",
    f"""
    WITH toks AS (
      SELECT {_TOKS} AS w FROM documents
    ), bi AS (
      SELECT w[i] AS left_tok, w[i+1] AS right_tok
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
    ), counts AS (
      SELECT left_tok, right_tok, COUNT(*) AS c
      FROM bi GROUP BY 1, 2
    ), cont AS (
      SELECT right_tok, COUNT(*) AS continuation
      FROM counts GROUP BY 1
    )
    SELECT counts.left_tok, counts.right_tok,
           CAST(counts.c AS BIGINT) AS bigram_count,
           CAST(cont.continuation AS BIGINT) AS right_continuation
    FROM counts JOIN cont ON counts.right_tok = cont.right_tok
    ORDER BY counts.c DESC, counts.left_tok ASC, counts.right_tok ASC
    LIMIT {TOP_N}
    """,
    doc="Kneser-Ney count tables for a bigram LM: raw bigram counts "
    "plus the right unit's CONTINUATION count (distinct left contexts "
    "it follows — the statistic KN smoothing uses instead of raw "
    "unigram frequency), top-50 with deterministic tie-breaks. One "
    "tokenize + one explode; the count table aggregates with "
    "map-side combine (key space = bigram vocabulary << stream), the "
    "continuation count derives from the grouped table with no "
    "second corpus scan, and the tiny continuation table broadcasts "
    "back onto it.",
    tags=("text", "lm", "ngram"),
)
def lm_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents").select("text"))
    toks = T.tokens(F.lower(F.col("text")))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("left_tok"),
                F.element_at(toks, i + F.lit(1)).alias("right_tok"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<left_tok:string,right_tok:string>>"
    ))
    counts = (
        d.select(F.explode(bigrams).alias("b"))
        .select("b.left_tok", "b.right_tok")
        .groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("bigram_count"))
    )
    cont = counts.groupBy("right_tok").agg(
        F.count(F.lit(1)).alias("right_continuation")
    )
    return (
        counts.join(F.broadcast(cont), "right_tok")
        .select(
            "left_tok",
            "right_tok",
            F.col("bigram_count").cast("long").alias("bigram_count"),
            F.col("right_continuation")
            .cast("long")
            .alias("right_continuation"),
        )
        .orderBy(
            F.desc("bigram_count"), F.asc("left_tok"), F.asc("right_tok")
        )
        .limit(TOP_N)
    )
