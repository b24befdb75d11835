"""Benchmark decontamination — flag training documents that overlap an
evaluation set, the gate every serious pretraining pipeline runs before
the near-dup stage ships data to training.

Semantics (the widely published n-gram-overlap recipe): a corpus doc is
CONTAMINATED when it shares at least ``min_hits`` distinct word n-gram
shingles with any single benchmark doc. The corpus side reuses the
exact shingling the dedup stages use (operators/neardup.doc_shingles),
so one shingle pass can feed both checks.

Scale shape: benchmarks are small (thousands of docs) next to a 100 TB
corpus, so the benchmark shingle set BROADCASTS (bounded by the
benchmark contract, not the corpus) and the overlap join is map-side —
the corpus shuffles once on (doc_id, bench_id) to count hits, carrying
only hashed longs, never text. The corpus is never collected, and the
contaminated set broadcasts back as the anti-join side only under a
size gate on its exact materialized count (worst case it is
corpus-linear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hints import broadcast_if_bounded
from .neardup import doc_shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """(doc_id, bench_id, hits) for every corpus/benchmark doc pair
    sharing >= ``min_hits`` distinct n-gram shingles.

    ``corpus`` and ``benchmark`` both need (doc_id, text); the
    benchmark's id is returned as ``bench_id``.
    """
    corpus_sh = doc_shingles(corpus, n)
    bench_sh = doc_shingles(benchmark, n).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Corpus minus contaminated docs.

    The contaminated-id set is usually tiny (docs overlapping the
    bounded benchmark) but is worst-case corpus-linear — a benchmark
    scraped from the same web slice can contaminate a large corpus
    fraction — so its anti-join hint is size-gated on the exact count
    of the materialized set rather than forced; over the bound the
    doc_id-keyed anti-join degrades to a scalable shuffle."""
    contaminated = (
        contamination_report(corpus, benchmark, n, min_hits)
        .select("doc_id")
        .distinct()
        .localCheckpoint()
    )
    return corpus.join(
        broadcast_if_bounded(contaminated, contaminated.count()),
        "doc_id",
        "left_anti",
    )
