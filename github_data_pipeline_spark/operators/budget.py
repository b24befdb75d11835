"""Training-mix budget allocation: turn a global token budget plus
per-source mixture weights into deterministic per-source sampling
rates, applied with content-hash sampling.

The curation step between corpus stats and the tokenizer: "2T tokens,
40% web / 30% code / 30% books" becomes per-source keep-rates, then a
reproducible doc-level sample. Rates are computed on the per-source
aggregate (|sources| rows — tiny, collected to the driver by design);
the doc-level filter is a map-side hash predicate, so the scan
parallelizes and pushes down like any filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_h32

HASH_BUCKETS = 1_000_000


def allocation_rates(
    per_source_tokens: dict[str, int],
    weights: dict[str, float],
    token_budget: int,
) -> dict[str, float]:
    """Per-source keep-rate for a weighted token budget.

    ``rate[s] = min(1, budget * weight[s] / tokens[s])`` — a source
    smaller than its share is taken whole (the shortfall is NOT
    redistributed: deterministic, and under-sampling beats silently
    over-weighting another source). Weights are normalized first.
    """
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    rates: dict[str, float] = {}
    for source, tokens in per_source_tokens.items():
        w = weights.get(source, 0.0) / wsum
        target = token_budget * w
        rates[source] = 1.0 if tokens <= 0 else min(1.0, target / tokens)
    return rates


def budget_sample(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Apply per-source keep-rates with deterministic content-hash
    sampling: keep iff md5-bucket(doc_id) < rate * buckets. Identical
    doc sets on every run/engine/cluster size (unlike rand()), and the
    predicate is a map-side filter — no shuffle.
    """
    bucket = md5_h32(F.col(id_col)) % HASH_BUCKETS
    threshold = F.create_map(
        *[
            x
            for source, rate in sorted(rates.items())
            for x in (F.lit(source), F.lit(int(round(rate * HASH_BUCKETS))))
        ]
    )[F.col(source_col)]
    return docs.filter(bucket < F.coalesce(threshold, F.lit(0)))
