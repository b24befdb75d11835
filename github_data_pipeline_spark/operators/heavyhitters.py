"""Exact distributed heavy hitters: per-partition Misra-Gries candidate
cut + exact recount of the survivors.

The canonical 100-TB top-by-frequency shape. A plain
``GROUP BY token`` shuffles the FULL token stream — at 10^13 tokens
that exchange dominates the job even though the answer is a handful of
rows. The two-pass algorithm bounds the shuffle by the ANSWER size
instead:

1. **Candidate pass** — each partition folds its token stream through
   a Misra-Gries summary of ``k`` counters (mergeable-summaries form:
   exact batch counts merged in, then the (k+1)-st largest value
   subtracted from all and non-positives dropped — Agarwal et al.,
   "Mergeable Summaries", PODS'12). Nothing shuffles; each task emits
   at most ``k`` candidate tokens plus one processed-count sentinel.
   Guarantee: any token whose GLOBAL count exceeds N/(k+1) survives in
   at least one partition's summary (if it were dropped everywhere,
   its count would be at most sum_p n_p/(k+1) = N/(k+1)).
2. **Exact recount** — the candidate set (at most k x partitions rows,
   counted exactly after materialization) broadcast-semi-joins the
   re-scanned token stream, so only candidate tokens are aggregated;
   the final threshold ``count * (k+1) > N`` keeps exactly the true
   heavy hitters. False candidates are recounted exactly and filtered
   out, so the OUTPUT is deterministic and partitioning-independent
   even though the candidate SET is not.

The Misra-Gries fold is inherently stateful-imperative, so it runs as
an Arrow-batched ``mapInPandas`` stage (documented in
tools/plan_audit.py PYTHON_BY_DESIGN) — per batch it is one pandas
``value_counts`` + an O(k log k) shrink, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of the candidate pass. ``token`` NULL marks the
#: per-partition processed-count sentinel (so N rides the same pass
#: instead of a third corpus scan).
CANDIDATE_SCHEMA = "token string, cnt long"


def _mg_merge_shrink(counters: dict[str, int], k: int) -> None:
    """Shrink ``counters`` to at most ``k`` entries by subtracting the
    (k+1)-st largest count from all and dropping non-positives — the
    mergeable-summaries reduce that preserves the N/(k+1) error bound."""
    if len(counters) <= k:
        return
    vals = sorted(counters.values(), reverse=True)
    sub = vals[k]  # (k+1)-st largest
    for t in list(counters):
        c = counters[t] - sub
        if c > 0:
            counters[t] = c
        else:
            del counters[t]


def misra_gries_candidates(tokens: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``tokens`` (a one-column
    string DataFrame named ``token``): at most ``k`` candidate rows per
    partition plus one NULL-token sentinel carrying the partition's
    processed count."""
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        n = 0
        for b in batches:
            col = b["token"]
            n += len(col)
            for tok, c in col.value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            _mg_merge_shrink(counters, k)
        yield pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [n],
            }
        )

    return tokens.mapInPandas(summarize, schema=CANDIDATE_SCHEMA)
