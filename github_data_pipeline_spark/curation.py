"""The end-to-end training-data curation funnel over ``documents``:

    raw -> clean (line-dedup + normalize) -> language gate
        -> quality gate -> repetition gate -> near-dup drop
        -> budget sample

Each stage is one of the engine's first-class operators (functions/
text.py, operators/neardup.py, operators/budget.py, plans/dedup
semantics); this module composes them into the single DataFrame
pipeline a training-data team actually runs, plus a funnel report of
per-stage survivors. Everything stays declarative: the only shuffles
are the near-dup stage's (shingle + band join); every gate before it
is a map-side filter that Catalyst pushes toward the scan.

At 100 TB each arrow is the same plan — the gates filter before the
expensive dedup so the shingle shuffle sees only surviving docs, and
the final sample is a hash predicate, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import text as T
from .operators.budget import budget_sample
from .operators.components import connected_components
from .operators.hints import broadcast_if_bounded
from .operators.neardup import (
    band_index,
    lsh_candidates,
    minhash_signatures_from_arrays,
)

JACCARD_KEEP_NUM, JACCARD_KEEP_DEN = 4, 5  # drop pairs with jaccard >= 0.8


def clean_stage(docs: DataFrame) -> DataFrame:
    """Normalize text; keep non-empty. Duplicate-line removal runs
    FIRST (clean_text's whitespace collapse erases newlines, so line
    structure only exists here)."""
    out = docs.withColumn("text", T.clean_text(T.dedupe_lines("text")))
    return out.filter(F.length("text") > 0)


def repetition_stage(docs: DataFrame, n: int = 2, max_frac: float = 0.2) -> DataFrame:
    """Drop looping documents: a single n-gram accounting for more than
    ``max_frac`` of the doc's n-gram occurrences marks generated/
    boilerplate text (C4-style intra-doc repetition gate). Map-side
    array fold — no shuffle."""
    return docs.filter(
        T.max_ngram_repetition(T.tokens("text"), n) <= max_frac
    )


def language_stage(docs: DataFrame, lang: str = "en") -> DataFrame:
    """Keep docs whose marker-argmax language matches ``lang``."""
    return docs.filter(T.lang_id(T.tokens("text")) == lang)


def quality_stage(
    docs: DataFrame, min_tokens: int = 20, max_tokens: int = 400
) -> DataFrame:
    """Length window + stopword-ratio gate (exact integer ratio test)."""
    toks = T.tokens("text")
    token_cnt = F.size(toks)
    stop_hits = T.stopword_hits(toks)
    return docs.filter(
        token_cnt.between(min_tokens, max_tokens)
        & (stop_hits * 10 >= token_cnt)
    )


def neardup_drop_stage(docs: DataFrame) -> DataFrame:
    """Keep one canonical doc per near-dup CLUSTER.

    LSH candidates first (band equi-join), exact shingle-set Jaccard
    only on candidates; verified pairs are then resolved into
    connected components so the keeper is the smallest id of each
    transitive cluster — pairwise drop rules over-drop on chains
    (A~B, B~C but not A~C would lose C's only survivor B).

    Both the candidate-pair table and the dropped-id table grow
    LINEARLY with the corpus (RefinedWeb-class near-dup drop rates are
    tens of percent — nothing here is "tiny relative to the corpus" at
    the 100-TB design point), so their broadcast hints are size-gated
    on exact counts of the already-materialized tables: under the
    bound the joins stay map-side, over it they degrade to doc_id-keyed
    shuffle joins that scale (AQE re-broadcasts at runtime if small).
    """
    grams = docs.select(
        "doc_id",
        F.array_distinct(T.word_ngrams(T.tokens("text"), 3)).alias("g"),
    )
    cands = lsh_candidates(
        band_index(minhash_signatures_from_arrays(grams))
    ).localCheckpoint()
    n_cands = cands.count()
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    shared = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size("ga") + F.size("gb") - shared
    verified = (
        ga.join(broadcast_if_bounded(cands, n_cands), "doc_a")
        .join(gb, "doc_b")
        .filter(shared * JACCARD_KEEP_DEN >= union * JACCARD_KEEP_NUM)
        .select("doc_a", "doc_b")
    )
    dups = (
        connected_components(verified)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
        .localCheckpoint()
    )
    n_dups = dups.count()
    return docs.join(
        broadcast_if_bounded(dups, n_dups), "doc_id", "left_anti"
    )


def curate(
    docs: DataFrame,
    lang: str = "en",
    sample_rates: dict[str, float] | None = None,
) -> tuple[DataFrame, list[tuple[str, DataFrame]]]:
    """Run the full funnel; returns (final_docs, named stage outputs)."""
    stages: list[tuple[str, DataFrame]] = [("raw", docs)]
    cur = clean_stage(docs)
    stages.append(("cleaned_nonempty", cur))
    cur = language_stage(cur, lang)
    stages.append(("language", cur))
    cur = quality_stage(cur)
    stages.append(("quality", cur))
    cur = repetition_stage(cur)
    stages.append(("repetition", cur))
    cur = neardup_drop_stage(cur)
    stages.append(("neardup_dropped", cur))
    if sample_rates is not None:
        cur = budget_sample(cur, sample_rates)
        stages.append(("budget_sample", cur))
    return cur, stages


def funnel_report(stages: list[tuple[str, DataFrame]]) -> list[tuple[str, int]]:
    """Per-stage survivor counts (one job per stage; report-only path)."""
    return [(name, df.count()) for name, df in stages]
