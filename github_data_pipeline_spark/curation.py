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


# Gate PREDICATES over a token-array column — the single definition each
# stage filter AND the one-scan funnel report share, so the two paths
# cannot drift.


def language_pred(toks, lang: str = "en"):
    """Marker-argmax language matches ``lang``."""
    return T.lang_id(toks) == lang


def quality_pred(toks, min_tokens: int = 20, max_tokens: int = 400):
    """Length window + stopword-ratio gate (exact integer ratio test)."""
    token_cnt = F.size(toks)
    return token_cnt.between(min_tokens, max_tokens) & (
        T.stopword_hits(toks) * 10 >= token_cnt
    )


def repetition_pred(toks, n: int = 2, max_frac: float = 0.2):
    """A single n-gram accounting for more than ``max_frac`` of the
    doc's n-gram occurrences marks generated/boilerplate text
    (C4-style intra-doc repetition gate). Map-side array fold."""
    return T.max_ngram_repetition(toks, n) <= max_frac


def repetition_stage(docs: DataFrame, n: int = 2, max_frac: float = 0.2) -> DataFrame:
    """Drop looping documents (see :func:`repetition_pred`)."""
    return docs.filter(repetition_pred(T.tokens("text"), n, max_frac))


def language_stage(docs: DataFrame, lang: str = "en") -> DataFrame:
    """Keep docs whose marker-argmax language matches ``lang``."""
    return docs.filter(language_pred(T.tokens("text"), lang))


def quality_stage(
    docs: DataFrame, min_tokens: int = 20, max_tokens: int = 400
) -> DataFrame:
    """Length window + stopword-ratio gate (see :func:`quality_pred`)."""
    return docs.filter(quality_pred(T.tokens("text"), min_tokens, max_tokens))


def neardup_drop_stage(docs: DataFrame, toks_col: str | None = None) -> DataFrame:
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
    # One evaluation of the tokenize + 3-gram + distinct fold: grams
    # feed THREE consumers (signatures, verify side a, verify side b)
    # — uncheckpointed, each re-ran the fold over the full upstream
    # (which in the funnel includes the repetition-gate array fold).
    # Survivor-bounded like the stage's other materializations.
    # When the caller already materialized the token arrays (the funnel
    # checkpoints them on its survivor boundary), read them instead of
    # re-running the tokenizer regex over the survivor text.
    toks = F.col(toks_col) if toks_col else T.tokens("text")
    grams = docs.select(
        "doc_id",
        F.array_distinct(T.word_ngrams(toks, 3)).alias("g"),
    ).localCheckpoint()
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


def materialize_boundary(
    df: DataFrame,
    store: str = "checkpoint",
    scratch_dir: str | None = None,
    name: str = "boundary",
) -> DataFrame:
    """Materialize a pipeline boundary under the caller-chosen storage.

    * ``"checkpoint"`` — ``localCheckpoint``: executor storage memory
      (spilling to local disk). Right at bench SFs; at 100 TB the
      survivor TEXT of a funnel would evict the working set.
    * ``"disk"`` — ``persist(DISK_ONLY)`` + a materializing count:
      executor local disk only, zero storage-memory pressure, still
      lost with the executor.
    * ``"table"`` — parquet scratch round-trip under ``scratch_dir``:
      the production boundary — survives executor loss, readable by
      downstream jobs, and exactly what a real funnel persists between
      its gate and dedup phases. ``scratch_dir`` required.

    All three return a frame with identical rows; the funnel test pins
    that equality.
    """
    if store == "checkpoint":
        return df.localCheckpoint()
    if store == "disk":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()
        return out
    if store == "table":
        if not scratch_dir:
            raise ValueError("store='table' requires scratch_dir")
        import os

        path = os.path.join(scratch_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    raise ValueError(f"unknown boundary store {store!r}")


def funnel_survivor_counts(
    docs: DataFrame,
    lang: str = "en",
    survivor_store: str = "checkpoint",
    scratch_dir: str | None = None,
) -> DataFrame:
    """(stage_idx, stage, survivors): the funnel report as ONE
    DataFrame, built so executing it costs O(gate survivors), not six
    re-runs of the whole funnel.

    A naive report (count each stage of :func:`curate`) re-evaluates
    the cleaning regexes and gate folds once PER STAGE — measured 65 s
    where this shape costs ~6 s at sf0.1. Structure:

    * one corpus scan computes the cleaned text and the cheap gate
      flags (language, quality), checkpointed as a tiny
      (doc_id, lang_ok, qual_ok) table — stage counts 1-3 are sums
      over it, costing nothing more;
    * survivor TEXT is re-derived by semi-joining the survivor ids
      against the raw scan, so the cleaning expressions run a second
      time on gate SURVIVORS only (Catalyst pushes the id join below
      the heavy projection); the expensive repetition fold runs only
      there — the materialized boundary a production funnel persists
      between its gate and dedup phases anyway;
    * the near-dup stage (the usual LSH -> verify -> components) then
      operates entirely on the checkpointed survivor table.

    Gate semantics come from the SAME predicate functions the stage
    filters use (language_pred / quality_pred / repetition_pred), so
    this report and :func:`curate` cannot drift.
    """
    cleaned = clean_stage(docs)
    toks = T.tokens("text")
    flags = cleaned.select(
        "doc_id",
        language_pred(toks, lang).alias("lang_ok"),
        quality_pred(toks).alias("qual_ok"),
    ).localCheckpoint()
    surv_ids = flags.filter(F.col("lang_ok") & F.col("qual_ok")).select(
        "doc_id"
    )
    n_surv = surv_ids.count()
    # clean text recomputed for survivors only: the id semi-join sits
    # below the projection, so the regexes touch |survivors| rows
    # the survivor-TEXT boundary: the one funnel materialization whose
    # size is corpus-scale (gate survivors x full text). Its storage is
    # caller-chosen — localCheckpoint at bench SFs, DISK_ONLY or a
    # parquet scratch table at 100 TB (see materialize_boundary).
    surv = materialize_boundary(
        clean_stage(
            docs.join(
                broadcast_if_bounded(surv_ids, n_surv), "doc_id", "left_semi"
            )
        ).select("doc_id", "text", T.tokens("text").alias("toks")),
        store=survivor_store,
        scratch_dir=scratch_dir,
        name="funnel_survivors",
    )
    # The repetition fold runs ONCE: keep only the surviving ids (a
    # doc_id-only checkpoint, trivially bounded) and re-derive rep by
    # semi-joining the already-checkpointed surv table. Downstream
    # consumers (gram build, keeper anti-join, stage-4 count) would
    # otherwise each re-run the n-gram fold over every survivor.
    rep_ids = (
        surv.filter(repetition_pred(F.col("toks")))
        .select("doc_id")
        .localCheckpoint()
    )
    n_rep = rep_ids.count()
    rep = surv.join(
        broadcast_if_bounded(rep_ids, n_rep), "doc_id", "left_semi"
    ).select("doc_id", "text", "toks")
    kept = neardup_drop_stage(rep, toks_col="toks")

    def row(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("survivors")
        ).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "survivors",
        )

    def flag_row(idx: int, name: str, cond) -> DataFrame:
        return flags.agg(
            F.sum(cond.cast("long")).cast("long").alias("survivors")
        ).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "survivors",
        )

    return (
        row(0, "raw", docs)
        .unionByName(flag_row(1, "cleaned_nonempty", F.lit(True)))
        .unionByName(flag_row(2, "language", F.col("lang_ok")))
        .unionByName(
            flag_row(3, "quality", F.col("lang_ok") & F.col("qual_ok"))
        )
        .unionByName(row(4, "repetition", rep_ids))
        .unionByName(row(5, "neardup_dropped", kept))
        .orderBy(F.asc("stage_idx"))
    )
