"""Registry entry: incremental LSH index maintenance == full recompute.

``operators/neardup.py:233-490`` is the daily-batch near-dup path: keep
the banded MinHash index persisted, and for each new ingest batch
shingle/sign/band ONLY the batch, join it against the stored index, and
append the batch's band rows — the full corpus is never re-shingled,
which is what keeps daily dedup feasible at 100 TB. Until round 11 that
equivalence lived only in ``tests/test_neardup_incremental.py``; this
entry makes it oracle-scored, the same incremental==full pattern as
``kmv_incremental_merge`` (additive sketch IVM),
``incremental_split_update`` (split maintenance) and
``rollup_incremental_merge`` (additive rollups) — applied to the last
IVM face, the non-additive bucketed index.

Two deterministic batches (even doc_ids = the indexed corpus, odd =
today's ingest). Spark runs the INCREMENTAL path: index built from
batch 1 only, ``incremental_lsh_candidates`` for batch 2 (batch-only
banding + the index equi-join + within-batch pairs), output = prior
pairs ∪ incremental pairs with a ``from_increment`` flag. The DuckDB
oracle knows nothing about batches or the incremental algorithm — it
rebuilds the ENTIRE band index from scratch over all documents (the
same md5-derived shingle hashes and affine permutations as the
``minhash_lsh_candidates`` oracle) and derives the flag purely from
the data (a pair is incremental iff it touches an odd doc_id). Cell
equality therefore proves, against an independent engine:

* incremental ∪ prior == full recompute (no pair lost, none invented);
* the incremental path emits EXACTLY the pairs that involve a new doc
  (the flag column matches), i.e. no stale pair is re-emitted and no
  new-doc pair leaks into the prior set.

Scale: the batch side is the only side shingled; the index join is an
equi-join on (band, key) that reads a persisted bucketed index
shuffle-free in production (``persist_band_index``; zero-exchange plan
pinned by tests). The capped star-fallback twin
(``incremental_lsh_candidates_capped``) stays pinned by its
components-equality test — its star edges are deliberately different
from full-build edges, so connectivity, not the edge set, is its
contract and an edge-set oracle would be wrong by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.neardup import (
    band_index,
    doc_shingle_arrays,
    incremental_lsh_candidates,
    lsh_candidates,
    minhash_signatures_from_arrays,
)
from ..sources.tables import load_table, spread
from .core import REGISTRY
from .dedup_plans import _BAND_STRUCTS_SQL, _DUCK_H, _GRAMS, _SIG_COLS_SQL, _TOKS


@REGISTRY.add(
    "lsh_incremental_index",
    f"""
    WITH grams AS (
      SELECT doc_id, {_GRAMS} AS g
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ), ex AS (
      SELECT doc_id, unnest(g) AS s FROM grams
    ), hashed AS (
      SELECT doc_id, {_DUCK_H} AS h FROM ex
    ), sigs AS (
      SELECT doc_id,
      {_SIG_COLS_SQL}
      FROM hashed GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, u.b.band AS band, u.b.key AS key
      FROM sigs, UNNEST([{_BAND_STRUCTS_SQL}]) AS u(b)
    )
    SELECT DISTINCT
           CAST(a.doc_id AS BIGINT) AS doc_a,
           CAST(b.doc_id AS BIGINT) AS doc_b,
           CAST(CASE WHEN a.doc_id % 2 = 1 OR b.doc_id % 2 = 1
                THEN 1 ELSE 0 END AS INT) AS from_increment
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.key = b.key
                AND a.doc_id < b.doc_id
    """,
    doc="Incremental LSH index maintenance proved equal to a full "
    "rebuild, against an engine that never runs the incremental "
    "algorithm: Spark indexes the even-doc_id half of the corpus, "
    "then processes the odd half as a daily ingest batch "
    "(shingle/sign/band ONLY the batch, equi-join against the stored "
    "index, within-batch pairs) and emits prior ∪ incremental "
    "candidates flagged by origin; the DuckDB oracle rebuilds the "
    "whole band index from scratch and derives the flag from the "
    "data alone (a pair is incremental iff it touches an odd id). "
    "Cell equality pins both IVM contracts at once — no pair lost or "
    "invented, and the increment emits exactly the new-doc pairs. "
    "This is the non-additive bucketed face of the incremental-view-"
    "maintenance family (KMV sketches, splits, rollups all have the "
    "same proof in-window); production persists the index bucketed "
    "on (band, key) so the daily join reads it with zero exchanges "
    "(tests/test_neardup_incremental.py pins the plan).",
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def lsh_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    # the stored index: band rows for the already-ingested corpus only
    # (checkpointed — it feeds the prior-pairs grouping AND the
    # incremental equi-join, and is what production persists bucketed)
    index = band_index(
        minhash_signatures_from_arrays(doc_shingle_arrays(corpus))
    ).localCheckpoint()
    prior = lsh_candidates(index).select(
        "doc_a", "doc_b", F.lit(0).cast("int").alias("from_increment")
    )
    inc, _new_bands = incremental_lsh_candidates(batch, index)
    increment = inc.select(
        "doc_a", "doc_b", F.lit(1).cast("int").alias("from_increment")
    )
    # disjoint by construction (prior pairs are even-even; every
    # incremental pair touches an odd id), so the union IS the flagged
    # full candidate set
    return prior.unionByName(increment).select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        "from_increment",
    )
