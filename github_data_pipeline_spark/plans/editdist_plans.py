"""Edit-distance near-dup verification as an oracle-checked query
(upgrades ``operators/neardup.verify_candidates_edit_distance`` from
unit-pinned to driver-checkable).

Both engines ship a native Levenshtein (Spark ``levenshtein`` with
the thresholded O(len*k) early-abandon form; DuckDB ``levenshtein``)
with identical unit-cost semantics, so distances hash-compare
exactly.  The input contract matters at 100 TB and is preserved here:
the exact stage runs ONLY over the routed candidate pair set (the
persisted near-dup pair artifact — pairs already verified Jaccard
>= 0.8), never all pairs; the DuckDB oracle re-derives the same pair
set from scratch via the shingle pipeline CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .core import REGISTRY
from .dedup_plans import verified_pair_artifact

_add = REGISTRY.add

MAX_EDIT_DIST = 6  # non-vacuous on the fixture: 24 pairs pass, 1 rejected


def _oracle() -> str:
    pairs_sql = REGISTRY["neardup_jaccard_pairs"].oracle
    return f"""
    WITH base AS ({pairs_sql})
    SELECT base.doc_a, base.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance
    FROM base
    JOIN documents da ON da.doc_id = base.doc_a
    JOIN documents db ON db.doc_id = base.doc_b
    WHERE levenshtein(da.text, db.text) <= {MAX_EDIT_DIST}
    """


@_add(
    "neardup_editdist_pairs",
    _oracle(),
    doc="Exact edit-distance verification over the routed near-dup "
    "candidate set: each persisted verified pair (Jaccard >= 0.8, "
    "read from the pair artifact — plans/dedup_plans."
    "verified_pair_artifact) gets its exact Levenshtein distance, "
    "kept when <= 6 (non-vacuous: 24 of 25 fixture pairs pass, one "
    "distance-8 pair is rejected). Spark uses the THRESHOLDED "
    "levenshtein(a, b, k) built-in — O(len*k) early abandon instead "
    "of the O(len^2) matrix — plus a length prefilter that rides the "
    "id join for free; the oracle re-derives the same pair set from "
    "scratch and computes the full distance. Never runs on all "
    "pairs: the candidate contract is what keeps the exact stage "
    "linear at 100 TB.",
    tags=("documents", "dedup", "editdist"),
)
def neardup_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.neardup import verify_candidates_edit_distance

    cands = verified_pair_artifact(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    return verify_candidates_edit_distance(
        cands, docs, max_dist=MAX_EDIT_DIST
    )
