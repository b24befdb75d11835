"""Leakage-safe train/val/test splitting over near-dup clusters.

A training pipeline that hashes each document independently into
train/val/test leaks: near-duplicate documents (the pairs the dedup
stack finds) land on different sides of the split, and the model is
evaluated on paraphrases of its training data.  The fix is to hash the
**cluster**, not the document: resolve near-dup pairs into connected
components (``operators/components.py``), key every document by its
component id (singletons key by themselves), and derive the split from
a deterministic content hash of that cluster key.  Every member of a
cluster then lands in the same split by construction.

Scale shape (100 TB): the component table holds only documents that
appear in some near-dup pair (tiny vs the corpus); the left join back
to the corpus is an equi-join AQE can broadcast when small, and the
split assignment itself is a map-side hash expression — no shuffle
beyond the join.  The same md5-bucket hash as the budget sampler
(``operators/budget.py``) keeps assignment reproducible across runs,
engines, and cluster sizes — no ``rand()`` anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_h32
from .components import connected_components

HASH_BUCKETS = 1_000_000


def hash_bucket(c: Column) -> Column:
    """md5-bucket in [0, HASH_BUCKETS) — ``operators/budget.py`` twin;
    the hash itself is the repo-wide ``functions/hashing.md5_h32``
    (DuckDB rendering: ``md5_h32_sql(x) % HASH_BUCKETS``)."""
    return md5_h32(c) % HASH_BUCKETS


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, cumulative-bucket-threshold) pairs; the last split takes
    the remainder.  Computed driver-side in Python so both engines
    consume identical integer literals."""
    items = list(fractions.items())
    if not items:
        raise ValueError("need at least one split")
    for name, frac in items:
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"fraction {name}={frac} outside (0, 1]")
    total = sum(f for _, f in items)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    out: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in items[:-1]:
        acc += frac
        out.append((name, int(round(acc * HASH_BUCKETS))))
    out.append((items[-1][0], HASH_BUCKETS))
    # a fraction below ~1/HASH_BUCKETS (or two cumulative sums rounding
    # to the same bucket) would silently make an always-empty split —
    # fail loudly instead
    thresholds = [0] + [t for _, t in out]
    for (name, _), lo, hi in zip(items, thresholds, thresholds[1:]):
        if hi <= lo:
            raise ValueError(
                f"split {name!r} has zero-width bucket range "
                f"[{lo}, {hi}) — fraction too small for "
                f"HASH_BUCKETS={HASH_BUCKETS}"
            )
    return out


def split_col(key: Column, fractions: dict[str, float]) -> Column:
    """Deterministic split name for ``key`` (insertion order of
    ``fractions`` defines the bucket layout)."""
    thresholds = split_thresholds(fractions)
    b = hash_bucket(key)
    expr = None
    for name, thr in thresholds[:-1]:
        cond = b < thr
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = thresholds[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def assign_leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """``docs`` + (cluster_key, split, naive_split).

    ``cluster_key`` is the connected-component id of the near-dup
    graph (the doc's own id for singletons); ``split`` hashes the
    cluster key (leakage-safe); ``naive_split`` hashes the document id
    (the broken baseline, kept for auditing — see
    :func:`leaky_cluster_count`).
    """
    comp = connected_components(pairs, src=src, dst=dst)
    joined = docs.join(
        comp, docs[id_col] == comp["node"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(comp["component"], docs[id_col]).alias("cluster_key"),
    )
    return joined.select(
        "*",
        split_col(F.col("cluster_key"), fractions).alias("split"),
        split_col(F.col(id_col), fractions).alias("naive_split"),
    )


def update_splits(
    old_assigned: DataFrame,
    all_docs: DataFrame,
    new_pairs: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Incrementally maintain the split manifest for a new ingest batch.

    ``old_assigned`` is the persisted manifest (``id_col``,
    ``cluster_key``, ...); ``all_docs`` is the full corpus after the
    batch; ``new_pairs`` are the near-dup edges the incremental index
    produced for the batch (new-new and new-old).  Instead of
    re-running components over every historical edge, each new edge's
    endpoints are first COLLAPSED through the old manifest (an
    endpoint is replaced by its old cluster key; unseen docs stand for
    themselves), and components run only on that collapsed edge set —
    work proportional to the batch, not the corpus.

    Equivalence contract (pinned by ``tests/test_splits.py``): the
    result equals ``assign_leakage_safe_splits`` over the union of all
    edges, because collapsing a component to its minimum id preserves
    the minimum under further merging.  Split STABILITY follows from
    the same property: with monotonically increasing doc ids, a new
    batch can never lower an existing cluster's key unless the new
    edges merge two OLD clusters — exactly the case where re-keying
    (and re-splitting) one side is REQUIRED to keep the no-leakage
    invariant.
    """
    old_key = old_assigned.select(
        F.col(id_col).alias("_n"), F.col("cluster_key").alias("_k")
    )

    def collapse(edge_col: str) -> Column:
        return F.coalesce(F.col("_k"), F.col(edge_col))

    e = (
        new_pairs.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .join(old_key.withColumnRenamed("_n", "eu"), "eu", "left")
        .select(collapse("eu").alias("u"), "ev")
        .join(old_key.withColumnRenamed("_n", "ev"), "ev", "left")
        .select("u", collapse("ev").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    comp = connected_components(e, src="u", dst="v")
    base = all_docs.join(
        old_key.withColumnRenamed("_n", id_col), id_col, "left"
    ).select(
        *[all_docs[c] for c in all_docs.columns],
        F.coalesce(F.col("_k"), all_docs[id_col]).alias("_base_key"),
    )
    rekeyed = base.join(
        comp.withColumnRenamed("node", "_base_key"), "_base_key", "left"
    ).select(
        *[F.col(c) for c in all_docs.columns],
        F.coalesce(F.col("component"), F.col("_base_key")).alias(
            "cluster_key"
        ),
    )
    return rekeyed.select(
        "*",
        split_col(F.col("cluster_key"), fractions).alias("split"),
        split_col(F.col(id_col), fractions).alias("naive_split"),
    )


def leaky_cluster_count(
    assigned: DataFrame,
    *,
    cluster_col: str = "cluster_key",
    split: str = "split",
    out_col: str = "leaky_clusters",
) -> DataFrame:
    """1-row count of clusters whose members span >1 split.

    Zero for the cluster-hashed split BY CONSTRUCTION (the split is a
    function of the cluster key); typically positive for the naive
    per-doc hash — the measured difference is the leak the safe
    assignment closes.
    """
    return (
        assigned.groupBy(cluster_col)
        .agg(F.count_distinct(split).alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias(out_col))
    )
