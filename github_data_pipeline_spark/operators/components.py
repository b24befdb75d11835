"""Connected components over near-dup candidate pairs — the cluster
resolution step that turns pairwise similarity into an actual dedup
decision: every document in a component keeps exactly one canonical
representative.

Near-dup edges are not transitive (A~B and B~C does not imply A~C
scored above threshold), but production dedup treats the transitive
closure as one cluster — otherwise the keeper choice depends on edge
enumeration order. This is the standard third stage after LSH banding
and exact verification (the reference has no dedup at all; this
extends the pipeline the way SURVEY §2 extends to the LLM-data ops).

Algorithm: iterative min-label propagation, the alternating-star
family of MapReduce connected-components algorithms (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public).
Each round every node adopts the smallest label among itself and its
neighbors; rounds ∝ graph diameter, and near-dup cluster diameters
are tiny (pairs come pre-densified by LSH — a cluster of m docs
carries up to C(m,2) edges, so the diameter is usually 1-2).

Scale shape per round: one shuffle to aggregate neighbor minima
(groupBy node) and one join to merge into the label table. The label
table is (node, label) longs only — never document text. Lineage is
truncated every round with localCheckpoint (same discipline as the
k-means loop), or the 20th iteration would carry a 20-join plan. The
convergence check collects a single scalar per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (node, component) where ``component`` is the smallest node
    id reachable from ``node`` — deterministic, join-ready as the
    canonical-document key. Isolated nodes never appear in ``edges``
    and are their own component by definition (callers union them in;
    dedup_keepers below does).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).filter(F.col("u") != F.col("v"))
    # undirected: keep both directions so every node sees every neighbor
    adj = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    adj = adj.localCheckpoint(eager=True)

    # Fused first propagation round: the identity labeling's round 1
    # computes exactly min(node, min neighbor) through a join against a
    # trivial label table — the same number comes out of ONE aggregate
    # over adj (the node set of adj IS the node universe, and every
    # initial label is the node id). For the dominant dense case (LSH
    # cliques/stars, diameter 1) this init already IS the fixpoint, so
    # the loop runs a single confirming round instead of
    # propagate + confirm — one fewer join/groupBy/checkpoint/agg cycle
    # per components call (measured across the 5 registry entries that
    # resolve components).
    labels = (
        adj.groupBy("u")
        .agg(F.min("v").alias("nbr"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("nbr")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    # convergence via the label-sum invariant: every update is
    # least(old, ...) per node, so labels are elementwise
    # non-increasing and the SUM is strictly decreasing until the
    # fixpoint — sum unchanged <=> nothing changed. The check is one
    # joinless aggregate over the fresh checkpoint instead of the old
    # full old-vs-new join+filter+count (DECIMAL: node ids x node
    # count can pass int64 at billion-doc scale).
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]

    for _ in range(max_iter):
        # smallest label among each node's neighbors this round
        neighbor_min = (
            adj.join(
                labels.withColumnRenamed("node", "v"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "node")
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        # pointer jumping (path halving): also adopt our label's own
        # label. Labels only ever hold node ids, so the lookup is a
        # self-join; this is what turns O(diameter) rounds into
        # O(log diameter) — a 1M-doc chain converges in ~20 rounds,
        # not 1M.
        parents = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("parent_label")
        )
        # EAGER checkpoint deliberately: folding the materialization
        # into the convergence count (eager=False, one job per round)
        # was MEASURED SLOWER (4.1-6.3 s vs 2.2-4.1 s on a 258-edge /
        # 491-node fixture graph) — the fused job serializes the whole
        # propagation subtree behind the count while two small jobs
        # pipeline their stages better.
        new_labels = (
            stepped.join(parents, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce("parent_label", F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    return labels.select("node", F.col("label").alias("component"))


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Canonical-document election: map every doc to its component's
    keeper (the smallest doc_id in the component; docs in no pair keep
    themselves). Returns (doc_id, keeper_doc_id, is_keeper) — the table
    a 100 TB pipeline joins against the corpus to drop duplicates
    without ever moving document payloads through the component loop.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    ids = docs.select(id_col)
    return (
        ids.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("keeper_doc_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("keeper_doc_id"))
    )
