"""Product quantization for ANN (Jégou, Douze, Schmid — PAMI 2011):
split each embedding into M subvectors, quantize every subvector to
its nearest codeword in a per-subspace codebook, and answer queries
with Asymmetric Distance Computation (ADC) — the query's exact
distance to each CODEWORD is computed once, then every corpus
vector's distance is a table lookup + sum over its M codes. The
corpus is never re-scanned per query and the stored representation
is M small codes per vector (here 4 bytes instead of 256) — the
memory shape that makes billion-vector ANN fit in RAM.

Codebooks here are SAMPLED, not Lloyd-trained: the 16 codewords per
subspace are the subvectors of a fixed corpus slice (the reservoir
trick real systems bootstrap with; a deterministic k-means refinement
— operators/clustering.py — slots in without changing the
encode/ADC plan). Sampling keeps the whole construction
SQL-expressible, so the DuckDB oracle replays encode + ADC exactly.

All distances are integer: components fixed-pointed to micro units
(the similarity_plans discipline), squared-L2 per subspace as a
BIGINT fold, and the encode argmin is min(dist * 32 + code_id) — a
single-key lexicographic min that is engine-exact and ties toward
the smaller code id.

Scale shape: the codebook (M x 16 rows) broadcasts onto the corpus
for a map-side encode; the query distance table (|Q| x M x 16 rows)
broadcasts onto the codes for a map-side ADC; the only per-query
global step is the top-k window over ADC sums, bounded by |Q|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (embeddings are 64-d)
PQ_CODES = 16  # codewords per subspace
PQ_SCALE = 1_000_000  # micro fixed point per component
N_QUERIES = 8  # vec_id < 8 are the query vectors (ann family convention)
CB_LO, CB_HI = N_QUERIES, N_QUERIES + PQ_CODES  # codebook sample slice
TOP_K = 5
# argmin key = dist * KEYMUL + code_id; code_id < CB_HI <= KEYMUL
_KEYMUL = 32

_FIXED_DUCK = (
    f"list_transform(embedding, x -> CAST(ROUND(x::DOUBLE * {PQ_SCALE})"
    " AS BIGINT))"
)
_SUBD = (
    f"list_reduce(list_transform(generate_series(1, {PQ_SUBDIM}), "
    "i -> (t.s[i] - c.s[i]) * (t.s[i] - c.s[i])), (x, y) -> x + y)"
)


@_add(
    "ann_pq_adc_topk",
    f"""
    WITH fixed AS (
      SELECT vec_id, {_FIXED_DUCK} AS v FROM embeddings
    ), sub AS (
      SELECT vec_id, m,
             v[CAST(m * {PQ_SUBDIM} + 1 AS INTEGER)
               : CAST((m + 1) * {PQ_SUBDIM} AS INTEGER)] AS s
      FROM fixed, UNNEST(generate_series(0, {PQ_M - 1})) AS u(m)
    ), cb AS (
      SELECT vec_id AS code_id, m, s FROM sub
      WHERE vec_id >= {CB_LO} AND vec_id < {CB_HI}
    ), dist AS (
      SELECT t.vec_id, t.m, c.code_id, {_SUBD} AS d
      FROM sub t JOIN cb c USING (m)
    ), codes AS (
      SELECT vec_id, m,
             CAST(MIN(d * {_KEYMUL} + code_id) % {_KEYMUL} AS BIGINT)
               AS code_id
      FROM dist WHERE vec_id >= {N_QUERIES} GROUP BY 1, 2
    ), qdist AS (
      SELECT vec_id AS query_id, m, code_id, d
      FROM dist WHERE vec_id < {N_QUERIES}
    ), adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(q.d) AS BIGINT) AS adc
      FROM codes c JOIN qdist q USING (m, code_id)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, adc,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY adc ASC, neighbor_id ASC
             ) AS rank
      FROM adc
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id ASC, rank ASC
    """,
    doc="Product-quantization ANN with Asymmetric Distance "
    f"Computation: {PQ_M} subspaces x {PQ_CODES} sampled codewords, "
    "micro fixed-point squared-L2 per subspace (BIGINT folds), "
    f"encode argmin via min(dist * {_KEYMUL} + code) so ties break "
    "to the smaller code identically on both engines. The codebook "
    "broadcasts for a map-side encode; the per-query "
    "codeword-distance table broadcasts for a map-side ADC lookup; "
    "corpus vectors are reduced to M codes, never rescanned per "
    "query — the memory/compute shape of billion-scale ANN. Top-5 "
    "per query by ADC with neighbor-id tie-break.",
    tags=("similarity", "ann", "pq"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fixed = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long"),
        ).alias("v"),
    )
    sub = fixed.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
        F.col("v").alias("v"),
    ).select(
        "vec_id",
        "m",
        F.expr(f"slice(v, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("s"),
    )
    cb = (
        sub.filter((F.col("vec_id") >= CB_LO) & (F.col("vec_id") < CB_HI))
        .select(F.col("vec_id").alias("code_id"), "m", F.col("s").alias("cs"))
    )
    d = F.aggregate(
        F.zip_with(F.col("s"), F.col("cs"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "code_id", d.alias("d"))
    )
    codes = (
        dist.filter(F.col("vec_id") >= N_QUERIES)
        .groupBy("vec_id", "m")
        .agg(
            (F.min(F.col("d") * _KEYMUL + F.col("code_id")) % _KEYMUL)
            .cast("long")
            .alias("code_id")
        )
    )
    qdist = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code_id", "d"
    )
    adc = (
        codes.join(F.broadcast(qdist), ["m", "code_id"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        adc.select(
            "query_id",
            F.row_number().over(w).cast("long").alias("rank"),
            "neighbor_id",
            "adc",
        )
        .filter(F.col("rank") <= TOP_K)
        .orderBy(F.asc("query_id"), F.asc("rank"))
    )


@_add(
    "ann_ivfpq_topk",
    f"""
    WITH fixed AS (
      SELECT vec_id, label, {_FIXED_DUCK} AS v FROM embeddings
    ), sub AS (
      SELECT vec_id, label, m,
             v[CAST(m * {PQ_SUBDIM} + 1 AS INTEGER)
               : CAST((m + 1) * {PQ_SUBDIM} AS INTEGER)] AS s
      FROM fixed, UNNEST(generate_series(0, {PQ_M - 1})) AS u(m)
    ), cb AS (
      SELECT vec_id AS code_id, m, s FROM sub
      WHERE vec_id >= {CB_LO} AND vec_id < {CB_HI}
    ), dist AS (
      SELECT t.vec_id, t.label, t.m, c.code_id, {_SUBD} AS d
      FROM sub t JOIN cb c USING (m)
    ), codes AS (
      SELECT vec_id, ANY_VALUE(label) AS label, m,
             CAST(MIN(d * {_KEYMUL} + code_id) % {_KEYMUL} AS BIGINT)
               AS code_id
      FROM dist WHERE vec_id >= {N_QUERIES} GROUP BY vec_id, m
    ), qdist AS (
      SELECT vec_id AS query_id, label AS qlabel, m, code_id, d
      FROM dist WHERE vec_id < {N_QUERIES}
    ), adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(q.d) AS BIGINT) AS adc
      FROM codes c
      JOIN qdist q ON q.m = c.m AND q.code_id = c.code_id
                  AND q.qlabel = c.label
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, adc,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY adc ASC, neighbor_id ASC
             ) AS rank
      FROM adc
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adc
    FROM ranked WHERE rank <= {TOP_K}
    ORDER BY query_id ASC, rank ASC
    """,
    doc="IVF + PQ — the production billion-vector ANN shape (FAISS "
    "IVFADC): the coarse quantizer (label = IVF cell, the "
    "ann_topk/ann_lsh family's cell machinery) restricts each query "
    "to its own cell, then PQ codes rank the cell's members by "
    "Asymmetric Distance Computation. The cell restriction is an "
    "extra equality in the ADC join key — the lookup becomes "
    "(cell, subspace, code), so the probe touches only the query's "
    "cell and cost scales with cell size, not corpus size; encode "
    "and distance-table stages are identical to ann_pq_adc_topk "
    "(broadcast-only, integer-exact).",
    tags=("similarity", "ann", "pq", "ivf"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fixed = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long"),
        ).alias("v"),
    )
    sub = fixed.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
        F.col("v").alias("v"),
    ).select(
        "vec_id",
        "label",
        "m",
        F.expr(f"slice(v, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("s"),
    )
    cb = (
        sub.filter((F.col("vec_id") >= CB_LO) & (F.col("vec_id") < CB_HI))
        .select(F.col("vec_id").alias("code_id"), "m", F.col("s").alias("cs"))
    )
    d = F.aggregate(
        F.zip_with(F.col("s"), F.col("cs"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "label", "m", "code_id", d.alias("d"))
    )
    codes = (
        dist.filter(F.col("vec_id") >= N_QUERIES)
        .groupBy("vec_id", "m")
        .agg(
            F.any_value("label").alias("label"),
            (F.min(F.col("d") * _KEYMUL + F.col("code_id")) % _KEYMUL)
            .cast("long")
            .alias("code_id"),
        )
    )
    qdist = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        "m",
        "code_id",
        "d",
    )
    adc = (
        codes.join(
            F.broadcast(qdist),
            [
                codes.m == qdist.m,
                codes.code_id == qdist.code_id,
                codes.label == qdist.qlabel,
            ],
        )
        .groupBy("query_id", codes.vec_id.alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        adc.select(
            "query_id",
            F.row_number().over(w).cast("long").alias("rank"),
            "neighbor_id",
            "adc",
        )
        .filter(F.col("rank") <= TOP_K)
        .orderBy(F.asc("query_id"), F.asc("rank"))
    )


@_add(
    "ann_pq_recall",
    f"""
    WITH fixed AS (
      SELECT vec_id, {_FIXED_DUCK} AS v FROM embeddings
    ), sub AS (
      SELECT vec_id, m,
             v[CAST(m * {PQ_SUBDIM} + 1 AS INTEGER)
               : CAST((m + 1) * {PQ_SUBDIM} AS INTEGER)] AS s
      FROM fixed, UNNEST(generate_series(0, {PQ_M - 1})) AS u(m)
    ), cb AS (
      SELECT vec_id AS code_id, m, s FROM sub
      WHERE vec_id >= {CB_LO} AND vec_id < {CB_HI}
    ), dist AS (
      SELECT t.vec_id, t.m, c.code_id, {_SUBD} AS d
      FROM sub t JOIN cb c USING (m)
    ), codes AS (
      SELECT vec_id, m,
             CAST(MIN(d * {_KEYMUL} + code_id) % {_KEYMUL} AS BIGINT)
               AS code_id
      FROM dist WHERE vec_id >= {N_QUERIES} GROUP BY 1, 2
    ), qdist AS (
      SELECT vec_id AS query_id, m, code_id, d
      FROM dist WHERE vec_id < {N_QUERIES}
    ), adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(q.d) AS BIGINT) AS adc
      FROM codes c JOIN qdist q USING (m, code_id)
      GROUP BY 1, 2
    ), pq_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC
               ) AS rank
        FROM adc
      ) WHERE rank <= {TOP_K}
    ), exact AS (
      SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
             list_reduce(list_transform(generate_series(1, {PQ_M * PQ_SUBDIM}),
               i -> (q.v[i] - t.v[i]) * (q.v[i] - t.v[i])),
               (x, y) -> x + y) AS d
      FROM fixed q JOIN fixed t ON t.vec_id >= {N_QUERIES}
      WHERE q.vec_id < {N_QUERIES}
    ), exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY d ASC, neighbor_id ASC
               ) AS rank
        FROM exact
      ) WHERE rank <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS hits,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / {TOP_K}
             AS recall_at_{TOP_K}
    FROM exact_top e
    LEFT JOIN pq_top p
      ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id ASC
    """,
    doc="PQ quality measurement, in-engine and same-metric: recall@"
    f"{TOP_K} of the ADC top-k against the EXACT squared-L2 top-k "
    "computed on the same micro fixed-point vectors (PQ ranks by L2, "
    "so the ground truth is L2 — comparing against cosine would "
    "conflate metric mismatch with quantization loss). The exact side "
    "is the broadcast-queries-vs-corpus scan of the ann family "
    "(O(corpus), never corpus x corpus); the PQ side reuses the "
    "encode + ADC plan. Hits are integer, recall is one exact "
    "division. On i.i.d. synthetic vectors a 4x16 sampled codebook "
    "is honestly lossy — the measured dial this gate exposes, as "
    "ann_recall does for IVF/LSH probe widths.",
    tags=("similarity", "ann", "pq", "recall"),
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fixed = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long"),
        ).alias("v"),
    )
    sub = fixed.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
        F.col("v").alias("v"),
    ).select(
        "vec_id",
        "m",
        F.expr(f"slice(v, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("s"),
    )
    cb = (
        sub.filter((F.col("vec_id") >= CB_LO) & (F.col("vec_id") < CB_HI))
        .select(F.col("vec_id").alias("code_id"), "m", F.col("s").alias("cs"))
    )
    d = F.aggregate(
        F.zip_with(F.col("s"), F.col("cs"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "code_id", d.alias("d"))
    )
    codes = (
        dist.filter(F.col("vec_id") >= N_QUERIES)
        .groupBy("vec_id", "m")
        .agg(
            (F.min(F.col("d") * _KEYMUL + F.col("code_id")) % _KEYMUL)
            .cast("long")
            .alias("code_id")
        )
    )
    qdist = dist.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code_id", "d"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    pq_top = (
        codes.join(F.broadcast(qdist), ["m", "code_id"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adc"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    qv = fixed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact_d = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("d"), F.asc("neighbor_id")
    )
    exact_top = (
        fixed.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(qv))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            exact_d.alias("d"),
        )
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("neighbor_id").alias("true_id"))
    )
    return (
        exact_top.join(
            pq_top,
            (pq_top.query_id == exact_top.query_id)
            & (pq_top.neighbor_id == exact_top.true_id),
            "left",
        )
        .groupBy(exact_top.query_id)
        .agg(
            F.count(pq_top.neighbor_id).cast("long").alias("hits"),
            (
                F.count(pq_top.neighbor_id).cast("double") / TOP_K
            ).alias(f"recall_at_{TOP_K}"),
        )
        .orderBy(F.asc("query_id"))
    )
