"""Similarity search over the ``embeddings`` table (SURVEY.md §7.9).

Brute-force cosine top-k is the correctness baseline; the IVF-style
variant restricts the scan to a coarse partition (label = cell id) —
the plan shape that keeps ANN sub-quadratic at 100 TB (real IVF learns
centroids; the partitioned-join + per-cell-topk physique is identical).

Cosine is a left-fold of doubles in array order on BOTH engines
(functions/vectors.py vs DuckDB list_reduce), so scores are
bit-identical and even the DOUBLE column hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.colcache import memo_col
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5

_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a}.embedding)), "
    "i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE), (x, y) -> x + y)"
)


def _duck_cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


@_add(
    "ann_topk",
    f"""
    WITH brute AS (
      SELECT 'brute' AS method, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_duck_cos('q', 'c')} AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_cos('q', 'c')} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ivf AS (
      SELECT 'ivf' AS method, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_duck_cos('q', 'c')} AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_duck_cos('q', 'c')} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q
      JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT method, query_id, rank, neighbor_id, cosine FROM brute WHERE rank <= {TOP_K}
    UNION ALL
    SELECT method, query_id, rank, neighbor_id, cosine FROM ivf WHERE rank <= {TOP_K}
    """,
    doc="ANN top-k, both variants tagged in one output so recall is "
    "directly comparable row-by-row. 'brute' is the exact baseline: "
    "broadcast the (small) query set against the corpus — the corpus "
    "is scanned once, never shuffled; only (query, score) pairs move. "
    "'ivf' probes only the query's coarse cell (label = IVF cell / "
    "LSH bucket): an equi-join on the cell id instead of a cross "
    "join, so cost scales with cell size, not corpus size — the "
    "100 TB path. With learned centroids the cell id comes from an "
    "argmin-over-centroids map stage (operators/clustering.py); the "
    "join/topk plan is unchanged. Per-query ROW_NUMBER with vec_id "
    "tie-break keeps the top-k deterministic.",
    tags=("similarity", "ann", "ivf"),
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("method", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )

    q_brute = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    c_brute = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    brute = (
        c_brute.join(
            F.broadcast(q_brute), F.col("neighbor_id") != F.col("query_id")
        )
        .select(
            F.lit("brute").alias("method"),
            "query_id",
            "neighbor_id",
            V.cosine("qvec", "embedding").alias("cosine"),
        )
    )

    q_ivf = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
    )
    c_ivf = e.select(F.col("vec_id").alias("neighbor_id"), "label", "embedding")
    ivf = (
        c_ivf.join(
            F.broadcast(q_ivf),
            (F.col("label") == F.col("qlabel"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            F.lit("ivf").alias("method"),
            "query_id",
            "neighbor_id",
            V.cosine("qvec", "embedding").alias("cosine"),
        )
    )

    return (
        brute.unionByName(ivf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("method", "query_id", "rank", "neighbor_id", "cosine")
    )


_DIM = 64


@_add(
    "label_centroids",
    f"""
    WITH comp AS (
      SELECT label, u.i AS dim,
             SUM(CAST(ROUND(embedding[u.i]::DOUBLE * 1000000000) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM embeddings, UNNEST(generate_series(1, {_DIM})) AS u(i)
      GROUP BY label, u.i
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS members,
           CAST(to_json(LIST(CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT)
                             ORDER BY dim)) AS VARCHAR) AS centroid_nano
    FROM comp GROUP BY label
    """,
    doc="Per-cell centroid (the k-means E-step / IVF training "
    "primitive). Float components are fixed-pointed to nano units "
    "before summing so the reduction is exact and order-independent — "
    "the same trick functions/money.py uses for money — then floor-"
    "divided once per dim. The centroid stays in exact nano-int units "
    "and is serialized to a JSON string because the driver's pandas "
    "canonicalizer cannot hash list cells (same workaround as "
    "multimodal_frame_sample). One shuffle on (label, dim).",
    tags=("similarity", "centroid"),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    comp = exploded.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("val").cast("double") * 1e9).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    per_dim = comp.select(
        "label",
        "pos",
        "n",
        F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("c"),
    )
    return per_dim.groupBy("label").agg(
        F.max("n").cast("long").alias("members"),
        F.to_json(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).getField("c")
        ).alias("centroid_nano"),
    )


_KM_K = 8
_KM_ITER = 3
_KM_SCALE = 1_000_000_000


def _km_dist(vec_tbl: str, cent_list: str) -> str:
    """Squared L2 as a left-fold in array order — mirrors the Spark
    aggregate(zip_with(...)) fold bit-for-bit (0.0 + d1² + d2² ...)."""
    return (
        f"list_reduce(list_transform(generate_series(1, {_DIM}), "
        f"i -> ({vec_tbl}.embedding[i]::DOUBLE - {cent_list}[i]) * "
        f"({vec_tbl}.embedding[i]::DOUBLE - {cent_list}[i])), "
        "(x, y) -> x + y)"
    )


def _km_oracle() -> str:
    """Unrolled Lloyd iterations as CTE chain — the algorithm is fully
    deterministic (seed = k lowest vec_ids, exact nano fixed-point
    centroid sums, argmin ties to the lower cluster), so the 'iterative'
    query IS SQL-expressible once the loop count is a constant."""
    ctes = [
        # seed centroids: the k lowest vec_ids' vectors, widened to DOUBLE
        f"""cent0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
             list_transform(generate_series(1, {_DIM}),
                            i -> embedding[i]::DOUBLE) AS c
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_KM_K})
    )"""
    ]
    for it in range(1, _KM_ITER + 1):
        prev = f"cent{it - 1}"
        ctes.append(f"""assign{it} AS (
      SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_km_dist('e', 'c.c')} ASC, c.cluster ASC
               ) AS rn
        FROM embeddings e CROSS JOIN {prev} c
      ) WHERE rn = 1
    )""")
        ctes.append(f"""comp{it} AS (
      SELECT cluster, u.i AS pos,
             SUM(CAST(ROUND(embedding[u.i]::DOUBLE * {_KM_SCALE}) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM assign{it}, UNNEST(generate_series(1, {_DIM})) AS u(i)
      GROUP BY cluster, u.i
    )""")
        # empty clusters keep their previous centroid (COALESCE)
        ctes.append(f"""cent{it} AS (
      SELECT p.cluster,
             list(COALESCE(CAST(x.s AS DOUBLE) / x.n / {_KM_SCALE},
                           p.c[u.i]) ORDER BY u.i) AS c
      FROM {prev} p
      CROSS JOIN UNNEST(generate_series(1, {_DIM})) AS u(i)
      LEFT JOIN comp{it} x ON x.cluster = p.cluster AND x.pos = u.i
      GROUP BY p.cluster
    )""")
    ctes.append(f"""final AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT e.vec_id, c.cluster, {_km_dist('e', 'c.c')} AS dist,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_km_dist('e', 'c.c')} ASC, c.cluster ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cent{_KM_ITER} c
      ) WHERE rn = 1
    )""")
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS members,
           CAST(SUM(CAST(ROUND(dist * {_KM_SCALE}) AS BIGINT)) AS BIGINT)
             AS total_sq_dist_nano,
           CAST(SUM(CAST(ROUND(dist * {_KM_SCALE}) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / {_KM_SCALE} AS mean_sq_dist
    FROM final GROUP BY cluster
    """


@_add(
    "kmeans_cluster_sizes",
    _km_oracle(),
    doc="In-engine k-means (operators/clustering.py): deterministic "
    "seeding (k lowest vec_ids), 3 Lloyd iterations as broadcast-"
    "argmin scans + exact nano fixed-point centroid updates; output is "
    "the cluster size distribution + per-cluster mean squared "
    "distance (nano fixed-point sums, so the shuffled reduction is "
    "exact and order-independent). The algorithm is fully "
    "deterministic, so the DuckDB oracle UNROLLS the three iterations "
    "as a CTE chain mirroring every float operation in array order — "
    "an iterative operator does not have to settle for a rows-only "
    "check. Invariants (nearest-centroid assignment, monotone "
    "inertia) additionally pinned in tests/test_clustering.py.",
    tags=("similarity", "kmeans", "iterative"),
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_fit

    e = load_table(spark, sf_dir, "embeddings")
    _, assignments = kmeans_fit(e, k=_KM_K, n_iter=_KM_ITER)
    nano = F.round(F.col("sq_dist") * _KM_SCALE).cast("long")
    return (
        assignments.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("members"),
            F.sum(nano).alias("total_sq_dist_nano"),
        )
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("members").cast("long").alias("members"),
            "total_sq_dist_nano",
            (
                F.col("total_sq_dist_nano").cast("double")
                / F.col("members")
                / _KM_SCALE
            ).alias("mean_sq_dist"),
        )
    )


# --- round 9: fixed-point second-moment matrix (PCA/whitening prep) -------
#
# The statistic an embedding pipeline computes before whitening, PCA
# or quantizer training is the covariance of the vector columns. At
# 100 TB that must be ONE map-side aggregate — d(d+1)/2 sum-of-product
# columns folded partial-before-shuffle, no explode, no driver pass —
# and it must be EXACT, or two runs of the same job disagree in the
# low bits (float sums are partitioning-order-dependent; the money.py
# problem in vector form). Values are fixed-pointed at 1e6, products
# and sums staged through DECIMAL(38,0)/HUGEINT (a 10^9-row corpus
# pushes sum-of-products past BIGINT), and the final covariance is
# emitted at scale 1e12 — small enough for BIGINT at any corpus size
# (it is a mean, not a sum). First 8 dimensions here: the report face;
# the full-matrix job is the same plan with d^2 columns.

COV_DIMS = 8
#: the fixture embeddings are d=64; the keyed-pairs and PCA entries run
#: at the FULL dimensionality (the one-row form stays at the d=8 report
#: slice — its own doc names d ~ 64 as where its O(d^2)-expression
#: width stops being the right shape, so the d=64 entries below are
#: the measured proof of the claim, not prose)
COV_DIMS_FULL = 64
COV_FP = 1_000_000  # per-coordinate fixed point
# int64-exactness domain of the pairs formulation's per-row products:
# |fx_i * fx_j| must stay under 2^63 ~ 9.22e18, so each fixed-pointed
# component |v * COV_FP| must stay under 3e9, i.e. |v| < 3000 at
# COV_FP=1e6 (unit-scale embeddings sit ~3.5 decades inside it).
# _cov_pairs_frame enforces this with an assert_true per element.
COV_PAIRS_MAX_ABS = 3000.0


def _cov_pairs() -> list[tuple[int, int]]:
    return [(i, j) for i in range(COV_DIMS) for j in range(i, COV_DIMS)]


def _cov_oracle() -> str:
    def fp(i: int) -> str:
        # FLOOR, not ROUND: round-half conventions differ across
        # engines (DuckDB half-even vs Spark half-up bites exactly at
        # a *1e6 half boundary — observed on this fixture); floor of
        # the SAME IEEE double is mode-free and engine-identical.
        return (f"CAST(FLOOR(CAST(embedding[{i + 1}] AS DOUBLE)"
                f" * {COV_FP}) AS HUGEINT)")

    sums = ", ".join(
        f"SUM({fp(i)} * {fp(j)}) AS sxy_{i}_{j}" for i, j in _cov_pairs()
    )
    sx = ", ".join(f"SUM({fp(i)}) AS sx_{i}" for i in range(COV_DIMS))
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS dim_i, CAST({j} AS BIGINT) AS dim_j,"
        f" CAST(n AS BIGINT) AS n,"
        f" CAST((n * sxy_{i}_{j} - sx_{i} * sx_{j}) // (n * n) AS BIGINT)"
        f" AS cov_fp12,"
        f" CAST(sx_{i} // n AS BIGINT) AS mean_i_fp6 FROM agg"
        for i, j in _cov_pairs()
    )
    return f"""
    WITH agg AS (
      SELECT COUNT(*) AS n, {sums}, {sx} FROM embeddings
    )
    {rows}
    ORDER BY dim_i ASC, dim_j ASC
    """


@REGISTRY.add(
    "embedding_covariance",
    _cov_oracle(),
    doc=f"Exact fixed-point covariance of the first {COV_DIMS} embedding "
    "dimensions — the whitening/PCA/OPQ input statistic: coordinates "
    f"fixed-pointed at {COV_FP}, all {COV_DIMS * (COV_DIMS + 1) // 2} "
    "sum-of-product accumulators computed in ONE map-side aggregate "
    "(partial aggregation before the 1-row shuffle — no explode, no "
    "second scan, no driver pass), staged through DECIMAL(38,0)/"
    "HUGEINT so a 10^9-row corpus cannot overflow the sums, and "
    "emitted as the scale-1e12 covariance (n*Sxy - Sx*Sy) div n^2 "
    "plus scale-1e6 means — integral outputs, so the result is "
    "bit-identical under any partitioning (the money.py discipline "
    "in vector form; a double-summed covariance differs run to run). "
    "Unpivot to (i, j) rows is a constant 36-element inline over the "
    "single aggregate row. BOUND: this one-row form carries d(d+1)/2 "
    "aggregate EXPRESSIONS in one stage — right at report dims (d=8 "
    "-> 44), wrong at production embedding dims (d=256 -> 33k, d=1024 "
    "-> 525k expressions exceed codegen and agg-buffer budgets); past "
    "d ~ 64 use embedding_covariance_pairs, the (dim_i, dim_j)-keyed "
    "shuffle formulation proved cell-equal against the same oracle.",
    tags=("embedding", "stats", "agg"),
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    # The 44-aggregate list and 36-struct projection are deterministic
    # constants (~1.2-2.0 s of py4j construction per builder call in
    # the r12 profile — the dominant cost of this entry, whose
    # EXECUTION is ~0.3 s); memoize the fragments per process
    # (guide §5.3 driver latency; functions/colcache.py — plan text,
    # never data).
    aggs, structs = memo_col(("similarity._cov_frags",), _cov_one_row_frags)
    one = e.agg(*aggs)
    return (
        one.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy(F.asc("dim_i"), F.asc("dim_j"))
    )


def _cov_one_row_frags():
    def fp(i: int):
        # FLOOR, not ROUND — see the oracle twin's note
        # the column is float32: promote to DOUBLE before the multiply
        # in BOTH engines (float*int promotion rules differ), so the
        # product is the same IEEE double everywhere
        return (
            F.floor(F.element_at("embedding", i + 1).cast("double") * COV_FP)
            .cast("decimal(38,0)")
        )

    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i, j in _cov_pairs():
        aggs.append(F.sum(fp(i) * fp(j)).alias(f"sxy_{i}_{j}"))
    for i in range(COV_DIMS):
        aggs.append(F.sum(fp(i)).alias(f"sx_{i}"))
    structs = [
        F.struct(
            F.lit(i).cast("long").alias("dim_i"),
            F.lit(j).cast("long").alias("dim_j"),
            F.col("n").cast("long").alias("n"),
            F.expr(
                f"CAST((n * sxy_{i}_{j} - sx_{i} * sx_{j}) div (n * n)"
                " AS BIGINT)"
            ).alias("cov_fp12"),
            F.expr(f"CAST(sx_{i} div n AS BIGINT)").alias("mean_i_fp6"),
        )
        for i, j in _cov_pairs()
    ]
    return aggs, structs


# --- round 10: the shuffle-keyed covariance formulation -------------------
#
# `embedding_covariance` carries all d(d+1)/2 accumulators as COLUMNS
# of one aggregate — optimal at report dimensionality (d=8 -> 36+8
# expressions) but O(d^2) in aggregate-expression count: at production
# embedding dims it is 33k (d=256) to 525k (d=1024) expressions in a
# single stage, past what codegen and the aggregation buffer should
# carry. The 100x-in-dimension shape keys the SHUFFLE by (dim_i,
# dim_j) instead: each row explodes to its upper-triangle products,
# partial aggregation collapses every task to <= d(d+1)/2+d rows
# before the exchange, and no stage ever materializes a d^2-wide
# tuple. Cell-equality against the SAME oracle as the one-row form
# proves the two formulations compute the identical statistic.


def _cov_pairs_oracle(dims: int) -> str:
    """Keyed relational form of the covariance oracle: at d=64 the
    one-row oracle's d(d+1)/2 SUM expressions + unpivot would be a
    2,080-branch UNION ALL; instead DuckDB mirrors the Spark keying —
    positional unnest to (rid, dim, x), a rid-joined upper-triangle
    product aggregation, and the same exact integer covariance
    algebra. Same FLOOR fixed-pointing, same HUGEINT staging."""
    S = COV_FP
    return f"""
    WITH ex AS MATERIALIZED (
      SELECT rid, i,
             CAST(FLOOR(CAST(v AS DOUBLE) * {S}) AS HUGEINT) AS x
      FROM (SELECT row_number() OVER () AS rid,
                   unnest(embedding) AS v,
                   unnest(range(len(embedding))) AS i
            FROM embeddings)
      WHERE i < {dims}
    ), sx AS MATERIALIZED (
      SELECT i AS dim, SUM(x) AS sx, CAST(COUNT(*) AS HUGEINT) AS n
      FROM ex GROUP BY i
    ), prods AS (
      SELECT a.i AS dim_i, b.i AS dim_j, SUM(a.x * b.x) AS sxy
      FROM ex a JOIN ex b ON a.rid = b.rid AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT CAST(p.dim_i AS BIGINT) AS dim_i,
           CAST(p.dim_j AS BIGINT) AS dim_j,
           CAST(si.n AS BIGINT) AS n,
           CAST((si.n * p.sxy - si.sx * sj.sx) // (si.n * si.n)
                AS BIGINT) AS cov_fp12,
           CAST(si.sx // si.n AS BIGINT) AS mean_i_fp6
    FROM prods p
    JOIN sx si ON si.dim = p.dim_i
    JOIN sx sj ON sj.dim = p.dim_j
    ORDER BY dim_i ASC, dim_j ASC
    """


@REGISTRY.add(
    "embedding_covariance_pairs",
    _cov_pairs_oracle(COV_DIMS_FULL),
    doc=f"The (dim_i, dim_j)-KEYED covariance formulation at the "
    f"fixture's FULL d={COV_DIMS_FULL} — the 100x-in-dimension twin "
    "of embedding_covariance (which stays at its d=8 report slice): "
    "every row explodes to its upper-triangle fixed-point products "
    "(two nested codegen generators over index sequences — no "
    "self-join, no interpreted array build) plus a per-dim sum "
    "branch, partial aggregation collapses each task to at most "
    f"{COV_DIMS_FULL * (COV_DIMS_FULL + 1) // 2}+{COV_DIMS_FULL} "
    "keyed rows before the one exchange, and the final covariance "
    "assembles from two joins against the d-row mean table — so "
    "aggregate width is O(1) and row count O(d^2) instead of the "
    "one-row form's O(d^2) EXPRESSIONS in a single stage (2,080 at "
    "d=64 already past codegen comfort, 33k at d=256, 525k at d=1024 "
    "— the bound that form documents). Same DECIMAL(38,0)/HUGEINT "
    "staging, same FLOOR fixed-pointing; the d=8 slice of this very "
    "builder is pinned cell-equal to the one-row form in "
    "tests/test_r10_ops.py, and the oracle here is the keyed "
    "relational rendering of the same exact algebra.",
    tags=("embedding", "stats", "agg", "shuffle"),
)
def embedding_covariance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cov_pairs_frame(spark, sf_dir, COV_DIMS_FULL)


def _cov_fx_expr(dims: int, col: str = "embedding") -> str:
    """SQL for the fixed-point LONG coordinate array, with the int64
    exactness domain RUNTIME-ENFORCED, not assumed: each component must
    satisfy |v| < COV_PAIRS_MAX_ABS (3000 -> |fx| <= 3e9 -> any pair
    product <= 9e18 < 2^63 ~ 9.22e18), and a component outside it
    raises via assert_true instead of silently wrapping int64 — the
    `+ 0` guard term costs one abs/compare per element and keeps the
    exactness claim self-enforcing on any future fixture."""
    return (
        f"transform(slice({col}, 1, {dims}), v -> "
        f"CAST(FLOOR(CAST(v AS DOUBLE) * {COV_FP}) AS BIGINT)"
        f" + CAST(coalesce(assert_true("
        f"abs(CAST(v AS DOUBLE)) < {COV_PAIRS_MAX_ABS}, "
        f"'embedding component outside the int64-exact covariance "
        f"domain |v| < {COV_PAIRS_MAX_ABS}'), 0) AS BIGINT))"
    )


def _cov_pairs_frame(
    spark: SparkSession, sf_dir: str, dims: int
) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    # Fixed-point coordinates as LONGs: the per-row pair products run
    # in 64-bit integer arithmetic (exact for |v_i * v_j| <= ~9e6 at
    # COV_FP=1e6 — four decades above unit-scale embeddings) and only
    # the AGGREGATION buffer is DECIMAL(38,0), so corpus-scale sums
    # keep their headroom while the n*d^2/2 multiplies stay cheap.
    base = e.select(F.expr(_cov_fx_expr(dims)).alias("fx"))
    # Upper-triangle products via two NESTED GENERATORS over literal
    # index sequences instead of one flatten(transform(transform(...)))
    # array build: higher-order functions evaluate INTERPRETED (no
    # whole-stage codegen), and building 2,144 structs per row through
    # them measured 4.5-9.9 s at sf0.1 where this explode-explode
    # shape (codegen end to end, generators pipelined — nothing
    # materializes the d^2 fan-out) runs in ~2 s; identical rows. The
    # per-dim sums ride a second, d-wide posexplode branch (the scan
    # is re-read, but it is |corpus| rows against n*d^2/2 products).
    prods_rows = (
        base.select("fx", F.explode(F.expr(f"sequence(0, {dims - 1})")).alias("i"))
        .select("fx", "i", F.explode(F.expr(f"sequence(i, {dims - 1})")).alias("j"))
        .select(
            F.col("i").cast("long").alias("dim_i"),
            F.col("j").cast("long").alias("dim_j"),
            (
                F.expr("element_at(fx, i + 1)") * F.expr("element_at(fx, j + 1)")
            ).alias("s"),
        )
    )
    sx_rows = base.select(F.posexplode("fx").alias("i", "x")).select(
        F.col("i").cast("long").alias("dim_i"),
        F.lit(-1).cast("long").alias("dim_j"),
        F.col("x").alias("s"),
    )
    exploded = prods_rows.unionByName(sx_rows)
    g = exploded.groupBy("dim_i", "dim_j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
        # every input row contributes exactly one entry per key, so any
        # group's count IS the corpus row count
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"),
    )
    means = g.filter(F.col("dim_j") == -1).select(
        F.col("dim_i").alias("k"), F.col("s").alias("sx"), F.col("cnt")
    )
    prods = g.filter(F.col("dim_j") >= 0).select("dim_i", "dim_j", "s")
    return (
        prods.join(
            means.select(
                F.col("k").alias("dim_i"),
                F.col("sx").alias("sx_i"),
                F.col("cnt").alias("n_dec"),
            ),
            "dim_i",
        )
        .join(
            means.select(F.col("k").alias("dim_j"), F.col("sx").alias("sx_j")),
            "dim_j",
        )
        .select(
            "dim_i",
            "dim_j",
            F.col("n_dec").cast("long").alias("n"),
            F.expr(
                "CAST((n_dec * s - sx_i * sx_j) div (n_dec * n_dec)"
                " AS BIGINT)"
            ).alias("cov_fp12"),
            F.expr("CAST(sx_i div n_dec AS BIGINT)").alias("mean_i_fp6"),
        )
        .orderBy(F.asc("dim_i"), F.asc("dim_j"))
    )


# --- round 10/11: PCA top eigenvector by deterministic power iteration ----
#
# The step that turns "PCA prep" (the covariance entries above) into
# PCA: extract the dominant eigenvector of the centered second-moment
# matrix. The 100-TB shape never MATERIALIZES the covariance — each
# power-iteration step is one corpus scan computing y = sum_r c_r
# (c_r . v) (d accumulators, map-side partial agg), with only the
# d-element iterate as driver state (the k-means discipline). All
# arithmetic is staged integer fixed-point: coordinates FLOOR-ed at
# COV_FP, centering by the truncated integer mean, and the iterate
# re-normalized each step by INFINITY norm with integer division —
# v' = (y * S) div max|y| — so the recurrence is exact integer algebra
# with no float sum anywhere, bit-identical under any partitioning
# and any engine.
#
# Round 11 moved the entry from the d=8 report slice to the fixture's
# FULL d=64, which forced the column-per-dimension rendering out: at
# d=64 the old per-column dot expression is d^2 = 4,096 decimal
# multiply-adds PER AGGREGATE STAGE (the one-row covariance problem in
# recurrence form). The d=64 shape projects the per-row dot ONCE
# (zip_with + aggregate over the fixed-point array — d multiplies),
# then folds d sums of element_at(c,i)*dot — O(d) work per row per
# stage, not O(d^2). The oracle went relational the same way:
# positional-unnest (rid, i, x) triples, per-iteration dot via a
# rid-keyed join against the 64-row iterate, y via an i-keyed join —
# the identical recurrence, MATERIALIZED per step.
#
# Numeric bound: per-row |c| <= ~2*COV_FP, so |dot| <= d*2e6*S ~ 1.3e14
# and |y| <= n * 2e6 * 1.3e14 ~ 2.6e20*n; the (y * S) staging holds in
# 38 digits for n up to ~4e11 rows — document-scale corpora; past
# that drop COV_FP one decade.

PCA_ITERS = 5
PCA_DIMS = COV_DIMS_FULL


def _pca_oracle(dims: int) -> str:
    # MATERIALIZED CTEs are load-bearing: DuckDB inlines plain CTEs per
    # reference, and the unrolled iteration chain references c
    # repeatedly — inlining re-opens the parquet view per reference
    # (observed: "Too many open files" at 5 iterations in the d=8
    # column rendering).
    S, T = COV_FP, PCA_ITERS
    ctes = [
        f"""ex AS MATERIALIZED (
      SELECT rid, i,
             CAST(FLOOR(CAST(v AS DOUBLE) * {S}) AS HUGEINT) AS x
      FROM (SELECT row_number() OVER () AS rid,
                   unnest(embedding) AS v,
                   unnest(range(len(embedding))) AS i
            FROM embeddings)
      WHERE i < {dims}
    )""",
        """st AS MATERIALIZED (
      SELECT i, SUM(x) AS sx, CAST(COUNT(*) AS HUGEINT) AS n
      FROM ex GROUP BY i
    )""",
        """c AS MATERIALIZED (
      SELECT ex.rid, ex.i, ex.x - (st.sx // st.n) AS cx
      FROM ex JOIN st ON st.i = ex.i
    )""",
        f"v0 AS MATERIALIZED (SELECT i, CAST({S} AS HUGEINT) AS v FROM st)",
    ]
    for t in range(1, T + 1):
        ctes.append(
            f"""d{t} AS MATERIALIZED (
      SELECT c.rid, SUM(c.cx * v.v) AS dot
      FROM c JOIN v{t - 1} v ON v.i = c.i GROUP BY c.rid
    )"""
        )
        ctes.append(
            f"""y{t} AS MATERIALIZED (
      SELECT c.i, SUM(c.cx * d{t}.dot) AS y
      FROM c JOIN d{t} ON d{t}.rid = c.rid GROUP BY c.i
    )"""
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT MAX(ABS(y)) AS m FROM y{t})"
        )
        if t < T:
            ctes.append(
                f"""v{t} AS MATERIALIZED (
      SELECT i, (y * {S}) // (SELECT m FROM m{t}) AS v FROM y{t}
    )"""
            )
    return (
        "WITH "
        + ", ".join(ctes)
        + f"""
    SELECT CAST(y.i AS BIGINT) AS dim,
           CAST((y.y * {S}) // (SELECT m FROM m{T}) AS BIGINT)
             AS eigvec_fp,
           CAST((SELECT m FROM m{T})
                // ((SELECT MIN(n) FROM st) * {S}) AS BIGINT)
             AS lambda_fp12,
           CAST((SELECT MIN(n) FROM st) AS BIGINT) AS n
    FROM y{T} y ORDER BY dim ASC
    """
    )


# All PCA-family integer division runs IN-PLAN as Spark's DECIMAL
# `div` (truncates toward zero, same as DuckDB's HUGEINT `//`). The
# driver-side _tdiv twin was deleted in r12 when the last collect()
# left the family — the recurrence, the means, and the eigenvalue all
# flow as data now.
_DEC = "decimal(38,0)"


def _pca_step(c: DataFrame, vdf: DataFrame) -> DataFrame:
    """One power step y = sum_r c_r (c_r . v) as a 1-row ``yarr``
    frame (array of the d DECIMAL accumulators in dim order).

    Two structural choices kill the fixed per-step cost the driver
    loop paid (r11: ~0.5-1.5 s/step of plan analysis + codegen at
    d=64, the bench's top cost center):

    * the iterate arrives as DATA — a 1-row ``varr`` array broadcast
      onto the centered frame (allowlisted 1-row attach) — so the
      step carries no per-iteration literals: every step in the chain
      is structurally identical and Spark's codegen cache compiles it
      once;
    * the d accumulators are ROWS, not columns: the per-row dot
      projects once, posexplode re-keys the centered coords by dim,
      and ONE grouped sum folds (i, x*dot) — the oracle's own
      relational shape. The expression tree is O(1) in d (the
      64-column aggregate tree made chain ANALYSIS alone cost 4.5 s;
      this one analyzes in 0.06 s/step). The groupBy shuffles d
      partial rows per task — nothing at any scale.
    """
    dot = F.aggregate(
        F.zip_with("c", "varr", lambda x, w: x * w),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ex = (
        c.crossJoin(F.broadcast(vdf.select("varr")))
        .withColumn("dot", dot)
        .select("dot", F.posexplode("c").alias("i", "x"))
    )
    y = ex.groupBy("i").agg(
        F.sum(F.col("x").cast(_DEC) * F.col("dot")).alias("y")
    )
    return y.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, y))), s -> s.y)"
        ).alias("yarr")
    )


def _pca_normalized(yarrdf: DataFrame) -> DataFrame:
    """(varr, m) from the 1-row ``yarr`` frame: m = max|y| and
    v' = (y * S) div m — the exact truncating-integer normalize,
    in-plan (the same expression the final emission uses, so chain
    steps and output cannot diverge)."""
    S = COV_FP
    return yarrdf.select(
        "yarr",
        F.expr("array_max(transform(yarr, t -> abs(t)))").alias("m"),
    ).select(
        F.expr(
            f"transform(yarr, t -> CAST((t * {S}) div m AS BIGINT))"
        ).alias("varr"),
        "m",
    )


def _pca_v0(spark: SparkSession, dims: int) -> DataFrame:
    return spark.range(1).select(
        F.array(*[F.lit(COV_FP).cast("long")] * dims).alias("varr")
    )


def _power_chain(
    spark: SparkSession, c: DataFrame, dims: int, iters: int
) -> DataFrame:
    """T chained power steps over the checkpointed centered frame,
    returning the FINAL step's un-normalized 1-row yarr frame (callers
    normalize/emit). All T steps are one lazy plan — no intermediate
    collect() exists anywhere in the recurrence."""
    vdf = _pca_v0(spark, dims)
    for _t in range(iters - 1):
        vdf = _pca_normalized(_pca_step(c, vdf))
    return _pca_step(c, vdf)


def _pca_centered(
    spark: SparkSession, sf_dir: str, dims: int
) -> tuple[DataFrame, DataFrame]:
    """(c, stats1): the checkpointed centered fixed-point frame and a
    checkpointed 1-row (mu ARRAY<BIGINT>, n) stats frame.

    LONG-staged hot path: centered coordinates (|c| <= ~2S) and the
    per-row dot (|dot| <= d * 2S * S ~ 1.3e14 at d=64, inside int64 up
    to d ~ 3e4) stay primitive longs; only the y accumulation widens
    to DECIMAL(38,0). The per-dim means are computed RELATIONALLY
    (posexplode + grouped sum — the same O(1)-tree shape as _pca_step;
    the 65-column aggregate this replaces cost ~2 s of analysis +
    codegen per builder call) and flow as DATA: no collect() exists
    anywhere in the PCA family now. sx div cnt truncates toward zero
    in both engines (Spark decimal div == DuckDB HUGEINT //)."""
    S = COV_FP
    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    fparr = (
        f"transform(slice(embedding, 1, {dims}), v -> "
        f"CAST(FLOOR(CAST(v AS DOUBLE) * {S}) AS BIGINT))"
    )
    raw = e.select(F.expr(fparr).alias("fx"))
    st = (
        raw.select(F.posexplode("fx").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.sum(F.col("x").cast(_DEC)).alias("sx"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    stats1 = st.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i,"
            " CAST(sx div cnt AS BIGINT) AS mu))), s -> s.mu)"
        ).alias("mu"),
        F.max("cnt").cast("long").alias("n"),
    ).localCheckpoint()  # 1 row; feeds centering AND the final lambda
    c = (
        raw.crossJoin(F.broadcast(stats1.select("mu")))
        .select(F.zip_with("fx", "mu", lambda x, m: x - m).alias("c"))
        .localCheckpoint()
    )
    return c, stats1


def _pca_frame(
    spark: SparkSession, sf_dir: str, dims: int, iters: int = PCA_ITERS
) -> DataFrame:
    S, T = COV_FP, iters
    c, stats1 = _pca_centered(spark, sf_dir, dims)
    # The whole T-step recurrence is ONE lazy plan (see _pca_step: the
    # iterate flows as a 1-row broadcast so steps are literal-free and
    # codegen-cached; the d accumulators are rows so analysis is O(1)
    # in d). r11's driver loop paid ~0.5-1.5 s of fixed plan-analysis
    # + JIT per step for fresh-literal 64-aggregate trees — measured
    # r12 at sf0.1: this entry ~8 s -> ~3 s, the deflation twin
    # ~14.5 s -> ~6 s (steady-state builder+execute).
    one = _pca_normalized(_power_chain(spark, c, dims, T)).crossJoin(
        F.broadcast(stats1.select("n"))
    )
    return (
        one.select(
            F.posexplode("varr").alias("dim", "eigvec_fp"),
            F.expr(
                f"CAST(m div CAST(n AS {_DEC}) div"
                f" CAST({S} AS {_DEC}) AS BIGINT)"
            ).alias("lambda_fp12"),
            "n",
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("eigvec_fp").cast("long").alias("eigvec_fp"),
            "lambda_fp12",
            F.col("n").cast("long").alias("n"),
        )
        .orderBy(F.asc("dim"))
    )


@REGISTRY.add(
    "pca_power_iteration",
    _pca_oracle(PCA_DIMS),
    doc=f"Dominant PCA eigenvector over the FULL d={PCA_DIMS} fixture "
    f"embeddings by {PCA_ITERS} exact fixed-point power-iteration "
    "steps: each step is ONE corpus scan that projects the per-row "
    "dot product once (zip_with + aggregate over the fixed-point "
    f"array — O(d) multiplies) and folds {PCA_DIMS} map-side "
    "DECIMAL(38,0) accumulators — the covariance matrix is never "
    "materialized and no stage carries O(d^2) expressions, which is "
    "why this shape survives d=1024 at 100 TB where an explicit "
    "d x d product cannot. The iterate is renormalized by INFINITY "
    "norm with truncating integer division (v' = (y * S) div max|y|) "
    "so every step is exact integer algebra: no float accumulation, "
    "bit-identical under any partitioning, and the oracle replays "
    "the identical recurrence relationally (positional-unnest "
    "triples, rid-keyed dot join, i-keyed fold per unrolled "
    "iteration, HUGEINT staging) — cell-equality pins all "
    f"{PCA_ITERS} iterations, the truncated-mean centering, and the "
    "final eigenvalue estimate (infinity-norm growth, scale 1e12). "
    "Driver state: the d-element iterate per step (k-means "
    "discipline); last step's normalize runs in-plan.",
    tags=("embedding", "pca", "iterative", "agg"),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pca_frame(spark, sf_dir, PCA_DIMS)


# --- round 11: top-k PCA by exact integer deflation -----------------------
#
# The stretch past the dominant eigenvector: extract the top K
# components by Hotelling deflation, kept in the SAME exact integer
# fixed-point discipline as the power iteration above. After component
# v is extracted, every centered row deflates to
#
#   c' = (c * (v.v) - (c.v) * v) div (v.v)        (elementwise)
#
# — the orthogonal-projection residual, scaled back by one truncating
# integer division so magnitudes stay ~|c| and the recurrence remains
# exact integer algebra both engines replicate bit-for-bit (Spark
# `div` and DuckDB HUGEINT `//` both truncate toward zero). The
# deflated frame is checkpointed (n x d decimals) and the next
# component's power iteration runs unchanged on it.
#
# Numeric staging: |v| <= S so v.v <= d*S^2 ~ 6.4e13; the deflation
# numerator is bounded by |c|*q + |dot|*S ~ 2e6*6.4e13 + 1.3e14*1e6
# ~ 2.6e20 — deep inside DECIMAL(38,0); post-division |c'| <= ~4e6,
# so each component's iteration keeps the parent entry's n <= ~1e11
# row headroom. Driver state: K x d integers (the k-means discipline).

PCA_TOPK = 3
#: iterations per component — 3 (vs the flagship entry's 5): each
#: driver-looped step costs a fixed ~0.5 s of plan analysis for the
#: d=64 aggregate tree regardless of data size, and the entry's gate
#: is the EXACTNESS of the deflation recurrence, not convergence
#: (the oracle unrolls whatever T says; the flagship single-component
#: entry keeps T=5 for the better eigenpair estimate)
PCA_TOPK_ITERS = 3


def _pca_topk_oracle(dims: int, k: int) -> str:
    S, T = COV_FP, PCA_TOPK_ITERS
    ctes = [
        f"""ex AS MATERIALIZED (
      SELECT rid, i,
             CAST(FLOOR(CAST(v AS DOUBLE) * {S}) AS HUGEINT) AS x
      FROM (SELECT row_number() OVER () AS rid,
                   unnest(embedding) AS v,
                   unnest(range(len(embedding))) AS i
            FROM embeddings)
      WHERE i < {dims}
    )""",
        """st AS MATERIALIZED (
      SELECT i, SUM(x) AS sx, CAST(COUNT(*) AS HUGEINT) AS n
      FROM ex GROUP BY i
    )""",
        """c0 AS MATERIALIZED (
      SELECT ex.rid, ex.i, ex.x - (st.sx // st.n) AS cx
      FROM ex JOIN st ON st.i = ex.i
    )""",
    ]
    for comp in range(k):
        c = f"c{comp}"
        ctes.append(
            f"v{comp}_0 AS MATERIALIZED "
            f"(SELECT i, CAST({S} AS HUGEINT) AS v FROM st)"
        )
        for t in range(1, T + 1):
            ctes.append(
                f"""d{comp}_{t} AS MATERIALIZED (
      SELECT c.rid, SUM(c.cx * v.v) AS dot
      FROM {c} c JOIN v{comp}_{t - 1} v ON v.i = c.i GROUP BY c.rid
    )"""
            )
            ctes.append(
                f"""y{comp}_{t} AS MATERIALIZED (
      SELECT c.i, SUM(c.cx * d.dot) AS y
      FROM {c} c JOIN d{comp}_{t} d ON d.rid = c.rid GROUP BY c.i
    )"""
            )
            ctes.append(
                f"m{comp}_{t} AS MATERIALIZED "
                f"(SELECT MAX(ABS(y)) AS m FROM y{comp}_{t})"
            )
            if t < T:
                ctes.append(
                    f"""v{comp}_{t} AS MATERIALIZED (
      SELECT i, (y * {S}) // (SELECT m FROM m{comp}_{t}) AS v
      FROM y{comp}_{t}
    )"""
                )
        ctes.append(
            f"""vf{comp} AS MATERIALIZED (
      SELECT i, (y * {S}) // (SELECT m FROM m{comp}_{T}) AS v
      FROM y{comp}_{T}
    )"""
        )
        if comp < k - 1:
            ctes.append(
                f"q{comp} AS MATERIALIZED "
                f"(SELECT SUM(v * v) AS q FROM vf{comp})"
            )
            ctes.append(
                f"""pd{comp} AS MATERIALIZED (
      SELECT c.rid, SUM(c.cx * v.v) AS dt
      FROM {c} c JOIN vf{comp} v ON v.i = c.i GROUP BY c.rid
    )"""
            )
            ctes.append(
                f"""c{comp + 1} AS MATERIALIZED (
      SELECT c.rid, c.i,
             (c.cx * (SELECT q FROM q{comp}) - p.dt * v.v)
               // (SELECT q FROM q{comp}) AS cx
      FROM {c} c
      JOIN pd{comp} p ON p.rid = c.rid
      JOIN vf{comp} v ON v.i = c.i
    )"""
            )
    rows = " UNION ALL ".join(
        f"SELECT CAST({comp} AS BIGINT) AS component,"
        f" CAST(i AS BIGINT) AS dim, CAST(v AS BIGINT) AS eigvec_fp,"
        f" CAST((SELECT m FROM m{comp}_{T})"
        f" // ((SELECT MIN(n) FROM st) * {S}) AS BIGINT) AS lambda_fp12"
        f" FROM vf{comp}"
        for comp in range(k)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" {rows} ORDER BY component ASC, dim ASC"
    )


@REGISTRY.add(
    "pca_topk_deflation",
    _pca_topk_oracle(PCA_DIMS, PCA_TOPK),
    doc=f"Top-{PCA_TOPK} PCA components at d={PCA_DIMS} by power "
    "iteration + exact integer Hotelling deflation: after each "
    "component, every centered row deflates to its projection "
    "residual c' = (c*(v.v) - (c.v)*v) div (v.v) — one truncating "
    "integer division keeps magnitudes ~|c| so the recurrence stays "
    "exact integer algebra end to end, bit-identical under any "
    "partitioning and engine (Spark div == DuckDB HUGEINT //, both "
    "truncate toward zero). Per component the corpus work is the "
    "parent entry's: T scans each projecting the per-row dot once "
    "(O(d) per row per stage), plus ONE deflation projection; the "
    "deflated frame checkpoints at n x d decimals and the covariance "
    "matrix is never materialized — the whitening/embedding-analysis "
    "shape that survives d=1024 at 100 TB. Driver state is K x d "
    f"integers. The oracle unrolls all {PCA_TOPK * PCA_TOPK_ITERS} "
    "iterations AND both deflation steps relationally (HUGEINT CTE "
    "chain); cell-equality pins every normalize, every truncated "
    "division, and each component's eigenvalue estimate.",
    tags=("embedding", "pca", "iterative", "deflation"),
)
def pca_topk_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, S, T, K = PCA_DIMS, COV_FP, PCA_TOPK_ITERS, PCA_TOPK
    # long-staged centered frame + 1-row stats, shared with the parent
    # entry (_pca_centered): the means flow as data, no collect()
    cur, stats1 = _pca_centered(spark, sf_dir, d)

    # Per component: the T-step power recurrence runs as ONE lazy plan
    # (the literal-free chain — see _pca_step), materialized once into
    # a 1-row (varr, m) checkpoint because it feeds BOTH the output
    # union and the deflation projection. Deflation likewise flows the
    # finished component as data (q = v.v computed from the same row),
    # so no driver collect exists anywhere in the K x T recurrence —
    # driver state is K 1-row checkpoints, not K*T round trips.
    # A FUSED variant was measured and REJECTED (r13, guide §1.1 —
    # measure, then decide): riding the finished component's 1-row
    # (varr, m, q) on the deflation plan so ONE localCheckpoint lands
    # both the next base and the output component (K-1 fewer serial
    # driver actions) produced bit-identical rows but NO win at sf0.1
    # (interleaved min-of-4: 6.16 s two-action form vs 6.27 s fused
    # under like contention) — the saved round trips are offset by the
    # per-row (varr, m) attachment widening the checkpoint, and at
    # scale that duplication grows with n while the round trips do
    # not. The two-action form stays.
    finals: list[DataFrame] = []
    for comp in range(K):
        fin = _pca_normalized(
            _power_chain(spark, cur, d, T)
        ).localCheckpoint()
        finals.append(
            fin.select(
                F.lit(comp).cast("long").alias("component"), "varr", "m"
            )
        )
        if comp < K - 1:
            # c and dot are longs; x*q and dot*w exceed int64, so the
            # numerator stages through decimal and `div` lands the
            # quotient (|c'| <= ~4e6) back in BIGINT
            vq = fin.select(
                "varr",
                F.aggregate(
                    F.zip_with("varr", "varr", lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("q"),
            )
            dot = F.aggregate(
                F.zip_with("c", "varr", lambda x, w: x * w),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            defl = (
                f"zip_with(c, varr, (x, w) -> "
                f"CAST((CAST(x AS {_DEC}) * q"
                f" - CAST(dot AS {_DEC}) * w)"
                f" div CAST(q AS {_DEC}) AS BIGINT))"
            )
            cur = (
                cur.crossJoin(F.broadcast(vq))
                .withColumn("dot", dot)
                .select(F.expr(defl).alias("c"))
                .localCheckpoint()  # n x d longs; next component's base
            )

    rows = finals[0]
    for f2 in finals[1:]:
        rows = rows.unionByName(f2)
    return (
        rows.crossJoin(F.broadcast(stats1.select("n")))
        .select(
            "component",
            F.posexplode("varr").alias("dim", "eigvec_fp"),
            F.expr(
                f"CAST(m div CAST(n AS {_DEC}) div"
                f" CAST({S} AS {_DEC}) AS BIGINT)"
            ).alias("lambda_fp12"),
        )
        .select(
            "component",
            F.col("dim").cast("long").alias("dim"),
            F.col("eigvec_fp").cast("long").alias("eigvec_fp"),
            "lambda_fp12",
        )
        .orderBy(F.asc("component"), F.asc("dim"))
    )
