"""Registry entry: fixed-point PageRank over the item-transition graph.

Link-authority weighting is a standard large-corpus curation signal
(CommonCrawl-derived pipelines rank hosts/pages by link graph before
sampling — e.g. RefinedWeb, CCNet); the reference's graph surface is
the cross-repo link hotspot count (``gh_cross_repo_links``).  This
query adds the iterative-graph-algorithm class: PageRank (Brin &
Page 1998) over the item→item transition graph mined from the events
stream (per user, consecutive ``props.k`` items ordered by ts —
lag-window machinery from the §2.5 family), run for a fixed 3
iterations.

The engine-parity trick mirrors ``kmeans_cluster_sizes``'s CTE unroll,
upgraded from "collect k×dim floats" to **zero driver state**: every
rank is a BIGINT in fixed-point micro-units (SCALE = 1e6) and every
per-edge contribution is one exact integer floor division —
``(r * w * 85) div (out_w * 100)`` — so Spark and DuckDB agree
cell-exact, no float ever enters the computation.  Bound check:
``r <= n_nodes * SCALE``, so the int64 numerator stays below
``1e8 * w_max * 85`` — orders of magnitude inside 2^63 at any
realistic fan-in.  Dangling-node mass is dropped (documented
simplification: ranks are a *relative* authority signal here, not a
probability distribution).

Scale shape (100 TB of events): one window pass builds edges (shuffle
keyed by user), one groupBy collapses them to (src, dst, w) — after
which the corpus is out of the picture; each iteration is a
src-keyed broadcast-or-shuffle join plus a dst-keyed aggregation over
the EDGE table (node- and edge-bounded, not event-bounded).  Ranks
never leave the cluster; the only driver transfer is the final
top-20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from .core import REGISTRY

SCALE = 1_000_000
DAMP_NUM = 85  # d = 0.85 as an exact ratio
DAMP_DEN = 100
N_ITERS = 3
TOP_K = 20

_BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # (1-d)*SCALE exactly


def _iter_ctes() -> str:
    ctes = [
        f"r0 AS (SELECT item, CAST({SCALE} AS BIGINT) AS r FROM nodes)"
    ]
    for i in range(1, N_ITERS + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""c{i} AS (
      SELECT e.dst AS item,
             SUM((p.r * e.w * {DAMP_NUM}) // (o.ow * {DAMP_DEN})) AS c
      FROM edges e
      JOIN outw o ON o.src = e.src
      JOIN {prev} p ON p.item = e.src
      GROUP BY e.dst
    ), r{i} AS (
      SELECT n.item,
             CAST({_BASE} + COALESCE(c{i}.c, 0) AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} ON c{i}.item = n.item
    )"""
        )
    return ", ".join(ctes)


_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item
  FROM events
), lagged AS (
  SELECT LAG(item) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS src,
         item AS dst
  FROM seq
), edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lagged WHERE src IS NOT NULL GROUP BY src, dst
), outw AS (
  SELECT src, SUM(w) AS ow FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT item FROM (
    SELECT src AS item FROM edges UNION SELECT dst FROM edges)
), {_iter_ctes()}
SELECT item, r AS pagerank_fp
FROM r{N_ITERS}
ORDER BY r DESC, item ASC
LIMIT {TOP_K}
"""


@REGISTRY.add(
    "events_item_pagerank",
    _ORACLE,
    doc="Fixed-point integer PageRank (3 unrolled iterations, d=0.85 "
    "as the exact ratio 85/100, ranks in BIGINT micro-units) over the "
    "item-to-item transition graph mined from per-user event "
    "sequences. Every contribution is one exact integer floor "
    "division, so the DuckDB unrolled-CTE oracle agrees cell-exact — "
    "the iterative-graph class beyond connected components, with "
    "ZERO driver-side state (unlike k-means' k-by-dim collects, the "
    "rank table never leaves the cluster). Link-authority curation "
    "signal in the RefinedWeb/CCNet tradition.",
    tags=("graph", "events", "iterative"),
)
def events_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "props"
        )
    )
    item = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    lagged = ev.select(
        F.lag(item).over(w).alias("src"), item.alias("dst")
    )
    edges = (
        lagged.filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # materialize the weighted edge + node tables once: the event
    # corpus is gone after this point — without the checkpoint the
    # unrolled DAG would rescan events once per iteration (and the
    # repeated self-reference of the edge table across iterations
    # would trip Spark's ambiguous-self-join lineage checks)
    e = edges.join(outw, "src").localCheckpoint()
    # nodes derive from the MATERIALIZED edge table, not the raw edges
    # lineage — otherwise this checkpoint would replay the per-user
    # window + edge groupBy (a second full pass over events)
    nodes = (
        e.select(F.col("src").alias("item"))
        .unionByName(e.select(F.col("dst").alias("item")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("item", F.lit(SCALE).cast("long").alias("r"))
    for _ in range(N_ITERS):
        r_src = ranks.select(F.col("item").alias("r_src"), F.col("r"))
        contrib = (
            e.join(r_src, F.col("src") == F.col("r_src"))
            .select(
                F.col("dst"),
                F.expr(
                    f"(r * w * {DAMP_NUM}) div (ow * {DAMP_DEN})"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["item"] == contrib["dst"], "left"
        ).select(
            "item",
            (F.lit(_BASE) + F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("r"),
        )
    return (
        ranks.select("item", F.col("r").alias("pagerank_fp"))
        .orderBy(F.desc("pagerank_fp"), F.asc("item"))
        .limit(TOP_K)
    )


# --- round 10: triangle counting via degree-ordered orientation -------------
#
# The registry's graph family covers the iterative classes (PageRank,
# pointer-jumping connected components); this adds the COUNTING class
# — exact triangle census + global clustering coefficient, the
# standard cohesion statistic of a co-interaction graph. The naive
# plan (three-way self-join of the edge list) explodes on hub nodes:
# a node of degree d contributes C(d,2) wedges, and real graphs have
# d ~ |V|. The classic fix (Schank & Wagner 2005; Suri &
# Vassilvitskii 2011 for the MapReduce form) ORIENTS every edge from
# its lower-(degree, id) endpoint to its higher one — an acyclic
# tournament under a total order — which provably caps every node's
# OUT-degree at O(sqrt(m)); wedges are then generated only from
# out-neighbor pairs, so the wedge stream is m^1.5-bounded no matter
# how skewed the degree distribution is, and each triangle is
# produced exactly once (its smallest-order vertex emits it).
#
# Graph: undirected item co-transition graph (both directions of the
# PageRank entry's edges collapsed), thinned to edges of at-least-mean
# weight (w * |E| >= W_total — integer-exact, data-relative, so the
# rule is meaningful at every SF). Self-loops excluded.

TRI_SCALE = 1_000_000

def _edges_sql(undirected: bool) -> str:
    """Oracle CTE chain for the thinned item co-transition edge set —
    ONE text shared by the triangle census (undirected fold) and BFS
    (directed) so the two entries (and their tests) cannot drift: the
    props-regex extraction, the per-user lag window, the (src, dst)
    weight rollup, and the at-least-mean-weight thinning rule
    (w * |E| >= W_total, integer-exact) are written exactly once.
    ``e`` ends the chain with columns (a, b) or (src, dst)."""
    base = """
    seq AS (
      SELECT user_id, ts, event_id,
             CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item
      FROM events
    ), lagged AS (
      SELECT LAG(item) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS src,
             item AS dst
      FROM seq
    ), dir AS (
      SELECT src, dst, COUNT(*) AS w
      FROM lagged WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2
    )"""
    if undirected:
        return base + """, und AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
             SUM(w) AS w
      FROM dir GROUP BY 1, 2
    ), tot AS (
      SELECT COUNT(*) AS ecnt, SUM(w) AS wtot FROM und
    ), e AS (
      SELECT a, b FROM und, tot WHERE w * ecnt >= wtot
    )"""
    return base + """, tot AS (
      SELECT COUNT(*) AS ecnt, SUM(w) AS wtot FROM dir
    ), e AS (
      SELECT src, dst FROM dir, tot WHERE w * ecnt >= wtot
    )"""


def item_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed (src, dst, w) item co-transition counts: per-user lag
    window over the events stream, self-loops dropped, collapsed to
    the pair-bounded weight table and localCheckpoint'd so downstream
    graph work never rescans the event corpus. The Spark twin of the
    ``seq``/``lagged``/``dir`` oracle CTEs — shared by the triangle
    census, BFS, and their tests (one copy, no drift)."""
    ev = spread(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "props"
        )
    )
    item = F.regexp_extract("props", r'"k": (\d+)', 1).cast("long")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    lagged = ev.select(F.lag(item).over(w).alias("src"), item.alias("dst"))
    return (
        lagged.filter(
            F.col("src").isNotNull() & (F.col("src") != F.col("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        # item-pair-bounded (catalog^2, not corpus); pins the single
        # events scan for everything downstream
        .localCheckpoint()
    )


def item_edges(
    spark: SparkSession, sf_dir: str, undirected: bool
) -> DataFrame:
    """Thinned edge set: ``item_transitions`` (optionally folded to
    undirected via LEAST/GREATEST + SUM) filtered to at-least-mean
    weight (w * |E| >= W_total — integer-exact, data-relative). The
    Spark twin of ``_edges_sql``; columns (a, b) when undirected,
    (src, dst) otherwise. localCheckpoint'd: edge-bounded, reused by
    every downstream stage (deg/orient/close or per-hop joins)."""
    dir_ = item_transitions(spark, sf_dir)
    if undirected:
        base = (
            dir_.groupBy(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .agg(F.sum("w").alias("w"))
            .localCheckpoint()  # pair-bounded; feeds tot AND the filter
        )
        cols = ("a", "b")
    else:
        base, cols = dir_, ("src", "dst")
    tot = base.agg(
        F.count(F.lit(1)).alias("ecnt"), F.sum("w").alias("wtot")
    )
    return (
        base.crossJoin(F.broadcast(tot))  # whitelisted 1-row attach
        .filter(F.col("w") * F.col("ecnt") >= F.col("wtot"))
        .select(*cols)
        .localCheckpoint()
    )


@REGISTRY.add(
    "events_triangle_census",
    f"""
    WITH {_edges_sql(undirected=True)}, deg AS (
      SELECT v, COUNT(*) AS d
      FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CASE WHEN SUM(d * (d - 1) // 2) = 0 THEN 0 ELSE
              CAST((CAST(3 AS HUGEINT) * (SELECT t FROM tri)
                    * {TRI_SCALE})
                   // SUM(d * (d - 1) // 2) AS BIGINT) END
            FROM deg) AS clustering_e6
    """,
    doc="Exact triangle census + global clustering coefficient "
    "(3T/wedges, fixed-point e6) of the item co-transition graph, "
    "thinned to at-least-mean-weight edges (w*|E| >= W_total, "
    "integer-exact and data-relative). The Spark side counts by "
    "DEGREE-ORDERED ORIENTATION (Schank-Wagner/Suri-Vassilvitskii): "
    "each edge points from its lower-(degree,id) endpoint to the "
    "higher, capping every out-degree at O(sqrt(m)); wedges come only "
    "from out-neighbor pairs and close against the oriented edge set "
    "with one semi-join, so the wedge stream is m^1.5-bounded under "
    "ANY degree skew and each triangle is found exactly once. The "
    "oracle runs the naive three-way self-join the orientation "
    "replaces — cell-equality proves the oriented count is the true "
    "census. 3T*1e6 stages in DECIMAL(38,0)/HUGEINT (T ~ m^1.5 "
    "passes BIGINT*1e6 headroom at ~1e12 edges).",
    tags=("graph", "events", "triangles", "skew"),
)
def events_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = item_edges(spark, sf_dir, undirected=True)
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("degb"))
    # orient: lower (degree, id) -> higher; carry the head's order key
    # so wedge generation can order out-neighbors without a re-join
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias(
                "ddeg"
            ),
        )
        .localCheckpoint()  # oriented edges: reused by wedge + close
    )
    x = o.select(
        F.col("src"), F.col("dst").alias("bb"), F.col("ddeg").alias("degbb")
    )
    y = o.select(
        F.col("src"), F.col("dst").alias("cc"), F.col("ddeg").alias("degcc")
    )
    # out-neighbor pairs ordered by the SAME total order the
    # orientation used, so the closing edge (if any) is exactly bb->cc
    wedges = x.join(y, "src").filter(
        (F.col("degbb") < F.col("degcc"))
        | ((F.col("degbb") == F.col("degcc")) & (F.col("bb") < F.col("cc")))
    )
    closed = wedges.join(
        o.select(F.col("src").alias("bb"), F.col("dst").alias("cc")),
        ["bb", "cc"],
        "left_semi",
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("t"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    # four 1-row scalar aggregates assembled by whitelisted broadcasts
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").cast("long").alias("n_triangles"),
            F.when(F.col("n_wedges") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    f"CAST((CAST(3 AS DECIMAL(38,0)) * t * {TRI_SCALE})"
                    " div n_wedges AS BIGINT)"
                )
            )
            .alias("clustering_e6"),
        )
    )


# --- round 10: bounded-hop BFS reachability ---------------------------------
#
# Third graph class: single-source-set SHORTEST HOPS (bounded BFS) —
# the blast-radius question ("everything within H co-interaction hops
# of a flagged seed set") that neither PageRank (global authority) nor
# connected components (unbounded reachability) answers. Fixed H
# unrolls to H keyed joins — the exact batch analog of Pregel
# supersteps — so the DuckDB twin is the same recurrence as unrolled
# CTEs, cell-exact in integers. The seed set stands in for an
# externally supplied flag list (recall/contamination/incident): the
# fixture uses the deterministic item%10=0 so both engines agree
# without shipping a side file.

BFS_HOPS = 3


def _bfs_iter_ctes() -> str:
    ctes = []
    for i in range(1, BFS_HOPS + 1):
        p = f"d{i - 1}"
        ctes.append(
            f"""d{i} AS (
      SELECT item, MIN(h) AS h FROM (
        SELECT item, h FROM {p}
        UNION ALL
        SELECT e.dst AS item, {p}.h + 1 AS h
        FROM e JOIN {p} ON {p}.item = e.src
      ) GROUP BY item
    )"""
        )
    return ", ".join(ctes)


@REGISTRY.add(
    "events_bfs_reach",
    f"""
    WITH {_edges_sql(undirected=False)}, nodes AS (
      SELECT DISTINCT v AS item FROM (
        SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
    ), d0 AS (
      SELECT item, 0 AS h FROM nodes WHERE item % 10 = 0
    ), {_bfs_iter_ctes()}
    SELECT item, CAST(h AS BIGINT) AS hops
    FROM d{BFS_HOPS}
    ORDER BY hops ASC, item ASC
    """,
    doc=f"Bounded-hop BFS (H={BFS_HOPS}) over the directed "
    "at-least-mean-weight item-transition graph from a deterministic "
    "seed set (item%10=0 stands in for an external flag list): "
    "min-hop distance per reachable item — the blast-radius query "
    "between PageRank (authority) and connected components "
    "(unbounded reach). Each hop is ONE src-keyed join of the "
    "edge table against the frontier-so-far plus a min-aggregation "
    "(the Pregel superstep as a batch plan); the corpus collapses to "
    "the edge table before any iteration, and per-hop state is "
    "node-bounded. The oracle unrolls the identical recurrence as "
    f"{BFS_HOPS} chained CTEs — cell-exact integer hop levels.",
    tags=("graph", "events", "bfs", "iterative"),
)
def events_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = item_edges(spark, sf_dir, undirected=False)
    nodes = (
        e.select(F.col("src").alias("item"))
        .unionByName(e.select(F.col("dst").alias("item")))
        .distinct()
    )
    dist = nodes.filter(F.col("item") % 10 == 0).select(
        "item", F.lit(0).alias("h")
    )
    for _ in range(BFS_HOPS):
        step = (
            e.join(dist.select(F.col("item").alias("src"), "h"), "src")
            .select(F.col("dst").alias("item"), (F.col("h") + 1).alias("h"))
        )
        dist = (
            dist.unionByName(step).groupBy("item").agg(F.min("h").alias("h"))
        )
    return dist.select("item", F.col("h").cast("long").alias("hops")).orderBy(
        F.asc("hops"), F.asc("item")
    )
