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
