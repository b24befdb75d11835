"""Registry exposure for the physical-layout operator family
(sources/layout.py): the Z-order clustering claim, oracle-checked.

``write_events_zordered`` proves FILE-level pruning in unit tests by
reading parquet footers back; an oracle cannot see files, so this
entry proves the same geometry one level up, deterministically: bucket
rows by fixed ranges of the Morton key (not Spark's sampled range
partitioner — fixed ``z div 2^(32-log2 B)`` boundaries both engines
compute identically) and measure each bucket's bounding extents on
BOTH dimensions, next to the 1-D (time-ordered) bucketing baseline.

The geometry being pinned: with B buckets over a (user, ts) grid,
1-D time bucketing gives extents (~full user span, ~ts span/B) — a
user-scoped predicate overlaps EVERY bucket; the Z-curve gives
(~span/sqrt(B), ~span/sqrt(B)) — both predicate families prune to
~1/sqrt(B) of the data. The emitted numbers ARE those extents, so the
oracle match both verifies the bit-interleave arithmetic cross-engine
and records the clustering win as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.layout import _interleave_bits_expr
from ..sources.tables import load_table
from .core import REGISTRY

Z_BUCKETS = 64  # fixed bucket count: 32-bit Morton key >> 26
_SHIFT = 32 - 6  # log2(Z_BUCKETS)


def _duck_interleave(u: str, t: str) -> str:
    terms = []
    for i in range(16):
        terms.append(f"((({u} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({t} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


_ORACLE = f"""
WITH bounds AS (
  SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
         MIN(epoch_us(ts) // 1000000) AS lo_t,
         MAX(epoch_us(ts) // 1000000) AS hi_t
  FROM events
), keyed AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS tsec,
         ((user_id - b.lo_u) * 65535) // GREATEST(1, b.hi_u - b.lo_u) AS nu,
         ((epoch_us(ts) // 1000000 - b.lo_t) * 65535)
           // GREATEST(1, b.hi_t - b.lo_t) AS nt
  FROM events, bounds b
), z AS (
  SELECT user_id, tsec,
         {_duck_interleave("nu", "nt")} >> {_SHIFT} AS zbucket,
         nt // 1024 AS tbucket
  FROM keyed
), zper AS (
  SELECT zbucket, MAX(user_id) - MIN(user_id) AS ext_u,
         MAX(tsec) - MIN(tsec) AS ext_t
  FROM z GROUP BY zbucket
), tper AS (
  SELECT tbucket, MAX(user_id) - MIN(user_id) AS ext_u,
         MAX(tsec) - MIN(tsec) AS ext_t
  FROM z GROUP BY tbucket
)
SELECT 'time_1d' AS scheme,
       CAST(FLOOR(AVG(ext_u)) AS BIGINT) AS avg_user_extent,
       CAST(FLOOR(AVG(ext_t)) AS BIGINT) AS avg_ts_extent_s,
       CAST(COUNT(*) AS BIGINT) AS buckets
FROM tper
UNION ALL
SELECT 'zorder',
       CAST(FLOOR(AVG(ext_u)) AS BIGINT),
       CAST(FLOOR(AVG(ext_t)) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM zper
ORDER BY scheme ASC
"""


@REGISTRY.add(
    "zorder_clustering_stats",
    _ORACLE,
    doc=f"Z-order clustering measured as data (sources/layout.py's "
    "Morton machinery, oracle-scored): rank-normalize (user_id, "
    "ts-seconds) to 16 bits, interleave into a 32-bit Morton key — "
    "pure shift/mask Catalyst arithmetic mirrored bit-for-bit in the "
    f"oracle — then bucket by FIXED key ranges ({Z_BUCKETS} buckets, "
    "z >> 26; deterministic, unlike a sampled range partitioner) and "
    "emit each scheme's mean per-bucket bounding extents on BOTH "
    "dimensions next to the 1-D time-bucketing baseline. The geometry "
    "this pins: 1-D buckets span the FULL user range (a user predicate "
    "prunes nothing) while Z buckets shrink both extents toward "
    "span/sqrt(B) — the reason a 100-TB table layout uses the curve "
    "for multi-dimension predicates. File-level footer pruning over "
    "the same keys is proven in tests/test_layout.py; this entry makes "
    "the interleave arithmetic and the clustering win driver-scored.",
    tags=("layout", "zorder", "stats"),
)
def zorder_clustering_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact integer arithmetic end to end: ts truncated to whole
    # seconds with floor semantics in both engines (Spark timestamp ->
    # long == floorDiv(micros, 1e6); DuckDB epoch_us // 1e6 — both
    # exact on positive epochs), normalization by integer div (a
    # double division rounds the quotient and can cross an integer
    # where floor division does not), and FLOOR around the final AVG
    # (DuckDB CAST(double AS BIGINT) rounds, Spark's cast truncates —
    # FLOOR is the mode-free meeting point).
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("tsec")
    )
    lo_u, hi_u, lo_t, hi_t = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsec"), F.max("tsec")
    ).collect()[0]
    span_u = max(1, hi_u - lo_u)
    span_t = max(1, hi_t - lo_t)
    nu = F.expr(f"((user_id - {lo_u}L) * 65535L) div {span_u}L")
    nt = F.expr(f"((tsec - {lo_t}L) * 65535L) div {span_t}L")
    keyed = e.select(
        "user_id",
        "tsec",
        F.shiftrightunsigned(_interleave_bits_expr(nu, nt), _SHIFT).alias(
            "zbucket"
        ),
        nt.alias("nt"),
    ).withColumn("tbucket", F.expr("nt div 1024"))

    def extents(bucket_col: str, scheme: str) -> DataFrame:
        per = keyed.groupBy(bucket_col).agg(
            (F.max("user_id") - F.min("user_id")).alias("ext_u"),
            (F.max("tsec") - F.min("tsec")).alias("ext_t"),
        )
        return per.agg(
            F.floor(F.avg("ext_u")).cast("long").alias("avg_user_extent"),
            F.floor(F.avg("ext_t")).cast("long").alias("avg_ts_extent_s"),
            F.count(F.lit(1)).cast("long").alias("buckets"),
        ).select(
            F.lit(scheme).alias("scheme"),
            "avg_user_extent",
            "avg_ts_extent_s",
            "buckets",
        )

    return (
        extents("tbucket", "time_1d")
        .unionByName(extents("zbucket", "zorder"))
        .orderBy(F.asc("scheme"))
    )
