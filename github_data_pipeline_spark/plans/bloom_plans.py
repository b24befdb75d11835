"""Registry entry: Bloom-filter pre-join pruning, cell-exact.

The runtime-filter pattern behind every modern engine's large-join
optimization (Spark's own ``spark.sql.optimizer.runtimeFilter.*``
injects exactly this): build a Bloom filter over the small/filtered
side's join keys, ship it to the big side's scan, and drop rows that
cannot match BEFORE the shuffle. The win at 100 TB is the shuffle you
never pay: a fact table probing a K-hash M-bit bitmap locally forwards
only (matches + false positives) rows to the exchange, and the filter
itself is a constant-size broadcast no matter how big either side is.

Engine-built runtime filters are invisible to an oracle, so this entry
builds the structure EXPLICITLY with the repo's engine-neutral md5
hash family: K bit positions per key, the filter as <= M/32 (word,
mask) rows folded with bit_or (mergeable, map-side combinable — the
same monoid discipline as the KMV/CMS sketches), and the probe as a
left join on the word index + bitwise tests. DuckDB rebuilds the
identical bitmap, so the report — build keys, bits set, probe rows,
true matches, Bloom passes, false positives, and the no-false-negative
flag the structure guarantees — compares cell-exact. Geometry is
deliberately small so false positives are REAL data, not prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .core import REGISTRY

#: filter geometry: M bits (M/32 int words), K hash probes per key —
#: sized small so the fixture produces real false positives
BLOOM_M = 32768
BLOOM_K = 3


def _pos_sql(i: int, col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('b{i}:' || CAST({col} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {BLOOM_M}"
    )


def _pos_col(i: int, col: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{i}:"), F.col(col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % BLOOM_M
    )


@REGISTRY.add(
    "bloom_prejoin_report",
    f"""
    WITH build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ), pos AS (
      SELECT DISTINCT p FROM (
        {" UNION ALL ".join(
            f"SELECT {_pos_sql(i, 'k')} AS p FROM build"
            for i in range(BLOOM_K)
        )}
      )
    ), words AS (
      SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
      FROM pos GROUP BY p // 32
    ), probe AS (
      SELECT l_orderkey AS k,
             {", ".join(
                 f"{_pos_sql(i, 'l_orderkey')} AS p{i}"
                 for i in range(BLOOM_K)
             )}
      FROM lineitem
    ), tested AS (
      SELECT probe.k,
             {" + ".join(
                 f"(CASE WHEN COALESCE(w{i}.mask, 0)"
                 f" & (1::BIGINT << CAST(p{i} % 32 AS INT)) <> 0"
                 f" THEN 1 ELSE 0 END)"
                 for i in range(BLOOM_K)
             )} AS hits
      FROM probe
      {" ".join(
          f"LEFT JOIN words w{i} ON w{i}.w = p{i} // 32"
          for i in range(BLOOM_K)
      )}
    ), scored AS (
      SELECT t.k, t.hits = {BLOOM_K} AS pass,
             EXISTS (SELECT 1 FROM build b WHERE b.k = t.k) AS is_match
      FROM tested t
    )
    SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS build_keys,
           CAST((SELECT COUNT(*) FROM pos) AS BIGINT) AS bloom_bits_set,
           CAST(COUNT(*) AS BIGINT) AS probe_rows,
           CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
             AS true_matches,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
             AS bloom_passes,
           CAST(SUM(CASE WHEN pass AND NOT is_match THEN 1 ELSE 0 END)
                AS BIGINT) AS false_positives,
           CAST(CASE WHEN SUM(CASE WHEN is_match AND NOT pass
                             THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END AS INT) AS no_false_negatives
    FROM scored
    """,
    doc=f"Bloom-filter pre-join pruning made explicit and oracle-"
    f"checkable: a {BLOOM_M}-bit / {BLOOM_K}-hash filter over the "
    "URGENT orders' keys, folded as <= "
    f"{BLOOM_M // 32} (word, bit_or mask) rows — the mergeable "
    "monoid the KMV/CMS sketches use — then probed by every lineitem "
    "row with word-indexed joins and bitwise tests. The report pins "
    "build keys, bits set, probe rows, true matches, Bloom passes, "
    "false positives (REAL at this geometry, not prose), and the "
    "no-false-negative guarantee as data. This is the structure "
    "behind engine runtime filters (Spark runtimeFilter, and the "
    "shuffle it deletes at 100 TB: only matches + false positives "
    "reach the exchange; the filter itself is a constant-size "
    "broadcast) — built from the engine-neutral md5 family so DuckDB "
    "rebuilds the identical bitmap and every number compares "
    "cell-exact.",
    tags=("join", "bloom", "sketch", "runtime-filter"),
)
def bloom_prejoin_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .localCheckpoint()  # build side: feeds positions + exact match
    )
    pos = (
        build.select(
            F.explode(
                F.array(*[_pos_col(i, "k") for i in range(BLOOM_K)])
            ).alias("p")
        )
        .distinct()
    )
    words = (
        pos.groupBy(F.expr("p div 32").alias("w"))
        .agg(
            F.bit_or(F.expr("shiftleft(1L, CAST(p % 32 AS INT))")).alias(
                "mask"
            )
        )
        .localCheckpoint()  # <= M/32 rows: the constant-size filter
        # (32-bit words: DuckDB's checked << overflows at 1<<63, so
        # the shared geometry caps shifts at bit 31 on both engines)
    )
    n_bits = pos.agg(F.count(F.lit(1)).alias("bloom_bits_set"))
    n_build = build.agg(F.count(F.lit(1)).alias("build_keys"))
    probe = li.select(
        F.col("l_orderkey").alias("k"),
        *[_pos_col(i, "l_orderkey").alias(f"p{i}") for i in range(BLOOM_K)],
    )
    tested = probe
    for i in range(BLOOM_K):
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("mask").alias(f"m{i}")
        )
        tested = tested.join(
            F.broadcast(wi),  # constant-size filter words (<= M/32 rows)
            F.expr(f"p{i} div 32") == F.col(f"w{i}"),
            "left",
        )
    hits = None
    for i in range(BLOOM_K):
        h = (
            F.coalesce(F.col(f"m{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(1L, CAST(p{i} % 32 AS INT))")
            )
            != 0
        ).cast("int")
        hits = h if hits is None else hits + h
    matched = build.select(F.col("k"), F.lit(1).alias("is_match"))
    # BOOKKEEPING join, not the production pattern: this SF-linear
    # left join exists only to label is_match so the report can show
    # real false positives next to true matches. A production pre-join
    # ships ONLY the <= M/32 filter words to the probe side — the
    # whole point is that the build side's keys never travel — and the
    # actual verify join runs downstream on the (much smaller) set of
    # bloom-passing rows. Unhinted on purpose: AQE picks the strategy.
    scored = (
        tested.withColumn("pass", (hits == BLOOM_K).cast("int"))
        .join(matched, "k", "left")
        .select(
            "pass", F.coalesce("is_match", F.lit(0)).alias("is_match")
        )
    )
    rep = scored.agg(
        F.count(F.lit(1)).cast("long").alias("probe_rows"),
        F.sum("is_match").cast("long").alias("true_matches"),
        F.sum("pass").cast("long").alias("bloom_passes"),
        F.sum(
            ((F.col("pass") == 1) & (F.col("is_match") == 0)).cast("int")
        )
        .cast("long")
        .alias("false_positives"),
        (
            F.sum(
                ((F.col("is_match") == 1) & (F.col("pass") == 0)).cast(
                    "int"
                )
            )
            == 0
        )
        .cast("int")
        .alias("no_false_negatives"),
    )
    return (
        n_build.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(rep))
        .select(
            F.col("build_keys").cast("long").alias("build_keys"),
            F.col("bloom_bits_set").cast("long").alias("bloom_bits_set"),
            "probe_rows",
            "true_matches",
            "bloom_passes",
            "false_positives",
            "no_false_negatives",
        )
    )
