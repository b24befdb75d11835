"""Bradley-Terry pairwise-preference aggregation — the RLHF-preference
face of training-data selection.

A reward-model data pipeline starts from pairwise comparisons ("A beat
B") and needs a global strength per item to rank, filter, and debias
the pair set. The canonical model is Bradley-Terry (1952): P(i beats j)
= pi_i / (pi_i + pi_j), fit by the Minorize-Maximize update (Hunter
2004, "MM algorithms for generalized Bradley-Terry models"):

    pi_i'  =  W_i / sum_j ( n_ij / (pi_i + pi_j) )

where W_i is i's total wins and n_ij the number of i-vs-j comparisons.

Fixture mapping: a user "prefers" event type A over event type B when
their summed event value (in exact integer micros) for A exceeds that
for B — every user contributes one comparison per unordered type pair
they have both of; exact ties are excluded. This derives a dense
comparison matrix from the events fact distributively, then runs the
MM iteration on the k-row strengths vector (k = |event types|, five on
the fixture).

Exactness: the whole computation is integer-only, so the DuckDB oracle
reproduces it bit-for-bit — value sums in micros (functions/money.py),
strengths as scaled longs, every division a truncating integer div
(Spark ``div`` == DuckDB ``//`` on positives), and each iteration
renormalizes strengths to sum 1e7 (Bradley-Terry is scale-invariant, so
normalization only pins the representation and bounds the integers).
The oracle unrolls the T iterations as CTEs — the same discipline as
the PCA power-iteration entries (similarity_plans.py).

Scale notes (100 TB): the heavy work — per-(user, type) value sums and
the within-user pair comparison — is fully distributed: one
user-keyed aggregate, one user-keyed self-join that fans out at most
k(k-1)/2 rows per user, one k^2-row aggregate. The k(k-1)-row win
matrix then folds into ONE row of aligned arrays and the T MM
iterations run as chained 1-row selects over higher-order functions
(transform/aggregate) — a linear lazy plan, zero per-iteration jobs,
iteration cost independent of corpus size (the same discipline as the
PCA power chain in similarity_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents_of
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

T_ITERS = 8
_SCALE = 1_000_000_000_000  # 1e12: fixed-point scale for the MM division
_NORM = 10_000_000  # strengths renormalized to sum 1e7 each iteration


def _bt_oracle() -> str:
    """Unrolled-CTE oracle: comparisons in SQL, T MM iterations as CTEs."""
    # MATERIALIZED: e/wt are referenced 2-3x per unrolled iteration;
    # without the hint DuckDB inlines each use back to the events scan
    # (17+ re-opens of the parquet -> fd exhaustion under the gate's
    # ulimit), with it each base CTE computes once.
    head = """
    WITH ut AS MATERIALIZED (
      SELECT user_id, event_type,
             SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS v
      FROM events GROUP BY user_id, event_type
    ), pr AS MATERIALIZED (
      SELECT a.event_type AS ta, b.event_type AS tb, a.v AS va, b.v AS vb
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      WHERE a.v <> b.v
    ), pstat AS MATERIALIZED (
      SELECT ta, tb,
             SUM(CASE WHEN va > vb THEN 1 ELSE 0 END) AS wab,
             SUM(CASE WHEN vb > va THEN 1 ELSE 0 END) AS wba,
             COUNT(*) AS n
      FROM pr GROUP BY ta, tb
    ), e AS MATERIALIZED (
      SELECT ta AS i, tb AS j, n, wab AS w FROM pstat
      UNION ALL
      SELECT tb AS i, ta AS j, n, wba AS w FROM pstat
    ), wt AS MATERIALIZED (
      SELECT i AS event_type,
             CAST(SUM(w) AS BIGINT) AS wins,
             CAST(SUM(n) AS BIGINT) AS comparisons
      FROM e GROUP BY i
    ), s0 AS (
      SELECT event_type, CAST(1000000 AS BIGINT) AS s FROM wt
    )"""
    steps = []
    prev = "s0"
    for t in range(1, T_ITERS + 1):
        # every iteration CTE is MATERIALIZED: d{t} reads prev twice and
        # s{t} reads r{t} twice (directly and via t{t}), so inlining
        # doubles the plan per reference — 2^T blowup by the last
        # iteration without the hint (same discipline as bpe_plans).
        steps.append(
            f""", d{t} AS MATERIALIZED (
      SELECT e.i AS event_type,
             SUM(e.n * {_SCALE} // GREATEST(si.s + sj.s, 1)) AS d
      FROM e
      JOIN {prev} si ON e.i = si.event_type
      JOIN {prev} sj ON e.j = sj.event_type
      GROUP BY e.i
    ), r{t} AS MATERIALIZED (
      SELECT wt.event_type,
             wt.wins * {_SCALE} // GREATEST(d{t}.d, 1) AS s
      FROM wt JOIN d{t} USING (event_type)
    ), t{t} AS MATERIALIZED (
      SELECT SUM(s) AS tot FROM r{t}
    ), s{t} AS MATERIALIZED (
      SELECT event_type, s * {_NORM} // GREATEST(tot, 1) AS s
      FROM r{t}, t{t}
    )"""
        )
        prev = f"s{t}"
    tail = f"""
    SELECT wt.event_type, wt.wins, wt.comparisons,
           CAST({prev}.s AS BIGINT) AS bt_strength
    FROM wt JOIN {prev} USING (event_type)
    """
    return head + "".join(steps) + tail


@_add(
    "bt_preference_strengths",
    _bt_oracle(),
    doc="Bradley-Terry preference strengths over per-user pairwise "
    "event-type comparisons, fit by T=8 exact-integer MM iterations "
    "(Hunter 2004). Distributed phase: (user, type) value sums in "
    "micros, a within-user pair self-join (<= k(k-1)/2 rows per "
    "user), and the k^2-row win-matrix aggregate. Iterative phase: "
    "the MM update on the k-row strengths vector with truncating "
    "integer division at scale 1e12 and per-iteration renormalization "
    "to sum 1e7 — every arithmetic step mirrored bit-for-bit by the "
    "oracle's unrolled CTEs. Tie comparisons (equal micros sums) are "
    "excluded on both sides by the same integer predicate. The win "
    "matrix folds to one row of aligned arrays and the T iterations "
    "chain as 1-row selects (PCA-family discipline) — zero "
    "per-iteration jobs, per-step cost independent of corpus size.",
    tags=("preference", "ml", "iterative", "training-data"),
)
def bt_preference_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", cents_of(F.col("value"), 6).alias("v")
    )
    ut = ev.groupBy("user_id", "event_type").agg(F.sum("v").alias("v"))
    return bt_from_user_type_sums(ut)


def bt_from_user_type_sums(ut: DataFrame) -> DataFrame:
    """Comparison derivation + MM iteration from per-(user, type) value
    sums in micros — shared by the batch entry and the streaming
    equality gate (stream_bt_equality) so the two paths cannot drift
    anywhere downstream of the sums."""
    a = ut.alias("a")
    b = ut.alias("b")
    pr = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).filter(F.col("a.v") != F.col("b.v"))
    pstat = pr.groupBy(
        F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
    ).agg(
        F.sum(
            F.when(F.col("a.v") > F.col("b.v"), F.lit(1)).otherwise(F.lit(0))
        ).alias("wab"),
        F.sum(
            F.when(F.col("b.v") > F.col("a.v"), F.lit(1)).otherwise(F.lit(0))
        ).alias("wba"),
        F.count(F.lit(1)).alias("n"),
    )
    edges = pstat.select(
        F.col("ta").alias("i"), F.col("tb").alias("j"), "n", F.col("wab").alias("w")
    ).unionByName(
        pstat.select(
            F.col("tb").alias("i"),
            F.col("ta").alias("j"),
            "n",
            F.col("wba").alias("w"),
        )
    )
    # Fold the k(k-1)-row edge table into ONE row of aligned arrays —
    # the PCA-family discipline (similarity_plans): the T MM iterations
    # then run as chained 1-row selects over higher-order functions, a
    # LINEAR lazy plan with zero per-iteration Spark jobs (the
    # joins-per-iteration phrasing either checkpoints T times — T jobs
    # of fixed latency — or doubles the plan per iteration via the two
    # strength references). types is sorted for determinism; nm maps
    # 'i|j' -> n_ij so absent pairs read as 0 comparisons.
    state = edges.groupBy().agg(
        F.expr("array_sort(collect_set(i))").alias("types"),
        F.expr(
            "map_from_entries(collect_list(struct(concat(i, '|', j), n)))"
        ).alias("nm"),
        F.expr(
            "map_from_entries(collect_list(struct(concat(i, '|', j), w)))"
        ).alias("wm"),
    )
    over_j = (
        "aggregate(sequence(0, size(types) - 1), 0L, (acc, j) -> acc + {term})"
    )
    n_ij = (
        "coalesce(element_at(nm, concat(element_at(types, i + 1), '|',"
        " element_at(types, j + 1))), 0L)"
    )
    w_ij = (
        "coalesce(element_at(wm, concat(element_at(types, i + 1), '|',"
        " element_at(types, j + 1))), 0L)"
    )
    state = state.select(
        "types",
        "nm",
        F.expr(
            "transform(sequence(0, size(types) - 1), i -> "
            + over_j.format(term=w_ij)
            + ")"
        ).alias("wins"),
        F.expr(
            "transform(sequence(0, size(types) - 1), i -> "
            + over_j.format(term=n_ij)
            + ")"
        ).alias("comparisons"),
    ).select(
        "types",
        "nm",
        "wins",
        "comparisons",
        F.expr("transform(types, t -> CAST(1000000 AS BIGINT))").alias("s"),
    )
    mm_term = (
        f"{n_ij} * {_SCALE} div greatest(element_at(s, i + 1)"
        " + element_at(s, j + 1), 1)"
    )
    raw_expr = (
        "transform(sequence(0, size(types) - 1), i -> "
        f"element_at(wins, i + 1) * {_SCALE} div greatest("
        + over_j.format(term=mm_term)
        + ", 1))"
    )
    norm_expr = (
        f"transform(raw, x -> x * {_NORM}"
        " div greatest(aggregate(raw, 0L, (a, b) -> a + b), 1))"
    )
    for _ in range(T_ITERS):
        state = state.select(
            "types", "nm", "wins", "comparisons", F.expr(raw_expr).alias("raw")
        ).select(
            "types", "nm", "wins", "comparisons", F.expr(norm_expr).alias("s")
        )
    return state.select(
        F.expr(
            "explode(arrays_zip(types, wins, comparisons, s))"
        ).alias("z")
    ).select(
        F.col("z.types").alias("event_type"),
        F.col("z.wins").cast("long").alias("wins"),
        F.col("z.comparisons").cast("long").alias("comparisons"),
        F.col("z.s").cast("long").alias("bt_strength"),
    )
