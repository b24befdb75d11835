"""Round-12 session-2 operator tests: the TPC-H completion set and
Bradley-Terry preference aggregation.

The DuckDB oracles already pin cell-exactness; these tests pin the
contracts the SQL text alone doesn't make visible — that each query's
selective lanes actually BITE on the fixture (a filter nobody crosses
is a vacuous gate), that the exact-integer rewrites are equivalent to
the fractional spec phrasing on real data, and that the BT iteration
matches an independent pure-Python integer implementation bit-for-bit
(a third engine, triangulating Spark and DuckDB).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from github_data_pipeline_spark.plans.preference_plans import (
    T_ITERS,
    _NORM,
    _SCALE,
    bt_preference_strengths,
)
from github_data_pipeline_spark.plans.tpch_plans import (
    large_volume_customer_q18,
    late_only_supplier_q21,
    market_share_q8,
    promo_revenue_q14,
    small_qty_revenue_q17,
    top_supplier_q15,
    volume_shipping_q7,
)
from github_data_pipeline_spark.sources.tables import load_table


def test_q7_both_directions_nonvacuous(spark, sf_dir):
    rows = volume_shipping_q7(spark, sf_dir).collect()
    dirs = {(r.supp_region, r.cust_region) for r in rows}
    assert ("ASIA", "EUROPE") in dirs
    assert ("EUROPE", "ASIA") in dirs
    # the pair predicate must exclude same-region flows entirely
    assert all(r.supp_region != r.cust_region for r in rows)
    assert all(r.revenue_micros > 0 and r.lineitems > 0 for r in rows)


def test_q8_share_is_exact_integer_ppm(spark, sf_dir):
    rows = market_share_q8(spark, sf_dir).collect()
    assert rows, "market-share slice empty on fixture"
    for r in rows:
        # both lanes non-vacuous and the ppm is the truncating integer
        # quotient of the emitted numerator/denominator — recomputed in
        # arbitrary-precision Python ints, no 64-bit ceiling
        assert 0 < r.nation_micros < r.total_micros
        assert r.mkt_share_ppm == (r.nation_micros * 1_000_000) // r.total_micros


def test_q14_promo_ppm_consistent(spark, sf_dir):
    rows = promo_revenue_q14(spark, sf_dir).collect()
    assert len(rows) == 12  # every 1996 ship month present
    assert any(r.promo_micros > 0 for r in rows)
    for r in rows:
        assert 0 <= r.promo_micros <= r.total_micros
        assert r.promo_ppm == (r.promo_micros * 1_000_000) // r.total_micros


def test_q15_every_row_is_the_global_max(spark, sf_dir):
    df = top_supplier_q15(spark, sf_dir)
    rows = df.collect()
    assert rows, "no top supplier found"
    # independent recomputation of the quarter's per-supplier revenue
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6)
            .cast("long")
        ).alias("m")
    )
    true_max = rev.agg(F.max("m")).first()[0]
    assert {r.total_revenue_micros for r in rows} == {true_max}
    # ties kept: the row count equals the number of suppliers AT the max
    n_at_max = rev.filter(F.col("m") == true_max).count()
    assert len(rows) == n_at_max


def test_q17_integer_rewrite_equals_fractional_spec(spark, sf_dir):
    """5*qty*cnt < sum_qty must pick exactly the rows the spec's
    qty < 0.2 * avg(qty) picks — verified with exact Fractions over
    every Brand#12 lineitem on the fixture."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    pl = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            "l_partkey", F.round("l_quantity").cast("long").alias("qty")
        )
        .collect()
    )
    by_part: dict[int, list[int]] = {}
    for r in pl:
        by_part.setdefault(r.l_partkey, []).append(r.qty)
    expected = 0
    for qtys in by_part.values():
        avg = Fraction(sum(qtys), len(qtys))
        for q in qtys:
            frac = q < Fraction(1, 5) * avg
            integer = 5 * q * len(qtys) < sum(qtys)
            assert frac == integer
            expected += int(frac)
    row = small_qty_revenue_q17(spark, sf_dir).first()
    assert row.small_qty_lineitems == expected
    assert expected > 0, "small-qty gate vacuous on fixture"


def test_q18_having_boundary_bites(spark, sf_dir):
    rows = large_volume_customer_q18(spark, sf_dir).collect()
    assert rows and min(r.sum_qty for r in rows) >= 250
    # orders just under the threshold exist, so the gate is a real cut
    li = load_table(spark, sf_dir, "lineitem")
    near_miss = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("s"))
        .filter((F.col("s") >= 230) & (F.col("s") < 250))
        .count()
    )
    assert near_miss > 0


def test_q21_both_correlation_lanes_bite(spark, sf_dir):
    """The EXISTS lane (another supplier on the order) and the NOT
    EXISTS lane (no OTHER late supplier) must both exclude real
    fixture orders, or the double correlation is decoration."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    ps = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    po = ps.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    stats = po.agg(
        F.sum((F.col("n_supp") == 1).cast("int")).alias("single_supp"),
        F.sum(
            ((F.col("n_supp") >= 2) & (F.col("n_late") >= 2)).cast("int")
        ).alias("multi_late"),
        F.sum(
            ((F.col("n_supp") >= 2) & (F.col("n_late") == 1)).cast("int")
        ).alias("sole_late"),
    ).first()
    assert stats.single_supp > 0, "EXISTS lane vacuous"
    assert stats.multi_late > 0, "NOT-EXISTS lane vacuous"
    assert stats.sole_late > 0, "qualifying lane vacuous"
    rows = late_only_supplier_q21(spark, sf_dir).collect()
    assert sum(r.numwait for r in rows) == stats.sole_late


def _python_bt(edges: dict[tuple[str, str], tuple[int, int]]) -> dict[str, int]:
    """Pure-Python integer MM, mirroring the entry's arithmetic exactly:
    edges maps (i, j) -> (n_ij, wins_of_i_over_j) for both directions."""
    types = sorted({i for i, _ in edges})
    wins = {t: sum(w for (i, _), (_, w) in edges.items() if i == t) for t in types}
    s = {t: 1_000_000 for t in types}
    for _ in range(T_ITERS):
        d = {}
        for i in types:
            tot = 0
            for j in types:
                n = edges.get((i, j), (0, 0))[0]
                tot += n * _SCALE // max(s[i] + s[j], 1)
            d[i] = tot
        raw = {i: wins[i] * _SCALE // max(d[i], 1) for i in types}
        total = sum(raw.values())
        s = {i: raw[i] * _NORM // max(total, 1) for i in types}
    return s


def test_bt_matches_pure_python_mm(spark, sf_dir):
    """Triangulation: a third implementation (pure Python bigints, no
    Spark, no DuckDB) of the comparison derivation + MM iteration must
    reproduce the entry bit-for-bit."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 1e6).cast("long").alias("v"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    by_user: dict[int, dict[str, int]] = {}
    for r in ev:
        by_user.setdefault(r.user_id, {})[r.event_type] = r.v
    edges: dict[tuple[str, str], tuple[int, int]] = {}
    for sums in by_user.values():
        ts = sorted(sums)
        for a_i in range(len(ts)):
            for b_i in range(a_i + 1, len(ts)):
                a, b = ts[a_i], ts[b_i]
                if sums[a] == sums[b]:
                    continue
                for i, j, win in ((a, b, sums[a] > sums[b]), (b, a, sums[b] > sums[a])):
                    n, w = edges.get((i, j), (0, 0))
                    edges[(i, j)] = (n + 1, w + int(win))
    strengths = _python_bt(edges)
    got = {
        r.event_type: (r.wins, r.comparisons, r.bt_strength)
        for r in bt_preference_strengths(spark, sf_dir).collect()
    }
    assert set(got) == set(strengths)
    for t, (wins, comps, s) in got.items():
        assert s == strengths[t]
        assert wins == sum(
            w for (i, _), (_, w) in edges.items() if i == t
        )
        assert comps == sum(
            n for (i, _), (n, _) in edges.items() if i == t
        )


def test_bt_strengths_normalized_and_monotone(spark, sf_dir):
    rows = bt_preference_strengths(spark, sf_dir).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r.bt_strength for r in rows)
    # each of the k truncating divisions drops < 1 unit
    assert _NORM - k <= total <= _NORM
    # the fixture's comparison design is dense and balanced (every type
    # pair meets through the same users), so more wins must mean a
    # strictly higher fitted strength
    if len({r.comparisons for r in rows}) == 1:
        by_wins = sorted(rows, key=lambda r: r.wins)
        for a, b in zip(by_wins, by_wins[1:]):
            if a.wins < b.wins:
                assert a.bt_strength < b.bt_strength


def test_q19_weakenings_are_implied_and_brackets_bite(spark, sf_dir):
    """The redundant per-scan filters must not change the result (they
    are weakenings of the disjunction, pure pushdown), and every
    bracket must match real fixture rows."""
    from github_data_pipeline_spark.plans.tpch_plans import (
        discounted_revenue_q19,
    )

    row = discounted_revenue_q19(spark, sf_dir).first()
    assert row.bracket1_rows > 0
    assert row.bracket2_rows > 0
    assert row.bracket3_rows > 0
    assert row.lineitems == row.bracket1_rows + row.bracket2_rows + row.bracket3_rows
    # unweakened recomputation: same disjunction, no scan-side pruning
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 35)
        )
    )
    plain = (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6
                ).cast("long")
            ).alias("m"),
            F.count(F.lit(1)).alias("c"),
        )
        .first()
    )
    assert plain.m == row.revenue_micros
    assert plain.c == row.lineitems


def test_stream_bt_equality_matches_batch_and_merges_across_batches(
    spark, sf_dir
):
    """The drained gate must equal the batch entry bit-for-bit, and the
    equality must be earned: at least one (user, type) key has to
    receive updates from >= 2 distinct micro-batches (the event_id
    range split exists precisely so per-key sums accumulate across
    batch boundaries — if every key settled in one batch, the gate
    would prove nothing about incremental maintenance)."""
    from github_data_pipeline_spark.plans.preference_stream_plans import (
        stream_bt_equality,
    )

    streamed = {
        r.event_type: (r.wins, r.comparisons, r.bt_strength)
        for r in stream_bt_equality(spark, sf_dir).collect()
    }
    assert stream_bt_equality.last_multibatch_keys > 0
    batch = {
        r.event_type: (r.wins, r.comparisons, r.bt_strength)
        for r in bt_preference_strengths(spark, sf_dir).collect()
    }
    assert streamed == batch
