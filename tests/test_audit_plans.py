"""Data-quality audit + IVM rollup (plans/audit_plans.py): the fixture
tables are mostly clean, so the oracle proves exact counts but not
DETECTION — these tests plant one violation per check and assert each
fires, and pin the IVM merge on both a split and a degenerate batch."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from github_data_pipeline_spark.plans import all_plans

REG = all_plans()

from github_data_pipeline_spark.plans import audit_plans as ap  # noqa: E402


def _tables(spark):
    d = dt.datetime
    customer = pd.DataFrame(
        [(1, "a", 0, 10.0, "m"), (2, "b", 1, 20.0, "m")],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    orders = pd.DataFrame(
        [
            # clean order with lineitems
            (10, 1, "O", 100.0, d(1998, 1, 1), "1-URGENT"),
            # orphan custkey 99 + childless + duplicate pk 11 twice
            (11, 99, "O", 50.0, d(1999, 5, 1), "2-HIGH"),
            (11, 2, "O", -5.0, d(2000, 2, 1), "2-HIGH"),  # also nonpositive
            # clean childless order AFTER the delta split (rollup test)
            (12, 2, "O", 30.0, d(2000, 3, 1), "3-MEDIUM"),
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    lineitem = pd.DataFrame(
        [
            # two clean lines on order 10, one duplicate (orderkey, line)
            (10, 1, 1, 1, 5.0, 10.0, 0.1, 0.0, "N", "O", d(1998, 2, 1)),
            (10, 1, 1, 1, 5.0, 10.0, 0.9, 0.0, "N", "O", d(1998, 2, 1)),
            # orphan orderkey 404
            (404, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1998, 2, 1)),
        ],
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    nation = pd.DataFrame(
        [(0, "ALPHA"), (1, "BETA")], columns=["n_nationkey", "n_name"]
    )
    return {
        "customer": spark.createDataFrame(customer),
        "orders": spark.createDataFrame(orders),
        "lineitem": spark.createDataFrame(lineitem),
        "nation": spark.createDataFrame(nation),
    }


def test_every_check_fires_on_planted_violations(spark):
    sdf = _tables(spark)
    orig = ap.load_table
    ap.load_table = lambda _s, _d, t: sdf[t]
    try:
        rows = {r["check_name"]: r for r in ap.dq_referential_audit(spark, "x").collect()}
    finally:
        ap.load_table = orig
    want = {
        "lineitem_orphan_orderkey": 1,   # orderkey 404
        "lineitem_pk_duplicates": 1,     # (10, 1) twice
        "lineitem_discount_domain": 1,   # 0.9 > 0.5
        "orders_orphan_custkey": 1,      # custkey 99
        "orders_childless": 3,           # both 11s and 12 have no lineitems
        "orders_nonpositive_price": 1,   # -5.0
        "orders_pk_duplicates": 1,       # orderkey 11 twice
    }
    assert set(rows) == set(want)
    for name, v in want.items():
        assert rows[name]["violations"] == v, name
        assert rows[name]["viol_bp"] == (v * 10000) // rows[name]["total"]


def test_fixture_audit_detects_real_facts(spark, sf_dir):
    """Two checks are non-vacuously positive on the driver fixture —
    orders without lineitems exist by construction, and the generator
    does NOT guarantee unique (l_orderkey, l_linenumber) pairs (1401
    duplicate pairs at sf0.001), which is exactly the kind of silent
    data fact a pk-uniqueness audit exists to surface. The remaining
    referential/domain checks are clean."""
    rows = {
        r["check_name"]: r["violations"]
        for r in REG["dq_referential_audit"].builder(spark, sf_dir).collect()
    }
    assert rows["orders_childless"] > 0
    assert rows["lineitem_pk_duplicates"] > 0
    for name in (
        "lineitem_orphan_orderkey",
        "lineitem_discount_domain",
        "orders_orphan_custkey",
        "orders_nonpositive_price",
        "orders_pk_duplicates",
    ):
        assert rows[name] == 0, name


def test_rollup_merge_equals_single_pass(spark):
    """The IVM property on a corpus where BOTH batches are non-empty,
    plus the degenerate all-in-one-batch split."""
    sdf = _tables(spark)
    # drop the dirty rows so the rollup joins cleanly
    sdf["orders"] = sdf["orders"].filter("o_custkey IN (1, 2) AND o_totalprice > 0")
    orig = ap.load_table
    ap.load_table = lambda _s, _d, t: sdf[t]
    try:
        merged = [tuple(r) for r in ap.rollup_incremental_merge(spark, "x").collect()]
        old_split = ap.ROLLUP_DELTA_FROM
        ap.ROLLUP_DELTA_FROM = "2999-01-01"  # delta batch empty
        try:
            degenerate = [
                tuple(r) for r in ap.rollup_incremental_merge(spark, "x").collect()
            ]
        finally:
            ap.ROLLUP_DELTA_FROM = old_split
    finally:
        ap.load_table = orig
    assert merged == degenerate
    # hand-derived single-pass rollup: order 10 lands in the base
    # batch (1998), order 12 in the delta batch (2000) — both batches
    # genuinely non-empty in `merged`
    assert merged == [("ALPHA", 1998, 1, 10000), ("BETA", 2000, 1, 3000)]


# --- fuzzed audit parity vs a pure-Python reference ---------------------

import os as _os

from hypothesis import given, settings
from hypothesis import strategies as st

HYPO_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "0")) or 10

_custkeys = st.lists(
    st.integers(min_value=1, max_value=6), unique=True, max_size=5
)
_orders = st.lists(
    st.tuples(
        st.integers(min_value=10, max_value=14),          # o_orderkey (dups allowed)
        st.sampled_from([1, 2, 3, 99, None]),             # o_custkey (99/None = orphan)
        st.sampled_from([100.0, 50.5, 0.0, -5.0]),        # o_totalprice
    ),
    min_size=1,
    max_size=8,
)
_lines = st.lists(
    st.tuples(
        st.integers(min_value=9, max_value=15),           # l_orderkey (9/15 may orphan)
        st.integers(min_value=1, max_value=3),            # l_linenumber
        st.sampled_from([0.0, 0.1, 0.6, -0.2, None]),     # l_discount
    ),
    min_size=1,
    max_size=10,
)


def _python_audit(custkeys, orders, lines):
    """Engine-free spec of the seven checks (NULL FK = orphan; NULL
    discount = no violation; pk-dup = rows minus distinct non-null keys)."""
    cust = set(custkeys)
    okeys = {o[0] for o in orders}
    lkeys = {l[0] for l in lines}
    return {
        "lineitem_orphan_orderkey": sum(1 for l in lines if l[0] not in okeys),
        "lineitem_pk_duplicates": len(lines) - len({(l[0], l[1]) for l in lines}),
        "lineitem_discount_domain": sum(
            1 for l in lines if l[2] is not None and (l[2] < 0 or l[2] > 0.5)
        ),
        "orders_orphan_custkey": sum(1 for o in orders if o[1] not in cust),
        "orders_childless": sum(1 for o in orders if o[0] not in lkeys),
        "orders_nonpositive_price": sum(1 for o in orders if o[2] <= 0),
        "orders_pk_duplicates": len(orders) - len({o[0] for o in orders}),
    }


@given(custkeys=_custkeys, orders=_orders, lines=_lines)
@settings(max_examples=HYPO_EXAMPLES, deadline=None)
def _check_audit_matches_python(custkeys, orders, lines):
    spark = _check_audit_matches_python.spark
    d = dt.datetime(1998, 1, 1)
    sdf = {
        "customer": spark.createDataFrame(
            [(k, "n", 0, 1.0, "m") for k in custkeys] or [(0, "n", 0, 1.0, "m")],
            "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string",
        ),
        "orders": spark.createDataFrame(
            [(k, ck, "O", p, d, "1-U") for k, ck, p in orders],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "lineitem": spark.createDataFrame(
            [
                (k, 1, 1, ln, 1.0, 1.0, disc, 0.0, "N", "O", d)
                for k, ln, disc in lines
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber long, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        ),
        "nation": spark.createDataFrame([(0, "X")], "n_nationkey long, n_name string"),
    }
    # the "or [(0,...)]" placeholder above only fires for EMPTY custkeys
    # (createDataFrame refuses an empty list without data); remove it
    # from the audited set by filtering it back out
    if not custkeys:
        sdf["customer"] = sdf["customer"].filter("c_custkey <> 0")
    orig = ap.load_table
    ap.load_table = lambda _s, _d, t: sdf[t]
    try:
        got = {
            r["check_name"]: (r["violations"], r["total"])
            for r in ap.dq_referential_audit(spark, "x").collect()
        }
    finally:
        ap.load_table = orig
    want = _python_audit(custkeys, orders, lines)
    totals = {
        "lineitem_orphan_orderkey": len(lines),
        "lineitem_pk_duplicates": len(lines),
        "lineitem_discount_domain": len(lines),
        "orders_orphan_custkey": len(orders),
        "orders_childless": len(orders),
        "orders_nonpositive_price": len(orders),
        "orders_pk_duplicates": len(orders),
    }
    assert got == {k: (v, totals[k]) for k, v in want.items()}


def test_audit_matches_python_property(spark):
    """Fuzzed audit parity: random small star schemas with NULL FKs,
    duplicate pks, orphans in both directions, and NULL/out-of-range
    discounts must produce exactly the counts of the engine-free
    Python spec (NULL FK counts as orphan — the anti-join semantics;
    NULL discount is not a domain violation)."""
    _check_audit_matches_python.spark = spark
    _check_audit_matches_python()
