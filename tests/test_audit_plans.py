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
