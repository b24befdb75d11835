"""Range (interval) join + gap-fill plans (plans/temporal_plans.py)
over operators/rangejoin.py's closed='right' convention.

The binned candidate generation is pure optimization: its output must
equal the naive key-equi-join + range-filter on any input, including
the adversarial shapes the parquet fixtures don't stress — microsecond
timestamps straddling bucket boundaries, events exactly at window-open
(excluded under closed='right') and window-close (included), intervals
spanning 1, 2, and 3+ buckets, and a hot key with many matches.
(tests/test_rangejoin.py pins the closed='both' path.)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _naive(left, right, key, closed):
    lo = (
        F.col("r_ts") > F.col("w_start")
        if closed == "right"
        else F.col("r_ts") >= F.col("w_start")
    )
    return (
        left.join(right.withColumnRenamed(key, "rk"), F.col(key) == F.col("rk"))
        .filter(lo & (F.col("r_ts") <= F.col("w_end")))
        .drop("rk")
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("user_id", "lid", "rid").collect()
    )


@pytest.mark.parametrize("closed", ["right", "both"])
@pytest.mark.parametrize("width", [60, 97, 600])
def test_binned_matches_naive(spark, closed, width):
    # left intervals: exact boundary hits, microsecond offsets, and an
    # interval longer than the bucket (spans 3 buckets at width=60)
    lefts = [
        (1, 1, _ts(0), _ts(180)),
        (1, 2, _ts(59.999999), _ts(60.000001)),
        (1, 3, _ts(100), _ts(100)),  # degenerate zero-width interval
        (2, 4, _ts(3600), _ts(3780)),
        (3, 5, _ts(-0.5) + dt.timedelta(days=1), _ts(120) + dt.timedelta(days=1)),
    ]
    rights = [
        # boundary probes around left interval edges
        (1, 10, _ts(0)),  # == w_start of lid=1: excluded when closed=right
        (1, 11, _ts(0.000001)),
        (1, 12, _ts(180)),  # == w_end: always included
        (1, 13, _ts(180.000001)),  # just past w_end: never included
        (1, 14, _ts(60)),
        (1, 15, _ts(100)),
        (2, 16, _ts(3600)),
        (2, 17, _ts(3779.999999)),
        (9, 18, _ts(100)),  # key with no left side
    ] + [(1, 100 + i, _ts(i * 7.3)) for i in range(30)]  # hot key
    left = spark.createDataFrame(
        lefts, "user_id long, lid long, w_start timestamp, w_end timestamp"
    )
    right = spark.createDataFrame(
        rights, "user_id long, rid long, r_ts timestamp"
    )
    got = interval_join(
        events=right,
        intervals=left,
        event_ts="r_ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=width,
        extra_key="user_id",
        closed=closed,
    )
    want = _naive(left, right, "user_id", closed)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 10  # non-vacuous


def test_boundary_semantics_closed_right(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0), _ts(10))],
        "user_id long, lid long, w_start timestamp, w_end timestamp",
    )
    right = spark.createDataFrame(
        [(1, 20, _ts(0)), (1, 21, _ts(10)), (1, 22, _ts(10.000001))],
        "user_id long, rid long, r_ts timestamp",
    )
    got = _rows(
        interval_join(
            events=right,
            intervals=left,
            event_ts="r_ts",
            start_col="w_start",
            end_col="w_end",
            bucket_seconds=10,
            extra_key="user_id",
            closed="right",
        )
    )
    assert got == [(1, 1, 21)]  # open at start, closed at end


def test_gap_fill_leading_nulls_and_locf(spark, tmp_path):
    """An entity whose first event is mid-span: leading spine hours
    stay NULL, every later gap carries the last observation."""
    import pandas as pd

    from github_data_pipeline_spark.plans import temporal_plans as tp

    rows = [
        # user 7: events in hours 2 and 5 of a 0..6 span
        (1, _ts(2 * 3600 + 10), 7, "click", 1.50, "{}"),
        (2, _ts(2 * 3600 + 20), 7, "click", 2.25, "{}"),  # later in hour 2
        (3, _ts(5 * 3600), 7, "purchase", 9.00, "{}"),
        # user 57: single event in hour 0
        (4, _ts(30), 57, "click", 4.00, "{}"),
        # user 8 (not % 50 == 7): defines the global span end
        (5, _ts(6 * 3600 + 1800), 8, "click", 0.10, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sdf = spark.createDataFrame(pdf)
    orig = tp.load_table
    tp.load_table = lambda _s, _d, _t: sdf
    try:
        out = {
            (r.user_id, r.hour_start): (r.cents_locf, r.is_filled)
            for r in tp.events_gap_fill_hourly(spark, "unused").collect()
        }
    finally:
        tp.load_table = orig
    # 2 selected users x 7 spine hours
    assert len(out) == 14
    h = lambda i: f"2024-01-01T{i:02d}:00:00Z"
    assert out[(7, h(0))] == (None, 1)  # before first observation
    assert out[(7, h(1))] == (None, 1)
    assert out[(7, h(2))] == (225, 0)  # last event in the hour wins
    assert out[(7, h(3))] == (225, 1)  # carried forward
    assert out[(7, h(4))] == (225, 1)
    assert out[(7, h(5))] == (900, 0)
    assert out[(7, h(6))] == (900, 1)
    assert out[(57, h(0))] == (400, 0)
    assert out[(57, h(6))] == (400, 1)


def test_trailing_window_microsecond_boundary(spark):
    """RANGE frame ordered by integer epoch-micros: an event exactly
    3600 s earlier is IN the trailing hour, one 3600.000001 s earlier
    is OUT — the seconds-truncated ordering would get this wrong."""
    from github_data_pipeline_spark.plans import temporal_plans as tp

    rows = [
        (1, _ts(0.0), 1, "click", 1.00, "{}"),
        (2, _ts(0.000001), 1, "click", 2.00, "{}"),
        (3, _ts(3600.0), 1, "click", 4.00, "{}"),  # sees 1,2,3
        (4, _ts(3600.000001), 1, "click", 8.00, "{}"),  # sees 2,3,4 not 1
        # 3600.000001 s after event 4: even event 4 is out of range
        (5, _ts(7200.000002), 1, "click", 16.00, "{}"),
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    orig = tp.load_table
    tp.load_table = lambda _s, _d, _t: sdf
    try:
        out = {
            r.event_id: (r.trailing_events, r.trailing_cents)
            for r in tp.events_trailing_hour_window(spark, "x").collect()
        }
    finally:
        tp.load_table = orig
    assert out == {
        1: (1, 100),
        2: (2, 300),
        3: (3, 700),
        4: (3, 1400),
        5: (1, 1600),
    }


def test_percentile_disc_convention_edges(spark):
    """percentile_disc must agree with DuckDB on duplicate-heavy and
    tiny groups (ANSI: smallest element with cume_dist >= q)."""
    import duckdb
    import pandas as pd

    from github_data_pipeline_spark.plans import quantile_plans as qp

    rows = (
        [("dup", 5)] * 9 + [("dup", 100)]  # p90 lands exactly on cume 0.9
        + [("one", 42)]
        + [("two", 1), ("two", 2)]
        + [("skew", v) for v in (1, 1, 1, 2, 3, 1000)]
    )
    pdf = pd.DataFrame(
        [
            {"doc_id": i, "text": "", "lang": "en", "source": s, "n_chars": n}
            for i, (s, n) in enumerate(rows)
        ]
    )
    sdf = spark.createDataFrame(pdf)
    orig = qp.load_table
    qp.load_table = lambda _s, _d, _t: sdf
    try:
        got = {
            tuple(r)
            for r in qp.doc_length_percentiles(spark, "x").collect()
        }
    finally:
        qp.load_table = orig
    con = duckdb.connect()
    con.register("documents", pdf)
    from github_data_pipeline_spark.plans import all_plans

    want = {
        tuple(r)
        for r in con.execute(all_plans()["doc_length_percentiles"].oracle).fetchall()
    }
    con.close()
    assert got == want
    assert ("dup", 10, 5, 5, 100) in got  # 9th of 10 has cume 0.9 -> p90=5
    assert ("one", 1, 42, 42, 42) in got


@pytest.mark.parametrize("n,expect", [(10, 0), (11, 1)])
def test_value_outlier_exact_boundary(spark, n, expect):
    """One extreme point among n-1 equal values has z^2 = n-1 exactly:
    at n=10 it sits ON the 3-sigma boundary (strict > must not flag),
    at n=11 it is beyond (must flag) — integer-exact in both engines."""
    import duckdb
    import pandas as pd

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans import quantile_plans as qp

    rows = [(i, T0, 1, "click", 0.0, "{}") for i in range(n - 1)]
    rows.append((n, T0, 1, "click", 123.45, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sdf = spark.createDataFrame(pdf)
    orig = qp.load_table
    qp.load_table = lambda _s, _d, _t: sdf
    try:
        got = {tuple(r) for r in qp.events_value_outliers(spark, "x").collect()}
    finally:
        qp.load_table = orig
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(all_plans()["events_value_outliers"].oracle).fetchall()
    }
    con.close()
    assert got == want
    ((_, cnt, _, flagged),) = got
    assert (cnt, flagged) == (n, expect)


def test_funnel_ordering_and_horizon(spark):
    """Funnel semantics: a click BEFORE any view doesn't count; a step
    exactly AT the 24 h horizon boundary counts, one microsecond past
    does not; cohorts 0-3 all representable."""
    import duckdb
    import pandas as pd

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans import funnel_plans as fp

    H = 24 * 3600
    rows = [
        # user 1: full funnel, purchase exactly at the horizon
        (1, _ts(0), 1, "view", 0.0, "{}"),
        (2, _ts(10), 1, "click", 0.0, "{}"),
        (3, _ts(10 + H), 1, "purchase", 0.0, "{}"),
        # user 2: click precedes the only view -> stuck at step 1
        (4, _ts(100), 2, "click", 0.0, "{}"),
        (5, _ts(200), 2, "view", 0.0, "{}"),
        # user 3: click one microsecond past the horizon -> step 1
        (6, _ts(0), 3, "view", 0.0, "{}"),
        (7, _ts(H + 0.000001), 3, "click", 0.0, "{}"),
        # user 4: never views -> step 0
        (8, _ts(50), 4, "purchase", 0.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sdf = spark.createDataFrame(pdf)
    orig = fp.load_table
    fp.load_table = lambda _s, _d, _t: sdf
    try:
        got = {
            r.steps_reached: r.users
            for r in fp.events_funnel_steps(spark, "x").collect()
        }
    finally:
        fp.load_table = orig
    assert got == {0: 1, 1: 2, 3: 1}
    con = duckdb.connect()
    con.register("events", pdf)
    want = dict(con.execute(all_plans()["events_funnel_steps"].oracle).fetchall())
    con.close()
    assert got == want


def test_pivot_unknown_type_guard(spark):
    """An event type outside the declared pivot domain must land in
    unknown_events (not silently vanish), identically in both engines."""
    import duckdb
    import pandas as pd

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans import pivot_plans as pp

    rows = [
        (1, T0, 3, "click", 1.00, "{}"),
        (2, T0, 3, "refund", 5.00, "{}"),  # outside EVENT_TYPES
        (3, T0, 14, "purchase", 2.00, "{}"),
        (4, T0, 14, "chargeback", 9.00, "{}"),  # outside EVENT_TYPES
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sdf = spark.createDataFrame(pdf)
    orig = pp.load_table
    pp.load_table = lambda _s, _d, _t: sdf
    try:
        got = {tuple(r) for r in pp.events_type_pivot(spark, "x").collect()}
    finally:
        pp.load_table = orig
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(all_plans()["events_type_pivot"].oracle).fetchall()
    }
    con.close()
    assert got == want
    by_bucket = {r[0]: r for r in got}
    assert by_bucket[3][-1] == 1  # refund counted as unknown
    assert by_bucket[3][1] == 1 and by_bucket[3][2] == 100  # click kept


def test_editdist_threshold_boundary(spark):
    """levenshtein(a, b, k): distance exactly k is kept, k+1 rejected;
    the length prefilter must not drop a within-k pair."""
    from github_data_pipeline_spark.operators.neardup import (
        verify_candidates_edit_distance,
    )

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),
            (2, "abcdefghij" + "XXXXXX"),  # 6 insertions: dist == 6
            (3, "abcdefghij" + "XXXXXXX"),  # 7 insertions: dist == 7
            (4, "ZZZdefghij"),  # 3 substitutions, same length
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in verify_candidates_edit_distance(
            cands, docs, max_dist=6
        ).collect()
    }
    assert got == {(1, 2): 6, (1, 4): 3}


# -- funnel property: chained-min-ts construction vs a sequential scan ----

import os as _os

from hypothesis import given, settings
from hypothesis import strategies as st

# tools/property_gate.py raises this for the pre-release thorough pass
HYPO_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "0")) or 10


def _funnel_model(events, horizon_sec):
    """Independent pure-Python funnel: per user, a literal sequential
    scan over (ts, type) following the spec — first view, then first
    click at-or-after it within the horizon, then first purchase
    at-or-after that within the horizon."""
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for uid, ts, typ in events:
        by_user[uid].append((ts, typ))
    counts = Counter()
    for uid, evs in by_user.items():
        step = 0
        views = [t for t, ty in evs if ty == "view"]
        if views:
            step, t1 = 1, min(views)
            clicks = [
                t for t, ty in evs
                if ty == "click" and t1 <= t <= t1 + horizon_sec
            ]
            if clicks:
                step, t2 = 2, min(clicks)
                if any(
                    ty == "purchase" and t2 <= t <= t2 + horizon_sec
                    for t, ty in evs
                ):
                    step = 3
        counts[step] += 1
    return dict(counts)


_event_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id
        # quarter-horizon grid: boundary timestamps (exact multiples of
        # the horizon) are drawn often, so >= / <= edges get exercised
        st.integers(min_value=0, max_value=12),
        st.sampled_from(["view", "click", "purchase", "other"]),
    ),
    min_size=1,
    max_size=24,
)


@given(events=_event_lists, horizon_hours=st.sampled_from([1, 2]))
@settings(max_examples=HYPO_EXAMPLES, deadline=None)
def _check_funnel_matches_model(events, horizon_hours):
    import pandas as pd

    from github_data_pipeline_spark.plans import funnel_plans as fp

    spark = _check_funnel_matches_model.spark
    h_sec = horizon_hours * 3600
    quarter = h_sec // 4
    rows = [
        (i, _ts(g * quarter), uid, typ, 0.0, "{}")
        for i, (uid, g, typ) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sdf = spark.createDataFrame(pdf)
    orig_load, orig_h = fp.load_table, fp.STEP_HORIZON_HOURS
    fp.load_table = lambda _s, _d, _t: sdf
    fp.STEP_HORIZON_HOURS = horizon_hours
    try:
        got = {
            r.steps_reached: r.users
            for r in fp.events_funnel_steps(spark, "x").collect()
        }
    finally:
        fp.load_table, fp.STEP_HORIZON_HOURS = orig_load, orig_h
    want = _funnel_model(
        [(uid, g * quarter, typ) for (uid, g, typ) in events], h_sec
    )
    assert got == want


def test_funnel_matches_sequential_model(spark):
    """Property: the chained-min-ts funnel equals an independent
    per-user sequential scan on random event sequences — random
    horizons, boundary-heavy timestamps, arbitrary arrival order
    (the spark fixture rides in on an attribute; @given doesn't mix
    with pytest fixtures)."""
    _check_funnel_matches_model.spark = spark
    _check_funnel_matches_model()
