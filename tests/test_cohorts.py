"""Cohort-retention semantics (plans/cohort_plans.py) beyond the
registry oracle: structural invariants on the real corpus and an
engine-parallel hostile fixture."""

from __future__ import annotations

import duckdb
import pandas as pd

from github_data_pipeline_spark.plans import all_plans

# canonical registration order FIRST (see test_driver_window_invariants)
REG = all_plans()

from github_data_pipeline_spark.plans import cohort_plans  # noqa: E402


def test_offset_zero_is_full_cohort(spark, sf_dir):
    """Every cohort's week-0 row exists and has retention 100: all
    members are by definition active in their first-seen week; and no
    offset row ever exceeds the cohort size."""
    rows = REG["events_retention_cohorts"].builder(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[str, dict[int, tuple[int, int, int]]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = (
            r["active_users"],
            r["cohort_size"],
            r["retention_pct"],
        )
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"{cohort} missing week-0 row"
        active, size, pct = offsets[0]
        assert active == size and pct == 100, cohort
        for off, (a, s, p) in offsets.items():
            assert a <= s and p <= 100, (cohort, off)


def test_engine_parity_hostile(spark):
    """Gap weeks (user silent for a week then returning) and a
    single-event user, engine-parallel."""
    rows = [
        # user 1: weeks 0, 2 (gap at 1)
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-15 10:00:00"),
        # user 2: single event, same cohort week as user 1
        (3, 2, "2024-01-03 09:00:00"),
        # user 3: later cohort, two consecutive weeks
        (4, 3, "2024-01-08 08:00:00"),
        (5, 3, "2024-01-16 08:00:00"),
    ]
    pdf = pd.DataFrame(
        [
            (eid, pd.Timestamp(ts), uid, "view", 1.0, "{}")
            for eid, uid, ts in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    q = REG["events_retention_cohorts"]
    sdf = spark.createDataFrame(pdf)
    orig = cohort_plans.load_table
    cohort_plans.load_table = lambda _s, _d, _t: sdf
    try:
        got = [tuple(r) for r in q.builder(spark, "x").collect()]
    finally:
        cohort_plans.load_table = orig
    con = duckdb.connect()
    con.register("events", pdf)
    want = [tuple(r) for r in con.execute(q.oracle).fetchall()]
    con.close()
    assert got == want
    # 2024-01-01 is a Monday: cohort {1,2} at 2024-01-01 (user 1 back
    # at offset 2, gap at 1), cohort {3} at 2024-01-08 retained at 1
    assert got == [
        ("2024-01-01", 0, 2, 2, 100),
        ("2024-01-01", 2, 1, 2, 50),
        ("2024-01-08", 0, 1, 1, 100),
        ("2024-01-08", 1, 1, 1, 100),
    ]
