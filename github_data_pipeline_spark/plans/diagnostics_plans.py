"""Registry exposure for the skew diagnostics operator
(operators/diagnostics.key_skew_report) — the measurement a 100-TB
operator runs BEFORE reaching for salting or AQE thresholds.

The registry's skew entries (salted_priority_revenue,
salted_group_topk) prove the CURE; this entry oracle-scores the
DIAGNOSIS: the top-k heaviest key groups with their share of all rows
and their ratio to the mean group size — ``skew_ratio`` is exactly the
number AQE's skew-join threshold reasons about, and the input to the
decision between plain join / salted join / threshold bump. Unit-only
since r5 (tests/test_diagnostics.py); the oracle twin makes the
arithmetic itself driver-scorable.

Hash-exactness: counts are integers; ``fraction`` and ``skew_ratio``
are each ONE division of exact integers (long/long -> double in both
engines), and the top-k order is fully determined (rows DESC, then
the key ASC). Scale: one keyed aggregation + a whitelisted 1-row
stats attach + TakeOrderedAndProject — the report is group-bounded,
never row-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.diagnostics import key_skew_report
from ..sources.tables import load_table, spread
from .core import REGISTRY

SKEW_TOP = 20


@REGISTRY.add(
    "events_user_skew_report",
    f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS rows
      FROM events GROUP BY user_id
    ), stats AS (
      SELECT SUM(rows) AS _total, COUNT(*) AS _groups FROM counts
    )
    SELECT user_id, rows,
           CAST(rows AS DOUBLE) / _total AS fraction,
           CAST(rows * _groups AS DOUBLE) / _total AS skew_ratio
    FROM counts, stats
    ORDER BY rows DESC, user_id ASC
    LIMIT {SKEW_TOP}
    """,
    doc=f"Key-skew diagnosis over the events stream: the "
    f"{SKEW_TOP} heaviest user_id groups with row share and "
    "skew_ratio (group size over mean group size — the quantity "
    "AQE's skew-join threshold reasons about, and the input to the "
    "plain-vs-salted join decision the salted entries then prove). "
    "One keyed aggregation + a whitelisted 1-row stats attach + "
    "TakeOrderedAndProject; both doubles are single divisions of "
    "exact integers and the order is fully determined (rows DESC, "
    "user ASC), so the report hash-matches cell-exact. Promotes the "
    "r5 unit-only operators/diagnostics.key_skew_report to "
    "oracle-scored.",
    tags=("events", "diagnostics", "skew", "topk"),
)
def events_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(load_table(spark, sf_dir, "events").select("user_id"))
    return key_skew_report(ev, "user_id", top=SKEW_TOP)
