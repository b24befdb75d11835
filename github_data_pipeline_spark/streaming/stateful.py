"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggs (streaming/jobs.py) cover the reference's
incremental semantics; this is the escape hatch for operators Spark
lacks natively — here, a per-user running ledger that emits a row per
micro-batch with cumulative totals and a high-water mark, the shape a
custom dedup/quota/rate-limit stream operator takes.

State is a single compact tuple per key, hash-partitioned by user_id;
the GroupStateTimeout handles eviction of idle keys (off here: the
drain path uses availableNow).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, "
    "total_value_cents long, max_ts timestamp"
)
STATE_SCHEMA = "total_events long, total_value_cents long"


def _update_user_ledger(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_cents = state.get
    else:
        total_events, total_cents = 0, 0
    batch_events = 0
    max_ts = None
    for pdf in batches:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_cents += int(round(pdf["value"].astype(float).mul(100).round()).sum())
        m = pdf["ts"].max()
        max_ts = m if max_ts is None else max(max_ts, m)
    state.update((total_events, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value_cents": [total_cents],
            "max_ts": [max_ts],
        }
    )


def user_ledger_stream(events: DataFrame) -> DataFrame:
    """events stream -> per-user cumulative ledger (one row per user per
    micro-batch), exact integer cents."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_ledger,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- streaming conversion funnel (per-user state machine) ------------------

FUNNEL_OUTPUT_SCHEMA = "user_id long, steps_reached long"
FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"  # epoch micros, -1 unset

def make_funnel_update(horizon_hours: int):
    """Build the applyInPandasWithState update fn for a
    view->click->purchase funnel with a per-step horizon.

    The per-user fold over EVENT-TIME-ORDERED batches is exact and
    needs only (t1, t2, t3) state, computed as three VECTORIZED
    min-reductions (no per-event Python loop, no sort): each stage is
    "the minimum qualifying timestamp", and min == first-in-time, so
    the reduction form equals the sequential scan — including the
    same-instant view+click tie, which the ``>= t1`` bound admits
    by construction. A stage recorded in an earlier batch never
    improves (ordered batches ⇒ later events are later), so set
    stages are simply kept.

    Exactness across micro-batches requires STRICTLY event-time-ordered
    batch boundaries: every event in batch k+1 must be strictly later
    than every event in batch k — no timestamp may straddle a
    boundary. At-or-after is NOT enough: a purchase at ts == t2
    delivered one batch before the click that sets t2 is gone by the
    time the fold learns t2 (state only keeps the three stage
    timestamps), while the batch twin — which sees all events at once
    — counts it via the ``>= t2`` bound. The file-source-per-time-slice
    layout satisfies the strict form by cutting slices BETWEEN
    distinct timestamps (equal-ts events always share a slice); a
    watermark-disciplined upstream satisfies it by emitting whole
    event-time windows. Within a batch, arrival order is free: the
    min-reductions are order-blind. The availableNow catch-up drain is
    the degenerate single ordered batch. Parity with the oracle-checked
    batch funnel is pinned for both the single-batch and the
    time-sliced multi-batch layout in tests/test_streaming_curation.py;
    the boundary-straddle counterexample that motivates the strict
    form is pinned in test_funnel_boundary_timestamp_contract.
    """
    horizon_us = horizon_hours * 3600 * 1_000_000

    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        rows = pd.concat(list(batches), ignore_index=True)
        us = rows["ts"].astype("datetime64[us]").astype("int64")
        typ = rows["event_type"]

        def first(mask) -> int:
            sel = us[mask]
            return int(sel.min()) if len(sel) else -1

        if t1 < 0:
            t1 = first(typ == "view")
        if t1 >= 0 and t2 < 0:
            t2 = first(
                (typ == "click") & (us >= t1) & (us <= t1 + horizon_us)
            )
        if t2 >= 0 and t3 < 0:
            t3 = first(
                (typ == "purchase") & (us >= t2) & (us <= t2 + horizon_us)
            )
        state.update((t1, t2, t3))
        steps = 3 if t3 >= 0 else 2 if t2 >= 0 else 1 if t1 >= 0 else 0
        yield pd.DataFrame(
            {"user_id": [user_id], "steps_reached": [steps]}
        )

    return _update


def funnel_stream(events: DataFrame, horizon_hours: int = 24) -> DataFrame:
    """events stream -> per-user funnel progress (one row per user per
    micro-batch, update mode): the streaming twin of the oracle-checked
    ``events_funnel_steps`` batch query, as a custom stateful operator
    with three longs of state per user."""
    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_update(horizon_hours),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
