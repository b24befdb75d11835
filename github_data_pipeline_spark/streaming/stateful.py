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
