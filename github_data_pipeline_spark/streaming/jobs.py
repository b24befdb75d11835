"""Structured Streaming jobs over the ``events`` stream table.

The reference has no continuous streaming — its closest construct is
incremental batch with a 300 s lookback (SURVEY §2.10). These jobs are
the engine's extension of that semantics to true streams, and each has
a batch twin in plans/events_plans.py whose oracle pins the produced
values (tests drive the stream with availableNow over the same parquet
and diff against the batch result).

Late data: the watermark plays the reference's
``INCREMENTAL_LOOKBACK_SEC`` role — events later than the watermark
horizon are dropped instead of re-fetched (config.py:25).

Scale: stateful aggs keyed by (window/event_type) and (user_id) hash-
partition the state store; at 100 TB/day the knobs are watermark delay
and ``spark.sql.shuffle.partitions`` for state shards — plan shape is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents

WATERMARK = "30 minutes"
SESSION_GAP = "30 minutes"


def drain_blocking(q, name: str = "", timeout_sec: int = 300) -> None:
    """Block until an availableNow drain finishes, then stop the query.

    ``awaitTermination(timeout)`` returns False on timeout WITHOUT
    raising; ignoring that boolean lets a slow drain fall through to
    ``stop()`` and return a partially-drained sink as if it were final
    — which surfaces downstream as a confusing oracle hash mismatch
    instead of a clear failure. Raise TimeoutError so a stuck drain
    names itself. Shared by every memory-sink gate entry.
    """
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming drain {name or q.name!r} did not finish "
                f"within {timeout_sec}s — refusing to treat the "
                "partially-drained sink as a final result"
            )
    finally:
        q.stop()


#: (abs events.parquet path, mtime_ns) -> whether ts is TIMESTAMP(NANOS).
#: The probe is a deterministic property of the INPUT FILES (schema
#: metadata, never data): re-probing the same unmodified file per drain
#: cost ~0.1-0.2 s of driver round trips x ~9 streaming entries per
#: bench pass (guide §5.3). The mtime key invalidates on regeneration.
_NANOS_PROBE_CACHE: dict[tuple[str, int], bool] = {}


def _events_ts_is_nanos(spark: SparkSession, events_path: str) -> bool:
    import os

    key_path = os.path.abspath(events_path)
    try:
        mtime = os.stat(key_path).st_mtime_ns
    except OSError:
        mtime = 0
    key = (key_path, mtime)
    hit = _NANOS_PROBE_CACHE.get(key)
    if hit is None:
        # with nanosAsLong on and NTZ inference off (session tuning):
        # TIMESTAMP(NANOS) surfaces as bigint, TIMESTAMP(MICROS) as
        # timestamp
        raw_probe = spark.read.parquet(events_path)
        hit = _NANOS_PROBE_CACHE[key] = (
            dict(raw_probe.dtypes).get("ts") == "bigint"
        )
    return hit


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the events table. The on-disk ts physical
    type varies across testdata generations (TIMESTAMP(NANOS) vs
    TIMESTAMP(MICROS)); probe the RAW parquet schema (load_table's
    output is post-conversion, always TimestampType, so it cannot
    distinguish the two — probe result cached per (path, mtime)) and
    mirror the batch conversion (sources/tables.py) so stream and
    batch see identical instants."""
    import os

    from ..sources.tables import load_table

    load_table(spark, sf_dir, "events")  # applies session tuning + confs
    nanos = _events_ts_is_nanos(spark, os.path.join(sf_dir, "events.parquet"))
    reader = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
            if nanos
            # micros: read as timestamp directly (session tz is UTC, so
            # the naive parquet value is the same instant the oracle sees)
            else "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # glob form: the file-stream source requires a directory/glob, and a
    # glob also makes it pick up new event files as they land
    raw = reader.parquet(f"{sf_dir}/events.parque*")
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw


def hourly_rollup_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of events_hourly_rollup: tumbling 1h window +
    per-type counts/sums, watermarked for state cleanup."""
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), fmt).alias("hour_start"),
            "event_type",
            "events",
            "approx_users",
            "value_cents",
        )
    )


def sliding_rollup_stream(events: DataFrame) -> DataFrame:
    """Sliding-window rollup: 1-hour windows advancing every 15
    minutes — the overlapping-window surface tumbling/session windows
    don't exercise. Each event belongs to window/slide = 4 windows, so
    state (and output) carry a 4x factor over the tumbling rollup;
    the watermark still bounds retained state to ~horizon/slide window
    groups per key, which is the number that matters at 100 TB. The
    batch twin is the identical F.window() aggregation run on the
    static table (parity pinned in tests/test_streaming_incremental)."""
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), fmt).alias("window_start"),
            "event_type",
            "events",
            "value_cents",
        )
    )


def session_stream(events: DataFrame) -> DataFrame:
    """Streaming sessionization via session_window — the stateful twin
    of the lag/cumsum islands idiom in events_sessionization."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "events",
            "value_cents",
        )
    )


def dedup_stream(events: DataFrame, id_col: str = "event_id") -> DataFrame:
    """Streaming exact dedup: drop re-delivered events by id within the
    watermark horizon (dropDuplicatesWithinWatermark) — the streaming
    twin of exact_dedup_reingest. State holds only ids inside the
    horizon, so memory is bounded by arrival rate x watermark, not by
    history."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        [id_col]
    )


def stream_upsert_to_parquet(
    events: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint_dir: str,
) -> None:
    """Streaming incremental merge: each micro-batch upserts into the
    parquet table by key (foreachBatch -> sources.sinks.write_upsert) —
    the synthesis of the reference's cache-merge semantics (§2.10) with
    a continuous source. Exactly-once per batch via the checkpoint;
    with Delta the body becomes a MERGE and gains file pruning."""
    from ..sources.sinks import write_upsert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_upsert(batch_df.sparkSession, batch_df, path, key_cols,
                     partition_by=())

    q = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    drain_blocking(q, "stream_upsert_to_parquet")


def _interval_seconds(horizon: str) -> int:
    """Seconds in an INTERVAL-style horizon: one or more ``N unit``
    parts (week/day/hour/minute/second), e.g. ``"1 hour 30 minutes"``
    — the grammar ``F.expr(f"INTERVAL {horizon}")`` accepted before
    bucketing existed, minus sub-second units (a bucket width below
    one second is not a meaningful attribution horizon)."""
    import re

    units = {
        "week": 604800,
        "day": 86400,
        "hour": 3600,
        "minute": 60,
        "second": 1,
    }
    pat = re.compile(r"(\d+)\s*(week|day|hour|minute|second)s?")
    total, pos = 0, 0
    for m in pat.finditer(horizon.lower()):
        if horizon[pos : m.start()].strip():
            raise ValueError(f"unsupported horizon {horizon!r}")
        total += int(m.group(1)) * units[m.group(2)]
        pos = m.end()
    if total <= 0 or horizon[pos:].strip():
        raise ValueError(f"unsupported horizon {horizon!r}")
    return total


def attribution_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    closed: str = "both",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each ``purchase`` attributed to the
    same user's ``click`` events within the preceding ``horizon``.

    Both sides are watermarked, and the join condition carries the
    event-time range — the two facts Structured Streaming needs to
    bound state: a buffered click can be dropped once the watermark
    passes ``click_ts + horizon``, so state is arrival-rate x horizon,
    never history.

    The equi-key is (user_id, horizon-wide time bucket), NOT user_id
    alone — the streaming twin of the bucketed range join
    (operators/rangejoin.py). Clicks land in one bucket
    (epoch DIV horizon, exact integer micros); each purchase probes
    its own bucket and the previous one (two exploded rows), which
    covers the whole look-back window exactly once per pair, so the
    output is row-identical to the plain interval join (parity test
    pins it). Two wins a hot user makes non-negotiable: (1) the state
    lookup for one purchase scans only clicks from one bucket — the
    per-key multi-value scan in the state store is bounded by
    clicks-per-horizon, not clicks-per-history (in a single
    availableNow batch the watermark never advances mid-batch, so the
    unbucketed join degrades to |purchases| x |all clicks| per hot
    key); (2) a hot user's state spreads across (user, bucket)
    partitions instead of serializing on one task.

    ``closed`` picks the look-back convention, mirroring
    ``operators/rangejoin.interval_join``: ``"both"`` keeps a click
    exactly ``horizon`` before the purchase; ``"right"`` (the batch
    ``events_range_attribution`` convention) drops it — so the stream
    is row-identical to the oracle-checked batch range join, pinned by
    tests/test_streaming_incremental.py.
    """
    if closed not in ("both", "right"):
        raise ValueError(f"closed must be 'both' or 'right': {closed!r}")
    width_us = _interval_seconds(horizon) * 1_000_000
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
            cents("value").alias("click_cents"),
        )
        .withColumn(
            "c_bucket", F.expr(f"unix_micros(click_ts) DIV {width_us}")
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            cents("value").alias("value_cents"),
        )
        .withWatermark("purchase_ts", WATERMARK)
        .withColumn(
            "p_bucket", F.expr(f"unix_micros(purchase_ts) DIV {width_us}")
        )
        .withColumn(
            "probe_bucket",
            F.explode(F.array(F.col("p_bucket"), F.col("p_bucket") - 1)),
        )
    )
    lo = (
        F.col("click_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        if closed == "right"
        else F.col("click_ts")
        >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("probe_bucket") == F.col("c_bucket"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & lo,
        how,
    ).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "value_cents",
        "click_id",
        "click_ts",
        "click_cents",
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> list:
    """Drain the stream with the availableNow trigger into a memory sink
    and return the rows — incremental-batch execution of the streaming
    plan (the Structured Streaming analog of the reference's catch-up
    run). Use output_mode="append" for stateless (filter/map) streams;
    "complete" requires an aggregation."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    drain_blocking(q, query_name, timeout_sec=120)
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


def enriched_rollup_stream(
    events: DataFrame, customers: DataFrame
) -> DataFrame:
    """Stream-static broadcast enrichment: the event stream joined to a
    static customer dimension (user_id -> nation), rolled up per
    nation — the canonical streaming fact-dim pattern.

    The static side is re-planned per micro-batch (so a dimension
    refresh lands without restarting the query) and deliberately
    UN-HINTED: a user dimension is unbounded (it grows with the user
    base), so a forced broadcast is a 100-TB OOM hazard, and a
    build-time size gate would go stale across dimension refreshes.
    Per-micro-batch planning broadcasts it automatically while it is
    under spark.sql.autoBroadcastJoinThreshold and degrades to a keyed
    shuffle when it outgrows that — the honest strategy at every
    scale. Left join keeps events for unknown users (nation NULL) — a
    dropped-row enrichment is a silent data loss at scale. Parity with
    the identical batch plan is pinned in
    tests/test_streaming_incremental.py.
    """
    dims = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
    )
    return (
        events.join(dims, "user_id", "left")
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(cents("value")).alias("value_cents"),
        )
    )


def state_shard_conf(spark: SparkSession, sf_dir: str):
    """Context manager: run a drain with spark.sql.shuffle.partitions
    sized to the events table (events_state_shards) and restore the
    caller's value after. Stateful plans get no AQE coalescing, so the
    conf IS the state-store count — at the bench SF a drain pays 32
    store setups per stateful operator per micro-batch for megabytes
    of events unless it is sized to the data (measured r13: 1.1-2.3 s
    per drain on the five gates that lacked this; the interval-join /
    ledger gates carried it since r9). Shard count never changes
    results — state lives per key wherever it hashes."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", events_state_shards(sf_dir)
        )
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    return _ctx()


def events_state_shards(sf_dir: str) -> str:
    """State-shard count sized to the events table's bytes (~2 MB per
    shard, floor 8, cap 32). Stateful plans get no AQE coalescing, so
    spark.sql.shuffle.partitions IS the state-store count; sizing it to
    the data keeps drain startup proportional instead of paying 32
    store setups for a megabyte of events. Shard count never changes
    results — state lives per key wherever it hashes."""
    import glob
    import os

    paths = glob.glob(os.path.join(sf_dir, "events.parque*"))
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for p in paths
        for r, _d, fs in os.walk(p)
        for f in fs
    ) or sum(os.path.getsize(p) for p in paths if os.path.isfile(p))
    return str(min(32, max(8, total // (2 << 20))))
