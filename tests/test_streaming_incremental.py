"""Streaming jobs (availableNow vs batch twin) and the incremental
merge layer (FIXTURES.md incremental scenario)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.incremental import (
    apply_file_changes,
    detail_backfill_keys,
    head_unchanged,
    incremental_watermark,
    upsert_by_key,
)
from github_data_pipeline_spark.streaming.jobs import (
    hourly_rollup_stream,
    read_events_stream,
    run_available_now,
    session_stream,
)

ISSUE_SCHEMA = "number int, state string, updated_at string, payload string"


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = hourly_rollup_stream(read_events_stream(spark, sf_dir))
    rows = run_available_now(stream, "hourly_t")
    got = {
        (r["hour_start"], r["event_type"]): (r["events"], r["value_cents"])
        for r in rows
    }
    from github_data_pipeline_spark.plans import all_plans

    # the batch twin also keys by the extracted prop (k_mod); re-aggregate
    # to the stream's (hour, type) grain before comparing
    batch = (
        all_plans()["events_hourly_rollup"]
        .builder(spark, sf_dir)
        .groupBy("hour_start", "event_type")
        .agg(
            F.sum("events").alias("events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )
    want = {
        (r["hour_start"], r["event_type"]): (r["events"], r["value_cents"])
        for r in batch.collect()
    }
    # exact counts/sums match; users is approx in the stream (HLL state)
    assert got == want and len(got) > 0


def test_streaming_sessions_match_batch(spark, sf_dir):
    rows = run_available_now(
        session_stream(read_events_stream(spark, sf_dir)), "sessions_t"
    )
    got = {
        (r["user_id"], r["session_start"].isoformat()): r["events"]
        for r in rows
    }
    from github_data_pipeline_spark.plans import all_plans

    batch = all_plans()["events_sessionization"].builder(spark, sf_dir)
    want = {
        (r["user_id"], r["session_start"].replace("Z", "").replace("T", "T")): r["events"]
        for r in batch.collect()
    }
    # keys: batch emits wire-format strings; normalize to isoformat
    want = {
        (u, s[:-1] if s.endswith("Z") else s): v for (u, s), v in want.items()
    }
    got = {(u, s): v for (u, s), v in got.items()}
    assert got == want and len(got) > 0


def _issues(spark, rows):
    return spark.createDataFrame(rows, ISSUE_SCHEMA)


def test_incremental_upsert_semantics(spark):
    cached = _issues(
        spark,
        [
            (1, "open", "2024-01-01T00:00:00Z", "old-1"),
            (2, "open", "2024-01-02T00:00:00Z", "old-2"),
            (3, "closed", "2024-01-03T00:00:00Z", "old-3"),
        ],
    )
    # fetched overlaps the cached max by less than the lookback:
    # an update of #2, a brand-new #4, and a boundary record #3
    fetched = _issues(
        spark,
        [
            (2, "closed", "2024-01-02T12:00:00Z", "new-2"),
            (3, "closed", "2024-01-03T00:00:00Z", "refetched-3"),
            (4, "open", "2024-01-03T00:02:00Z", "new-4"),
        ],
    )
    merged = {
        r["number"]: (r["state"], r["payload"])
        for r in upsert_by_key(cached, fetched, "number").collect()
    }
    assert merged == {
        1: ("open", "old-1"),          # cached-only retained
        2: ("closed", "new-2"),        # fetched overrides
        3: ("closed", "refetched-3"),  # boundary record overrides
        4: ("open", "new-4"),          # new key added
    }


def test_incremental_watermark_lookback(spark):
    cached = _issues(
        spark,
        [
            (1, "open", "2024-01-01T00:00:00Z", "x"),
            (2, "open", "2024-01-03T00:00:00Z", "x"),
        ],
    )
    wm = incremental_watermark(cached, ts_cols=("updated_at",))
    assert wm == datetime.datetime(2024, 1, 2, 23, 55)  # max - 300s
    assert incremental_watermark(
        _issues(spark, []), ts_cols=("updated_at",)
    ) is None


def test_detail_backfill_only_new_keys(spark):
    cached = _issues(spark, [(1, "open", "t", "x")])
    fetched = _issues(
        spark, [(1, "open", "t", "y"), (5, "open", "t", "z")]
    )
    assert [
        r["number"]
        for r in detail_backfill_keys(fetched, cached, "number").collect()
    ] == [5]


def test_apply_file_changes(spark):
    cached = spark.createDataFrame(
        [("a.py", 1), ("b.py", 2), ("old.py", 3)], "path string, v int"
    )
    changes = spark.createDataFrame(
        [
            ("a.py", "modified", None),
            ("new.py", "renamed", "old.py"),
            ("b.py", "removed", None),
        ],
        "path string, status string, previous_path string",
    )
    kept, refresh = apply_file_changes(cached, changes)
    assert {r["path"] for r in kept.collect()} == {"a.py"}
    assert {r["path"] for r in refresh.collect()} == {"a.py", "new.py"}


def test_head_short_circuit():
    assert head_unchanged("abc", "abc") is True
    assert head_unchanged("abc", "def") is False
    assert head_unchanged(None, "abc") is False


def test_stream_upsert_foreachbatch(spark, sf_dir, tmp_path):
    """Streaming -> keyed upsert sink: drained table equals the batch
    dedup by event_id; a second drain with the same checkpoint is a
    no-op (exactly-once)."""
    from github_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        stream_upsert_to_parquet,
    )

    path = str(tmp_path / "events_upserted")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir)
    stream_upsert_to_parquet(stream, path, ["event_id"], ckpt)
    from github_data_pipeline_spark.sources.tables import load_table

    n_batch = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(path).count() == n_batch
    # re-drain: checkpoint marks everything processed -> unchanged
    stream_upsert_to_parquet(
        read_events_stream(spark, sf_dir), path, ["event_id"], ckpt
    )
    assert spark.read.parquet(path).count() == n_batch


def test_dedup_stream_drops_redelivered(spark, sf_dir, tmp_path):
    """Duplicate a slice of the events file into the stream glob dir;
    the watermark dedup must emit each event_id once."""
    import shutil

    from github_data_pipeline_spark.streaming.jobs import dedup_stream

    src_dir = str(tmp_path / "stream_src")
    import os

    os.makedirs(src_dir)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src_dir}/events_dup.parquet")

    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(f"{src_dir}/*.parquet")
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    )
    deduped = dedup_stream(raw)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    from github_data_pipeline_spark.sources.tables import load_table

    n_unique = load_table(spark, sf_dir, "events").count()
    got = spark.sql(
        "SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_t"
    ).collect()[0]
    assert (got["c"], got["d"]) == (n_unique, n_unique)


def test_attribution_stream_matches_batch_join(spark, sf_dir):
    from github_data_pipeline_spark.functions.money import cents
    from github_data_pipeline_spark.sources.tables import load_table
    from github_data_pipeline_spark.streaming.jobs import attribution_stream

    rows = run_available_now(
        attribution_stream(read_events_stream(spark, sf_dir)),
        "attribution_t",
        output_mode="append",
    )
    got = sorted((r["purchase_id"], r["click_id"]) for r in rows)
    assert got  # purchases and clicks overlap within an hour in testdata

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        cents("value").alias("value_cents"),
    )
    batch = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
    )
    want = sorted((r["purchase_id"], r["click_id"]) for r in batch.collect())
    assert got == want


def test_attribution_bucket_boundaries(spark, tmp_path):
    """The (user, time-bucket) salting must not change results at the
    edges: click exactly horizon before the purchase (kept), click one
    microsecond earlier (dropped), click in the previous bucket but
    inside the horizon (kept via the second probe), same-instant click
    (kept)."""
    import datetime as dt

    from github_data_pipeline_spark.streaming.jobs import (
        attribution_stream,
        run_available_now,
    )

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, ts, typ, user=1):
        return (eid, ts, user, typ, 1.0, "{}")

    rows = [
        # purchase at 10:30:00 in bucket 10
        ev(100, base + dt.timedelta(minutes=30), "purchase"),
        # click exactly 1h before: 09:30:00 (bucket 9) -> kept
        ev(1, base + dt.timedelta(minutes=-30), "click"),
        # click 1h + 1us before -> dropped
        ev(2, base + dt.timedelta(minutes=-30, microseconds=-1), "click"),
        # click same bucket as purchase (10:05) -> kept
        ev(3, base + dt.timedelta(minutes=5), "click"),
        # click same instant as purchase -> kept (<=)
        ev(4, base + dt.timedelta(minutes=30), "click"),
        # click after the purchase -> dropped
        ev(5, base + dt.timedelta(minutes=31), "click"),
        # click 2 buckets back but within horizon is impossible for 1h
        # buckets; different user -> dropped
        ev(6, base + dt.timedelta(minutes=20), "click", user=2),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    got = sorted(
        r["click_id"]
        for r in run_available_now(
            attribution_stream(stream), "attr_edges", output_mode="append"
        )
    )
    assert got == [1, 3, 4]


def test_streaming_sliding_matches_batch(spark, sf_dir):
    """Sliding 1h/15min windows: the stream drain must equal the
    identical F.window() aggregation on the static table, and each
    event must appear in exactly window/slide = 4 windows."""
    from github_data_pipeline_spark.sources.tables import load_table
    from github_data_pipeline_spark.streaming.jobs import (
        sliding_rollup_stream,
    )
    from github_data_pipeline_spark.functions.money import cents

    rows = run_available_now(
        sliding_rollup_stream(read_events_stream(spark, sf_dir)), "sliding_t"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["events"], r["value_cents"])
        for r in rows
    }
    e = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    batch = (
        e.groupBy(
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
    want = {
        (r["window_start"], r["event_type"]): (r["events"], r["value_cents"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
    # 4x multiplicity: every event is counted in exactly 4 windows
    total_events = e.count()
    assert sum(v[0] for v in got.values()) == 4 * total_events


def test_outer_attribution_watermark_boundary_exact(spark, tmp_path):
    """ADVICE-r11: the `stream_interval_join_outer` oracle hard-codes
    Spark's state-eviction boundary as STRICT (`p.ts < watermark`).
    This fixture places one unmatched purchase EXACTLY at the final
    watermark and one 1 ms below it, so a Spark version change to <=
    eviction semantics fails HERE with a named assertion instead of as
    an opaque oracle hash mismatch (if it ever does: flip the oracle's
    `p.ts < wm.w` in plans/stream_rollup_plans.py to `<=` in step).

    Measured engine detail (Spark 4.1, WatermarkSupport): the eviction
    predicate is `event_time <= watermark - 1ms` at MILLISECOND
    precision, so a purchase 1 microsecond below the watermark is
    still withheld (pinned below) — the oracle's strict `<` is exact
    only at >= 1 ms timestamp granularity, which the events fixtures
    satisfy. If the sub-ms assertion fires, a fixture grew sub-ms
    timestamps or the engine changed precision: re-derive the oracle
    boundary before touching anything else."""
    import datetime as dt

    from github_data_pipeline_spark.streaming.jobs import (
        attribution_stream,
        run_available_now,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    wm = base - dt.timedelta(minutes=30)  # final watermark = max ts - 30m

    def ev(eid, ts, typ, user):
        return (eid, ts, user, typ, 1.0, "{}")

    rows = [
        # advance BOTH sides' max event time to `base`, pinning the
        # global watermark at min(max click, max purchase) - 30m = wm
        ev(900, base, "click", 99),
        ev(901, base, "purchase", 98),
        # unmatched purchase EXACTLY at the watermark: Spark's derived
        # expiry is purchase_ts < watermark (strict), so it is WITHHELD
        ev(1, wm, "purchase", 1),
        # unmatched purchase one MILLISECOND below: expired, emits one
        # null-click row (the oracle's `p.ts < wm` lane)
        ev(2, wm - dt.timedelta(milliseconds=1), "purchase", 2),
        # unmatched purchase one MICROSECOND below: below the watermark
        # yet withheld — the engine evicts at ts <= wm - 1ms in ms
        # precision, the measured sub-ms subtlety documented above
        ev(3, wm - dt.timedelta(microseconds=1), "purchase", 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = run_available_now(
        attribution_stream(
            stream, horizon="1 hour", closed="right", how="left_outer"
        ),
        "attr_wm_boundary",
        output_mode="append",
    )
    # bucketed-probe fold: a nowhere-matched purchase may emit up to
    # two identical null rows (one per probe) — dedupe by purchase_id
    null_pids = {r["purchase_id"] for r in out if r["click_id"] is None}
    matched_pids = {r["purchase_id"] for r in out if r["click_id"] is not None}
    assert matched_pids == set(), "no click matches any purchase here"
    assert 2 in null_pids, (
        "purchase 1ms below the watermark must emit its null row"
    )
    assert 1 not in null_pids, (
        "purchase EXACTLY at the watermark must be withheld — Spark's "
        "eviction is strict (purchase_ts < watermark). If this fires "
        "after a Spark upgrade, the engine moved to <= semantics: flip "
        "the stream_interval_join_outer oracle's `p.ts < wm.w` to `<=`."
    )
    assert 3 not in null_pids, (
        "sub-ms boundary: the engine evicts at ts <= watermark - 1ms "
        "in millisecond precision, so 1us below the watermark is "
        "withheld; the oracle's strict `<` assumes >= 1ms fixture "
        "granularity — re-derive the boundary if this changes"
    )
    assert 901 not in null_pids, "above-watermark purchase is withheld"


def test_attribution_stream_matches_oracle_checked_batch(spark, sf_dir):
    """VERDICT-r5 #6: batch==stream parity for the bucketed range join
    itself — the streaming attribution join, run with the batch
    query's exact convention (10-minute horizon, closed='right'),
    aggregated per purchase, must equal the driver-oracle-checked
    `events_range_attribution` output on the same fixture."""
    from collections import defaultdict

    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.streaming.jobs import attribution_stream

    rows = run_available_now(
        attribution_stream(
            read_events_stream(spark, sf_dir),
            horizon="10 minutes",
            closed="right",
        ),
        "attribution_oracle_t",
        output_mode="append",
    )
    agg = defaultdict(lambda: [0, 0])  # purchase event_id -> [n, cents]
    purchase_meta = {}
    for r in rows:
        agg[r["purchase_id"]][0] += 1
        agg[r["purchase_id"]][1] += r["click_cents"]
        purchase_meta[r["purchase_id"]] = (r["user_id"], r["value_cents"])

    batch = {
        r["event_id"]: (
            r["user_id"],
            r["purchase_cents"],
            r["clicks_10m"],
            r["click_cents_10m"],
        )
        for r in all_plans()["events_range_attribution"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert batch  # fixture has purchases
    with_clicks = {k: v for k, v in batch.items() if v[2] > 0}
    assert with_clicks  # non-vacuous: some purchases have clicks
    got = {
        pid: (purchase_meta[pid][0], purchase_meta[pid][1], n, c)
        for pid, (n, c) in agg.items()
    }
    assert got == with_clicks
    # zero-click purchases are exactly the ones the stream never emits
    assert set(batch) - set(agg) == {
        k for k, v in batch.items() if v[2] == 0
    }


def test_enriched_rollup_stream_matches_batch(spark, sf_dir):
    """Stream-static broadcast join parity: the streamed fact-dim
    enrichment rollup equals the identical batch plan."""
    from github_data_pipeline_spark.sources.tables import load_table
    from github_data_pipeline_spark.streaming.jobs import (
        enriched_rollup_stream,
    )

    customers = load_table(spark, sf_dir, "customer")
    rows = run_available_now(
        enriched_rollup_stream(read_events_stream(spark, sf_dir), customers),
        "enriched_t",
        output_mode="complete",
    )
    got = {(r["nationkey"], r["events"], r["value_cents"]) for r in rows}
    want = {
        (r["nationkey"], r["events"], r["value_cents"])
        for r in enriched_rollup_stream(
            load_table(spark, sf_dir, "events"), customers
        ).collect()
    }
    assert got == want and len(want) > 1


def test_funnel_stream_checkpoint_recovery(spark, tmp_path):
    """Stop/restart with a checkpoint: drain slice 1, stop the query,
    land slice 2, restart with the SAME checkpoint — the recovered
    state must fold slice 2 on top of slice 1 (not reprocess or
    forget), ending at the one-shot result."""
    import datetime as dt

    from github_data_pipeline_spark.streaming.stateful import funnel_stream

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = tmp_path / "events_src"
    ckpt = str(tmp_path / "ckpt")
    out = tmp_path / "out"
    src.mkdir()

    def land(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))

        def sink(batch_df, batch_id):
            batch_df.withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(str(out))

        q = (
            funnel_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # slice 1: user 7 views then clicks
    land(
        [
            (1, base, 7, "view", 0.0, "{}"),
            (2, base + dt.timedelta(minutes=5), 7, "click", 0.0, "{}"),
        ]
    )
    drain()
    # slice 2: the purchase arrives after a restart
    land([(3, base + dt.timedelta(minutes=30), 7, "purchase", 0.0, "{}")])
    drain()

    rows = spark.read.parquet(str(out)).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r)
    # run 1 saw steps 2; run 2 recovered (t1, t2) from the checkpoint
    # and advanced to 3 from the purchase ALONE — if state had been
    # lost, the purchase with no prior view/click would report 0
    finals = {
        bid: {(r["user_id"], r["steps_reached"]) for r in rs}
        for bid, rs in by_batch.items()
    }
    assert (7, 2) in finals[min(finals)]
    assert (7, 3) in finals[max(finals)]
    assert len(finals) >= 2


def test_watermark_drops_too_late_data(spark, tmp_path):
    """The watermark contract as Spark actually guarantees it (append
    mode): a finalized window emits EXACTLY ONCE with the rows that
    arrived before its state was evicted; a late row arriving AFTER
    eviction is dropped and can never cause a second emission.

    (A late row arriving in the same batch that finalizes its window
    may still merge — the drop guarantee is post-eviction, which is
    why this test lands the late event one batch later.)"""
    import datetime as dt

    from github_data_pipeline_spark.streaming.jobs import (
        hourly_rollup_stream,
    )

    day = dt.datetime(2024, 3, 1)

    def ev(eid, hh, mm):
        return (
            eid,
            day + dt.timedelta(hours=hh, minutes=mm),
            1,
            "click",
            1.0,
            "{}",
        )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = tmp_path / "late_events"
    slices = (
        # slice 1: two events in the 10:00 window; 12:00 pushes the
        # watermark to 11:30 at batch end
        [ev(1, 10, 0), ev(2, 10, 5), ev(3, 12, 0)],
        # slice 2: on-time events only; during this batch the 10:00
        # window (end 11:00 < watermark 11:30) finalizes, emits, and
        # its state is evicted
        [ev(5, 11, 45), ev(6, 12, 5)],
        # slice 3: the 10:10 straggler arrives AFTER eviction -> must
        # be dropped, never re-emitting the 10:00 window
        [ev(4, 10, 10), ev(7, 12, 10)],
    )
    for rows in slices:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_available_now(
        hourly_rollup_stream(stream), "late_t", output_mode="append"
    )
    emitted = [(r["hour_start"], r["events"]) for r in out]
    # exactly one emission of the finalized window, without the
    # post-eviction straggler; the still-open 11:00/12:00 windows
    # correctly emit nothing in this run
    assert emitted == [("2024-03-01T10:00:00Z", 2)]


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pin the streaming engine's session boundary rule empirically:
    the merge is boundary-INCLUSIVE — two events EXACTLY gap apart DO
    merge into one session; only a strictly larger gap splits. (This
    test originally encoded the half-open [ts, ts+gap) assumption —
    exact gap splits — and FAILED: Spark merged the exact-gap pair.
    The stream_sessionization registry oracle therefore uses the same
    > convention as the batch islands entry.)"""
    import os

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    gap = datetime.timedelta(minutes=30)
    rows = [
        # user 1: two events exactly 30:00 apart -> ONE session
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + gap, 1, "view", 1.0, "{}"),
        # user 2: 30:00.000001 apart -> TWO sessions
        (3, base, 2, "view", 1.0, "{}"),
        (4, base + gap + datetime.timedelta(microseconds=1), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "gapevents")
    os.makedirs(d)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    from github_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        run_available_now,
        session_stream,
    )

    out = run_available_now(
        session_stream(read_events_stream(spark, d)), "gap_t"
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 1  # exact gap: merged (inclusive bound)
    assert per_user[1][0]["events"] == 2
    assert len(per_user[2]) == 2  # one microsecond over: split
