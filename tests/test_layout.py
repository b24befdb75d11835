"""Physical-layout operators (sources/layout.py): partition pruning
actually prunes (plan + file count), compaction is row-identical."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from github_data_pipeline_spark.sources.layout import (
    compact_parquet,
    read_events_day,
    write_events_partitioned,
)
from github_data_pipeline_spark.sources.tables import load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_part")
    write_events_partitioned(events, out)

    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("dt=")
    )
    assert len(days) > 1  # fixture spans multiple days
    day = days[len(days) // 2]

    sliced = read_events_day(spark, out, day)
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    # the dt predicate must appear as a partition filter on the scan,
    # NOT as a post-scan row filter
    assert "PartitionFilters" in plan and "dt" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    # the prune is physical: only the one day's files are read
    day_files = glob.glob(os.path.join(out, f"dt={day}", "*.parquet"))
    all_files = glob.glob(os.path.join(out, "dt=*", "*.parquet"))
    assert 0 < len(day_files) < len(all_files)
    n_scanned = sliced.rdd.getNumPartitions()
    assert n_scanned <= len(day_files) + 1

    # results equal the unpartitioned filter on the same day
    want = events.filter(
        F.date_format("ts", "yyyy-MM-dd") == day
    ).count()
    assert sliced.count() == want > 0


def test_compaction_row_identical(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "many_small")
    # land 20 tiny files
    events.repartition(20).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 15  # some partitions may be empty-file-skipped

    rows_before = {
        r["event_id"] for r in spark.read.parquet(path).collect()
    }
    n = compact_parquet(spark, path, target_file_bytes=1024 * 1024)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n == 1 and after == 1  # tiny data -> one target file
    rows_after = {
        r["event_id"] for r in spark.read.parquet(path).collect()
    }
    assert rows_after == rows_before
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_compaction_refuses_partitioned_input(spark, sf_dir, tmp_path):
    """Compacting a Hive-partitioned tree would flatten the partition
    columns into data columns and silently lose pruning — refused."""
    import pytest

    from github_data_pipeline_spark.sources.layout import (
        write_events_partitioned,
    )

    events = load_table(spark, sf_dir, "events").limit(50)
    path = str(tmp_path / "parted")
    write_events_partitioned(events, path)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_parquet(spark, path)
    # ...but a leaf partition directory compacts fine
    leaf = sorted(glob.glob(os.path.join(path, "dt=*")))[0]
    rows_before = spark.read.parquet(leaf).count()
    assert compact_parquet(spark, leaf) == 1
    assert spark.read.parquet(leaf).count() == rows_before


def test_compaction_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """A crash between the two swap renames leaves the data stranded
    under .__compact_old__ with nothing at the path; the next call
    must restore and complete, row-identical."""
    events = load_table(spark, sf_dir, "events").limit(100)
    path = str(tmp_path / "crashy")
    events.repartition(5).write.parquet(path)
    rows = {r["event_id"] for r in spark.read.parquet(path).collect()}
    # simulate the mid-swap crash state: original renamed away, tmp
    # half-written garbage left behind
    os.rename(path, path + ".__compact_old__")
    os.makedirs(path + ".__compact_tmp__")
    n = compact_parquet(spark, path, target_file_bytes=1024 * 1024)
    assert n == 1
    got = {r["event_id"] for r in spark.read.parquet(path).collect()}
    assert got == rows
    assert not os.path.exists(path + ".__compact_old__")
    assert not os.path.exists(path + ".__compact_tmp__")


def test_compaction_recovers_from_post_commit_crash(spark, sf_dir, tmp_path):
    """A crash AFTER rename(tmp, path) committed but BEFORE the backup
    rmtree leaves BOTH path (the compacted data) and .__compact_old__
    on disk. The stale backup must be cleaned up at the next call —
    not left to fail every subsequent rename(path, bak) with
    ENOTEMPTY — and the surviving data is the committed (new) copy
    (r7 ADVICE)."""
    events = load_table(spark, sf_dir, "events").limit(100)
    path = str(tmp_path / "postcommit")
    events.repartition(5).write.parquet(path)
    rows = {r["event_id"] for r in spark.read.parquet(path).collect()}
    # simulate: swap committed (path holds good data), stale backup
    # holding the PRE-compaction copy still present
    bak = path + ".__compact_old__"
    os.makedirs(bak)
    with open(os.path.join(bak, "stale"), "w") as fh:
        fh.write("pre-compaction leftovers")
    n = compact_parquet(spark, path, target_file_bytes=1024 * 1024)
    assert n == 1
    got = {r["event_id"] for r in spark.read.parquet(path).collect()}
    assert got == rows
    assert not os.path.exists(bak)
    assert not os.path.exists(path + ".__compact_tmp__")


def test_zorder_empty_input_writes_empty_dir(spark, sf_dir, tmp_path):
    """min/max over zero rows aggregates to NULL; the z-order writer
    must land an empty schema-bearing directory, not raise on None
    arithmetic (r6 ADVICE)."""
    from github_data_pipeline_spark.sources.layout import (
        write_events_zordered,
    )

    events = load_table(spark, sf_dir, "events").filter(F.lit(False))
    out = str(tmp_path / "zempty")
    write_events_zordered(events, out, files=4)
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert "event_id" in back.columns


def test_clustered_write_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range clustering must yield pairwise-disjoint per-file ts
    ranges (the footer-stats property every engine's file skipping
    relies on), and lose no rows."""
    import duckdb

    from github_data_pipeline_spark.sources.layout import (
        write_events_clustered,
    )

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_clustered")
    write_events_clustered(events, out, files=8)

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) == 8
    con = duckdb.connect()
    spans = [
        con.execute(
            f"SELECT MIN(ts), MAX(ts), COUNT(*) FROM '{f}'"
        ).fetchone()
        for f in files
    ]
    con.close()
    spans = [s for s in spans if s[2] > 0]
    spans.sort()
    for (lo1, hi1, _), (lo2, hi2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file time ranges overlap — no skipping"
    assert sum(s[2] for s in spans) == events.count()


def test_zorder_prunes_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order vs 1-D ts clustering, measured as FILES A PREDICATE
    MUST READ (the statistic footer pruning actually uses). Total box
    area is ~1/files in any layout — what Z-order changes is the
    per-dimension extent: 1-D ts clustering answers a ts predicate
    from ~1 file but a user predicate from ALL files; the Z-curve
    answers BOTH from a small fraction. No rows may be lost."""
    import duckdb

    from github_data_pipeline_spark.sources.layout import (
        write_events_clustered,
        write_events_zordered,
    )

    events = load_table(spark, sf_dir, "events")
    n_files = 16
    one_d = str(tmp_path / "ts_clustered")
    z_d = str(tmp_path / "zordered")
    write_events_clustered(events, one_d, files=n_files)
    write_events_zordered(events, z_d, files=n_files)

    con = duckdb.connect()

    def boxes(path):
        rows = [
            con.execute(
                f"SELECT MIN(user_id), MAX(user_id), "
                f"MIN(epoch(ts)), MAX(epoch(ts)), COUNT(*) FROM '{f}'"
            ).fetchone()
            for f in glob.glob(os.path.join(path, "*.parquet"))
        ]
        return [r for r in rows if r[4] > 0]

    b1, bz = boxes(one_d), boxes(z_d)
    con.close()
    total = events.count()
    assert sum(r[4] for r in b1) == sum(r[4] for r in bz) == total

    users = [r["user_id"] for r in events.select("user_id").distinct().limit(8).collect()]
    t_lo = min(r[2] for r in b1)
    t_hi = max(r[3] for r in b1)
    t_probes = [t_lo + (t_hi - t_lo) * k // 8 for k in range(1, 8)]

    def files_for_user(bs, u):
        return sum(1 for r in bs if r[0] <= u <= r[1])

    def files_for_ts(bs, t):
        return sum(1 for r in bs if r[2] <= t <= r[3])

    user_1d = sum(files_for_user(b1, u) for u in users) / len(users)
    user_z = sum(files_for_user(bz, u) for u in users) / len(users)
    ts_1d = sum(files_for_ts(b1, t) for t in t_probes) / len(t_probes)
    ts_z = sum(files_for_ts(bz, t) for t in t_probes) / len(t_probes)

    # 1-D: every file's user range is full-width -> all 16 files
    assert user_1d == len(b1)
    # Z: a user predicate prunes to a fraction of the files
    assert user_z <= 0.5 * user_1d, (user_z, user_1d)
    # Z still prunes on ts too (worse than 1-D's ~1 file, but far
    # better than reading everything)
    assert ts_1d <= 2
    assert ts_z <= 0.5 * len(bz), (ts_z, ts_1d)


def test_morton_key_matches_python_reference(spark):
    """The Catalyst bit-interleave equals the plain-Python Morton
    code on edge values (0, max, alternating bit patterns)."""
    from github_data_pipeline_spark.sources.layout import (
        _interleave_bits_expr,
    )

    def py_morton(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [0, 1, 2, 3, 0x5555, 0xAAAA, 0x7FFF, 0x8000, 0xFFFF, 12345]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            _interleave_bits_expr(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    want = [py_morton(a, b) for a, b in rows]
    assert got == want


def test_versioned_snapshots_commit_and_time_travel(spark, sf_dir, tmp_path):
    """write_versioned lands immutable snapshot dirs and commits via an
    atomic pointer; readers get the committed latest by default and any
    prior version explicitly (time travel)."""
    from github_data_pipeline_spark.sources.layout import (
        latest_version,
        list_versions,
        read_version,
        write_versioned,
    )

    events = load_table(spark, sf_dir, "events")
    table = str(tmp_path / "vtab")
    v1 = write_versioned(events.limit(50), table)
    v2 = write_versioned(events.limit(80), table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    assert list_versions(table) == [1, 2]
    assert read_version(spark, table).count() == 80      # pointer
    assert read_version(spark, table, 1).count() == 50   # time travel


def test_versioned_orphan_never_clobbered_and_vacuumed(spark, sf_dir, tmp_path):
    """A crashed writer leaves an ORPHAN version dir without moving the
    pointer: readers must keep seeing the committed snapshot, the next
    writer must NOT reuse (and clobber) the orphan's number, and vacuum
    removes both the orphan and pruned history — never the pointer's
    target."""
    import os

    from github_data_pipeline_spark.sources.layout import (
        latest_version,
        list_versions,
        read_version,
        vacuum_versions,
        write_versioned,
    )

    events = load_table(spark, sf_dir, "events")
    table = str(tmp_path / "vtab2")
    write_versioned(events.limit(10), table)  # v1 committed
    # simulate a crash: v2 directory fully written, pointer NOT moved
    events.limit(99).write.parquet(os.path.join(table, "v2"))
    assert latest_version(table) == 1
    assert read_version(spark, table).count() == 10  # reader unaffected
    v = write_versioned(events.limit(20), table)     # must skip the orphan
    assert v == 3 and latest_version(table) == 3
    assert read_version(spark, table).count() == 20
    removed = vacuum_versions(table, keep=1)
    assert sorted(removed) == [1, 2]  # history + orphan gone
    assert list_versions(table) == [3]
    assert read_version(spark, table).count() == 20
    # an UNCOMMITTED dir newer than the pointer with a fresh mtime may
    # be an IN-FLIGHT write between snapshot landing and pointer commit:
    # default-retention vacuum must leave it alone (deleting it would
    # break that writer's commit), while retention=0 (caller-asserted
    # single-writer window) reaps it as a true orphan.
    events.limit(7).write.parquet(os.path.join(table, "v4"))
    assert vacuum_versions(table, keep=1) == []          # retained
    assert list_versions(table) == [3, 4]
    assert vacuum_versions(table, keep=1, orphan_retention_seconds=0) == [4]
    assert list_versions(table) == [3]


def test_vacuum_age_signal_is_tree_max_mtime(spark, sf_dir, tmp_path):
    """An in-flight writer that created its version dir long ago but is
    STILL landing files (staging sub-dirs don't refresh the top-level
    mtime) must not be reaped: the orphan-age signal is the newest
    mtime anywhere in the tree, not the dir's own."""
    import os
    import time

    from github_data_pipeline_spark.sources.layout import (
        list_versions,
        vacuum_versions,
        write_versioned,
    )

    events = load_table(spark, sf_dir, "events")
    table = str(tmp_path / "vtab3")
    write_versioned(events.limit(5), table)  # v1 committed
    # v2: uncommitted, top-level dir mtime forced PAST retention, but a
    # staging sub-dir holds a file the writer touched just now
    v2 = os.path.join(table, "v2")
    staging = os.path.join(v2, "_temporary", "0")
    os.makedirs(staging)
    stale = time.time() - 48 * 3600
    with open(os.path.join(staging, "part-0.parquet.inprogress"), "wb") as fh:
        fh.write(b"landing")
    os.utime(v2, (stale, stale))
    assert vacuum_versions(table, keep=1) == []  # fresh subtree: in flight
    assert 2 in list_versions(table)
    # once every file in the tree is stale too, it is a true orphan
    for root, dirs, files in os.walk(v2):
        for name in dirs + files:
            os.utime(os.path.join(root, name), (stale, stale))
    os.utime(v2, (stale, stale))
    assert vacuum_versions(table, keep=1) == [2]
