"""Physical data layout for scale: partitioned writes, partition-
pruning reads, and small-file compaction.

At 100 TB the dominant scan cost is decided before any query runs, by
how the data lands on disk:

* **Partitioned layout** — ``partitionBy`` on a derived date column
  turns every time-bounded query into a directory prune: Spark's file
  index skips non-matching partitions entirely (visible as
  ``PartitionFilters`` in the scan node), so a one-day query over a
  year of data reads ~1/365th of the files. The partition column must
  be LOW cardinality (days, not timestamps) or the directory tree
  itself becomes the bottleneck.
* **Compaction** — streaming/incremental sinks accumulate many small
  files; each file costs a task, a footer read, and an open() on the
  object store. Periodic compaction rewrites a directory to
  ~target-sized files. The rewrite is one shuffle-free coalesce when
  shrinking file count; correctness is row-identical by construction.

Pinned by tests/test_layout.py: pruning proof (plan shows
PartitionFilters + pruned file count, results equal the unpartitioned
filter), compaction row-identity + file-count reduction.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(events: DataFrame, out_dir: str) -> None:
    """Land events Hive-partitioned by event day (``dt=YYYY-MM-DD``).

    The partition value is DERIVED (date-truncated), kept alongside
    the full-fidelity ``ts`` column — queries filter on ``dt`` for the
    prune and on ``ts`` for the precise bound, the standard lakehouse
    time-partitioning pattern.
    """
    (
        events.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(out_dir)
    )


def read_events_day(
    spark: SparkSession, part_dir: str, day: str
) -> DataFrame:
    """One-day slice of a partitioned events directory.

    The ``dt`` equality is a pure partition predicate — it prunes at
    the file-index level and never reaches row groups; a 100 TB/year
    table answers this from one day's files.
    """
    return spark.read.parquet(part_dir).filter(F.col("dt") == day)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory to ~``target_file_bytes`` files;
    returns the new file count.

    File count is sized from the CURRENT on-disk bytes (cheap listing,
    no data job). The rewrite goes through a temp directory + a
    two-rename swap so a failed compaction never destroys the input.
    Coalesce, not repartition: shrinking file count needs no shuffle.

    **Flat directories only.** A Hive-partitioned tree (``key=value``
    subdirectories) would silently flatten — partition columns become
    data columns and every downstream partition prune is lost — so
    partitioned inputs are refused; compact each leaf partition
    directory instead.

    **Crash recovery.** The two renames cannot be one atomic op, so a
    crash between them leaves no directory at ``path`` with the data
    intact in ``<path>.__compact_old__``; the next call (or a manual
    ``mv``) restores it before compacting. A crash *after* the swap
    committed but before the backup rmtree leaves BOTH directories —
    ``path`` already holds the compacted data, so the next call
    removes the stale backup and proceeds. Each rename is atomic per
    directory on a POSIX fs; on an object store this whole commit is
    the table-format metadata pointer swap (Delta/Iceberg).
    """
    import shutil

    tmp = path.rstrip("/") + ".__compact_tmp__"
    bak = path.rstrip("/") + ".__compact_old__"
    if os.path.isdir(bak) and not os.path.isdir(path):
        # a previous compaction crashed mid-swap: the original is
        # intact under the backup name — restore and carry on
        os.rename(bak, path)
    elif os.path.isdir(bak):
        # both path and bak exist: a previous compaction crashed AFTER
        # the swap committed (rename(tmp, path) succeeded) but before
        # the backup was removed — path already holds the compacted
        # data, so the stale backup is garbage. Without this cleanup
        # every subsequent compaction dies at os.rename(path, bak)
        # with ENOTEMPTY/EEXIST until someone removes it by hand.
        shutil.rmtree(bak)
    shutil.rmtree(tmp, ignore_errors=True)  # stale temp from a crash
    partition_dirs = [
        d
        for d in glob.glob(os.path.join(path, "*=*"))
        if os.path.isdir(d)
    ]
    if partition_dirs:
        raise ValueError(
            f"compact_parquet: {path!r} is Hive-partitioned "
            f"(e.g. {os.path.basename(partition_dirs[0])!r}); "
            "compacting would flatten partition columns into data "
            "columns and lose pruning — compact each leaf partition "
            "directory instead"
        )
    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ] or [
        f
        for f in glob.glob(os.path.join(path, "part-*"), recursive=False)
        if os.path.isfile(f)
    ]
    if not files:
        return 0  # nothing to compact; never run a job on an empty dir
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, -(-total // target_file_bytes))  # ceil
    spark.read.parquet(path).coalesce(int(n)).write.mode("overwrite").parquet(
        tmp
    )
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return int(n)


def write_events_clustered(events: DataFrame, out_dir: str, files: int) -> None:
    """Range-cluster events by ``ts`` into ``files`` files with
    non-overlapping time ranges (repartitionByRange + in-partition
    sort).

    Partitioning prunes directories; CLUSTERING prunes inside them:
    with each file covering a disjoint ts range, the parquet footer
    min/max statistics let any engine (Spark row-group skipping,
    DuckDB zone maps, object-store readers) discard whole files for a
    time-bounded predicate — the poor man's Z-order for a 1-D key,
    and the right layout for append-mostly event tables. The proof in
    tests/test_layout.py checks the on-disk property itself: per-file
    ts ranges are pairwise disjoint, so skipping is guaranteed for
    every reader, not just one engine's plan.
    """
    (
        events.repartitionByRange(files, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _interleave_bits_expr(a, b, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    integer columns — pure Catalyst shift/mask arithmetic, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.bitwiseOR — the | operator is logical OR in PySpark
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a, i) % 2, 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(b, i) % 2, 2 * i + 1)
        )
    return z


def write_events_zordered(
    events: DataFrame, out_dir: str, files: int
) -> None:
    """Two-dimensional clustering (Z-order on (user_id, ts)): files
    whose min/max bounding boxes are tight on BOTH columns, so footer
    statistics prune for user-scoped AND time-scoped predicates — the
    layout Delta's OPTIMIZE ZORDER produces, built from first
    principles: rank-normalize each column to 16 bits (min/max from
    one tiny aggregate), interleave bits into a Morton key, range-
    partition + sort on the key.

    What Z-order buys — precisely: total bounding-box area is
    ~1/files in ANY sorted layout; the curve REALLOCATES it. 1-D ts
    clustering gives per-file extents (ts: 1/files, user: full) — a
    ts predicate reads ~1 file, a user predicate reads ALL of them.
    The Z-curve gives (~1/sqrt(files), ~1/sqrt(files)) — BOTH
    predicate families prune to a small fraction. The proof
    (tests/test_layout.py) measures exactly that: files a point
    predicate on each dimension must read, from the on-disk footer
    stats.
    """
    lo_u, hi_u, lo_t, hi_t = events.agg(
        F.min("user_id"),
        F.max("user_id"),
        F.min(F.col("ts").cast("long")),
        F.max(F.col("ts").cast("long")),
    ).collect()[0]
    if lo_u is None or lo_t is None:
        # empty input: min/max aggregate to NULL — write an empty (but
        # schema-bearing) directory instead of raising on None math
        events.write.mode("overwrite").parquet(out_dir)
        return
    span_u = max(1, hi_u - lo_u)
    span_t = max(1, hi_t - lo_t)
    nu = ((F.col("user_id") - lo_u) * 65535 / span_u).cast("long")
    nt = ((F.col("ts").cast("long") - lo_t) * 65535 / span_t).cast("long")
    z = _interleave_bits_expr(nu, nt)
    (
        events.withColumn("__z", z)
        .repartitionByRange(files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


# --- versioned snapshots (poor man's table format) ------------------------


_LATEST = "_LATEST"


def list_versions(table_dir: str) -> list[int]:
    """All version numbers with a COMPLETE snapshot directory present
    (committed or not — commit state lives in the pointer file)."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def latest_version(table_dir: str) -> int | None:
    """The COMMITTED latest version (pointer file), or None."""
    try:
        with open(os.path.join(table_dir, _LATEST)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def write_versioned(df: DataFrame, table_dir: str) -> int:
    """Append-only snapshot write with an atomic pointer commit — the
    poor man's table format (Delta/Iceberg snapshot isolation, minus
    the manifest machinery):

    * each write lands a complete immutable copy under ``v<n>/`` where
      ``n`` = max existing version dir + 1 (committed or not, so a
      crashed writer's orphan can never be clobbered);
    * the commit is one atomic rename of a temp pointer file onto
      ``_LATEST`` — readers following the pointer either see the old
      snapshot or the new one, never a half-written directory;
    * a crash BEFORE the pointer rename leaves an orphan ``v<n>/`` that
      readers ignore (the pointer still names the previous version) and
      ``vacuum_versions`` removes.

    Atomic-rename commit is sound on a POSIX fs / HDFS; on an object
    store this pointer is exactly what a real table format replaces
    with its transaction log. Returns the committed version number."""
    os.makedirs(table_dir, exist_ok=True)
    versions = list_versions(table_dir)
    v = (versions[-1] + 1) if versions else 1
    vdir = os.path.join(table_dir, f"v{v}")
    df.write.mode("overwrite").parquet(vdir)
    tmp = os.path.join(table_dir, f".{_LATEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(table_dir, _LATEST))  # atomic commit
    return v


def read_version(spark, table_dir: str, version: int | None = None) -> DataFrame:
    """Snapshot read: the committed latest (pointer) by default, or an
    explicit ``version`` for time travel. Reading never blocks on (or
    observes) an in-flight write — the pointer flips atomically."""
    v = latest_version(table_dir) if version is None else int(version)
    if v is None:
        raise FileNotFoundError(f"no committed version under {table_dir!r}")
    vdir = os.path.join(table_dir, f"v{v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} missing under {table_dir!r}")
    return spark.read.parquet(vdir)


#: Minimum age (seconds, by dir mtime) before an UNCOMMITTED version dir
#: is treated as a crashed-writer orphan rather than an in-flight write.
#: A dir newer than the pointer is indistinguishable from a write that
#: sits between its snapshot landing and its pointer commit — vacuuming
#: it immediately would let os.replace commit a pointer to a deleted
#: directory (the Delta VACUUM retention problem, solved the same way:
#: only reap orphans older than a retention threshold).
ORPHAN_RETENTION_SECONDS = 24 * 3600


def _tree_max_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (the dir itself, every
    sub-dir, every file). The top-level dir mtime alone is NOT a
    liveness signal: it is set at creation and refreshed only by
    direct-child churn, so a writer whose part files land via a
    sub-directory staging step (Spark's ``_temporary`` commit
    protocol) or that simply takes longer than the retention window
    between ``mkdir`` and pointer commit would look stale while still
    in flight. Any file the writer touches anywhere in the tree resets
    the clock. Raises OSError if the tree vanishes mid-walk (callers
    treat that as a race and skip)."""
    newest = os.path.getmtime(path)
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, name)))
            except OSError:
                continue  # entry vanished mid-walk; others still count
    return newest


def vacuum_versions(
    table_dir: str,
    keep: int = 1,
    orphan_retention_seconds: float = ORPHAN_RETENTION_SECONDS,
) -> list[int]:
    """Remove snapshot dirs except the committed latest ``keep``
    versions (and never the pointer's target, whatever ``keep`` says).

    Version dirs NEWER than the pointer are removed only when their
    mtime is older than ``orphan_retention_seconds``: an old
    uncommitted dir is a crashed writer's orphan, a fresh one may be an
    IN-FLIGHT ``write_versioned`` between snapshot write and pointer
    commit, and deleting it would break that writer's commit. The age
    signal is the NEWEST mtime over the whole dir tree (not the
    top-level dir's, which staging sub-dirs don't refresh), so an
    in-flight writer resets the clock with every file it lands;
    retention therefore only needs to exceed the longest plausible GAP
    between a writer's last touch and its pointer commit, not the whole
    snapshot write. Pass ``orphan_retention_seconds=0`` only when the
    caller can guarantee no concurrent writer (single-writer
    maintenance windows). Returns the removed version numbers."""
    import shutil
    import time

    committed = latest_version(table_dir)
    if committed is None:
        return []
    removed = []
    keep_set = set(
        v for v in list_versions(table_dir) if v <= committed
    )
    keep_set = set(sorted(keep_set)[-max(1, keep):]) | {committed}
    now = time.time()
    for v in list_versions(table_dir):
        if v in keep_set:
            continue
        vdir = os.path.join(table_dir, f"v{v}")
        if v > committed:
            try:
                age = now - _tree_max_mtime(vdir)
            except OSError:
                continue  # raced with a writer creating/committing it
            if age < orphan_retention_seconds:
                continue  # possibly in-flight — retention not reached
        shutil.rmtree(vdir)
        removed.append(v)
    return removed
