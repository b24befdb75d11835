"""Sink layer: partitioned writes, keyed upsert (no dup on re-ingest),
bulk accounting (reference client.py:54-102, indexer batch semantics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from github_data_pipeline_spark.functions.hashing import key_issue
from github_data_pipeline_spark.sources.sinks import (
    bulk_index,
    write_table,
    write_upsert,
)

SCHEMA = "repo_name string, number int, state string"


def test_partitioned_write_and_prune(spark, tmp_path):
    df = spark.createDataFrame(
        [("o/a", 1, "open"), ("o/b", 2, "open")], SCHEMA
    )
    path = str(tmp_path / "issues")
    write_table(df, path)
    assert os.path.isdir(os.path.join(path, "repo_name=o%2Fa"))
    back = spark.read.parquet(path).filter(F.col("repo_name") == "o/a")
    assert back.count() == 1


def test_upsert_idempotent_reingest(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [("o/a", 1, "open"), ("o/a", 2, "open")], SCHEMA
    )
    write_upsert(spark, v1, path, ["repo_name", "number"])
    # re-ingest same + one update + one new
    v2 = spark.createDataFrame(
        [("o/a", 2, "closed"), ("o/a", 3, "open")], SCHEMA
    )
    write_upsert(spark, v2, path, ["repo_name", "number"])
    got = {
        (r["number"]): r["state"] for r in spark.read.parquet(path).collect()
    }
    assert got == {1: "open", 2: "closed", 3: "open"}
    # third identical ingest: still no duplicates
    write_upsert(spark, v2, path, ["repo_name", "number"])
    assert spark.read.parquet(path).count() == 3


def test_bulk_index_accounting(spark):
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(7)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    batches = []

    def send(batch):
        batches.append(len(batch))
        # fail one doc in the first batch
        return len(batch) - (1 if len(batches) == 1 else 0)

    ok, fail = bulk_index(df, "_key", send, batch_size=3)
    assert batches == [3, 3, 1]
    assert (ok, fail) == (6, 1)


def test_bulk_index_distributed_parity(spark, tmp_path):
    """The executor-side transport (distributed=True) must batch each
    partition independently on its own worker and fold back EXACTLY
    the accounting the driver path produces for the same documents and
    the same deterministic failure rule."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(23)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))

    # deterministic rule both transports see: issue numbers ending in 2
    # fail to index
    def n_ok(batch):
        return sum(0 if _id.rstrip()[-1] == "2" else 1 for _id, _ in batch)

    ok_d, fail_d = bulk_index(df, "_key", n_ok, batch_size=4)
    assert (ok_d, fail_d) == (20, 3)  # numbers 2, 12, 22 fail

    # the mock transport records every batch as a file so the test can
    # observe executor-side behavior from the driver
    spool = tmp_path / "batches"
    spool.mkdir()

    def send(batch):
        import os as _os
        import uuid as _uuid

        p = spool / f"{_os.getpid()}-{_uuid.uuid4().hex}.txt"
        p.write_text("\n".join(_id for _id, _doc in batch))
        return n_ok(batch)

    got = bulk_index(
        df.repartition(4), "_key", send, batch_size=4, distributed=True
    )
    assert got == (ok_d, fail_d)

    files = list(spool.iterdir())
    batches = [f.read_text().splitlines() for f in files]
    # per-partition batching: no batch overflows, every doc sent
    # exactly once, and 4 partitions of 23 rows cannot fit in the
    # 6 batches a single stream would use
    assert all(len(b) <= 4 for b in batches)
    sent = [i for b in batches for i in b]
    assert len(sent) == 23 and len(set(sent)) == 23
    assert len(batches) > 6


def test_bulk_index_retries_transport_errors_with_backoff(spark):
    """A transport EXCEPTION is retried with exponential backoff; once
    it clears, the batch's accounting is as if it never failed."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(7)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    attempts: dict[int, int] = {}
    sleeps: list[float] = []
    batch_no = [0]

    def flaky(batch):
        i = batch_no[0]
        attempts[i] = attempts.get(i, 0) + 1
        if attempts[i] <= 2:  # first two attempts of every batch die
            raise ConnectionError("transport down")
        batch_no[0] += 1
        return len(batch)

    ok, fail = bulk_index(
        df, "_key", flaky, batch_size=3, backoff_s=0.25, sleep=sleeps.append
    )
    assert (ok, fail) == (7, 0)
    assert all(n == 3 for n in attempts.values())  # 2 failures + 1 ok
    # exponential: 0.25, 0.5 per batch, three batches (3+3+1 docs)
    assert sleeps == [0.25, 0.5] * 3


def test_bulk_index_terminal_transport_failure_accounts_not_raises(spark):
    """A batch that still raises after max_retries is counted as fully
    failed — one dead shard must not kill the stage."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(5)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    calls = []

    def dead(batch):
        calls.append(len(batch))
        raise ConnectionError("still down")

    ok, fail = bulk_index(
        df, "_key", dead, batch_size=5, max_retries=2, sleep=lambda s: None
    )
    assert (ok, fail) == (0, 5)
    assert len(calls) == 3  # initial + 2 retries, then give up


def test_bulk_index_doc_rejections_never_retried(spark):
    """send_batch returning n < len(batch) is per-document rejection —
    terminal by contract; retrying would double-index the accepted
    documents."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(4)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    calls = []

    def rejecting(batch):
        calls.append(len(batch))
        return len(batch) - 1

    ok, fail = bulk_index(df, "_key", rejecting, batch_size=4, sleep=lambda s: None)
    assert (ok, fail) == (3, 1)
    assert calls == [4]  # exactly one attempt


def test_bulk_index_distributed_retries_on_executors(spark, tmp_path):
    """The executor-side transport applies the same retry policy: a
    transport that dies once per distinct batch (shared marker files
    make the flakiness deterministic across worker processes) must
    still fold exact accounting."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(23)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    markers = tmp_path / "markers"
    markers.mkdir()

    def flaky(batch):
        import hashlib as _hl

        sig = _hl.md5("|".join(_id for _id, _ in batch).encode()).hexdigest()
        marker = markers / sig
        if not marker.exists():
            marker.write_text("seen")
            raise ConnectionError("first attempt for this batch dies")
        return len(batch)

    ok, fail = bulk_index(
        df.repartition(4),
        "_key",
        flaky,
        batch_size=4,
        distributed=True,
        backoff_s=0.0,
        sleep=lambda s: None,
    )
    assert (ok, fail) == (23, 0)
    assert len(list(markers.iterdir())) >= 6  # every batch failed once


def test_stable_ids_deterministic(spark):
    df = spark.createDataFrame([("o/a", 7, "open")], SCHEMA)
    k1 = df.select(key_issue("repo_name", "number").alias("k")).collect()[0]["k"]
    assert k1 == "o/a#issue#7"


def test_ensure_table_create_then_append(spark):
    import uuid

    name = f"t_{uuid.uuid4().hex[:8]}"
    from github_data_pipeline_spark.sources.sinks import ensure_table

    df1 = spark.createDataFrame([("o/a", 1, "open")], SCHEMA)
    ensure_table(spark, df1, name)
    assert spark.table(name).count() == 1
    ensure_table(spark, spark.createDataFrame([("o/a", 2, "open")], SCHEMA), name)
    assert spark.table(name).count() == 2
    spark.sql(f"DROP TABLE {name}")


def test_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    """Dynamic partition overwrite: merging repo B's fresh rows must not
    rewrite repo A's partition files."""
    import glob as _glob
    import os as _os

    path = str(tmp_path / "multi")
    base = spark.createDataFrame(
        [("o/a", 1, "open"), ("o/b", 2, "open")], SCHEMA
    )
    write_upsert(spark, base, path, ["repo_name", "number"])
    a_files_before = sorted(_glob.glob(f"{path}/repo_name=o%2Fa/*.parquet"))
    mtimes_before = [_os.path.getmtime(f) for f in a_files_before]

    fresh_b = spark.createDataFrame(
        [("o/b", 2, "closed"), ("o/b", 3, "open")], SCHEMA
    )
    write_upsert(spark, fresh_b, path, ["repo_name", "number"])

    a_files_after = sorted(_glob.glob(f"{path}/repo_name=o%2Fa/*.parquet"))
    assert a_files_after == a_files_before
    assert [_os.path.getmtime(f) for f in a_files_after] == mtimes_before
    got = {
        (r["repo_name"], r["number"]): r["state"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("o/a", 1): "open",
        ("o/b", 2): "closed",
        ("o/b", 3): "open",
    }


def test_bulk_index_dry_run_counts_without_sending(spark):
    """--dry-run twin (reference indexer.py:158-160): count docs that
    would index; the sink callable must never fire."""
    df = spark.createDataFrame(
        [("o/a", n, "open") for n in range(5)], SCHEMA
    ).withColumn("_key", key_issue("repo_name", "number"))
    calls = []
    ok, fail = bulk_index(df, "_key", lambda b: calls.append(b) or len(b),
                          batch_size=2, dry_run=True)
    assert (ok, fail) == (5, 0)
    assert calls == []


def test_ensure_table_index_prefix_namespaces(spark):
    """index_prefix twin (reference indexer.py:128-129): the same
    logical table lands under two independent namespaces."""
    import uuid

    from github_data_pipeline_spark.sources.sinks import ensure_table

    base = f"t_{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame([("o/a", 1, "open")], SCHEMA)
    ensure_table(spark, df, base, index_prefix="dev_")
    ensure_table(spark, df, base, index_prefix="prod_")
    ensure_table(spark, df, base, index_prefix="dev_")  # append, not create
    assert spark.table(f"dev_{base}").count() == 2
    assert spark.table(f"prod_{base}").count() == 1
    assert not spark.catalog.tableExists(base)
    spark.sql(f"DROP TABLE dev_{base}")
    spark.sql(f"DROP TABLE prod_{base}")
