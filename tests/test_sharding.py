"""Reproducible shuffle-sharding: determinism under repartitioning,
exactly-once shard membership, sorted file layout, manifest truth."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators import sharding as sh
from github_data_pipeline_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_assignment_deterministic_under_partitioning(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {
        r.doc_id: (r.shard, r.order_key)
        for r in sh.assign_shards(docs, 8, seed=7).collect()
    }
    b = {
        r.doc_id: (r.shard, r.order_key)
        for r in sh.assign_shards(
            docs.repartition(13).sortWithinPartitions("text"), 8, seed=7
        ).collect()
    }
    assert a == b
    # a different seed is a different permutation
    c = {
        r.doc_id: (r.shard, r.order_key)
        for r in sh.assign_shards(docs, 8, seed=8).collect()
    }
    assert a != c


def test_shards_cover_corpus_and_balance(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    assigned = sh.assign_shards(docs, 8, seed=42)
    n = docs.count()
    per = dict(
        assigned.groupBy("shard").count().rdd.map(tuple).collect()
    )
    assert sum(per.values()) == n
    assert len(per) == 8  # every shard nonempty at 500 docs
    assert max(per.values()) < 3 * n / 8  # no gross md5 imbalance


def test_write_shards_layout_and_order(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "shards")
    sh.write_shards(docs, out, n_shards=4, seed=1)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0", "1", "2", "3"]
    seen = []
    for d in dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1  # one task wrote the whole shard
        t = pq.read_table(files[0]).to_pydict()
        keys = t["order_key"]
        assert keys == sorted(keys)  # intra-shard shuffle order on disk
        seen.extend(t["doc_id"])
    # exactly-once membership across shards
    assert sorted(seen) == [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]


def test_manifest_matches_written_shards(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    out = str(tmp_path / "shards")
    sh.write_shards(docs, out, n_shards=4, seed=1)
    manifest = {
        r.shard: r
        for r in sh.shard_manifest(sh.assign_shards(docs, 4, seed=1)).collect()
    }
    back = spark.read.parquet(out)
    got = {
        r.shard: r
        for r in back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.min("order_key").alias("first_key"),
            F.max("order_key").alias("last_key"),
        )
        .collect()
    }
    assert set(got) == set(manifest)
    for s, m in manifest.items():
        assert (got[s].docs, got[s].first_key, got[s].last_key) == (
            m.docs,
            m.first_key,
            m.last_key,
        )
