"""Multimodal plumbing stages: resize (binary->binary) and audio
windowing (1->N flat-map) over Arrow batches (operators/multimodal.py).
The decode stage is pinned through its registry query; these two are
the remaining batch shapes a media pipeline needs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    audio_windows,
    resize_images,
)
from github_data_pipeline_spark.sources.tables import load_table, spread


def _payloads(spark, sf_dir):
    docs = spread(load_table(spark, sf_dir, "documents")).limit(200)
    return attach_payload(docs)


def test_resize_reduces_payload_and_dims(spark, sf_dir):
    src = _payloads(spark, sf_dir)
    out = resize_images(src, max_dim=16)
    rows = out.collect()
    assert len(rows) == src.count()
    for r in rows:
        assert len(r["payload"]) <= 16 * 16
        assert 1 <= r["width"] <= 16 and 1 <= r["height"] <= 16
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(src, 16).collect()}
    assert all(bytes(r["payload"]) == again[r["doc_id"]] for r in rows)


def test_audio_windows_count_and_coverage(spark):
    payload = bytes(range(256)) * 4  # 1024 bytes
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = audio_windows(df, window_bytes=256, hop_bytes=128).collect()
    # floor((1024-256)/128)+1 = 7 full windows
    assert len(rows) == 7
    assert [r["offset_bytes"] for r in sorted(rows, key=lambda r: r["window_index"])] == [
        0, 128, 256, 384, 512, 640, 768
    ]
    assert all(r["n_bytes"] == 256 for r in rows)
    assert all(r["rms"] == pytest.approx(rows[0]["rms"]) for r in rows)  # periodic


def test_audio_windows_short_payload_single_tail(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"")], "doc_id long, payload binary"
    )
    rows = audio_windows(df, window_bytes=256, hop_bytes=128).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[1]["n_bytes"] == 3 and by_doc[1]["window_index"] == 0
    assert 2 not in by_doc  # empty payload emits nothing


def test_stages_are_arrow_batched(spark, sf_dir):
    src = _payloads(spark, sf_dir)
    for df in (resize_images(src), audio_windows(src)):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan


def test_windows_fan_out_on_documents(spark, sf_dir):
    src = _payloads(spark, sf_dir)
    wins = audio_windows(src, window_bytes=64, hop_bytes=32)
    agg = wins.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(agg) > 0
    assert all(r["n"] >= 1 for r in agg)
