"""Expression-library parity tests: canonical JSON + sha1 against the
reference's Python canonicalization (json.dumps sorted/compact then
hashlib.sha1 — schema.py:25-29), and GitHub timestamp round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.functions.hashing import (
    canonical_json,
    stable_hash_id,
    stable_hash_id_py,
)
from github_data_pipeline_spark.functions.timestamps import (
    format_gh_ts,
    parse_gh_ts,
)

ROWS = [
    ("o/r", 7, "open", None),
    ("o/r", 8, None, 'tricky "quotes" and\nnewlines'),
    ("ünïcode/répo", 9, "closed", "ascii-free: ✓"),
]
SCHEMA = "repo_name string, number int, state string, note string"
COLS = {"note": "note", "number": "number", "repo_name": "repo_name", "state": "state"}


def test_sha1_matches_hashlib_including_nulls_and_unicode(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).select(
        "number",
        canonical_json(COLS).alias("doc"),
        stable_hash_id(COLS).alias("h"),
        stable_hash_id(COLS, salt="s4lt").alias("h_salted"),
    )
    for row in df.collect():
        n = row["number"]
        src = next(r for r in ROWS if r[1] == n)
        doc = {
            "repo_name": src[0],
            "number": src[1],
            "state": src[2],
            "note": src[3],
        }
        assert row["h"] == stable_hash_id_py(doc)
        assert row["h_salted"] == stable_hash_id_py(doc, salt="s4lt")


def test_gh_timestamp_roundtrip_and_invalid(spark):
    df = spark.createDataFrame(
        [("2024-08-23T16:24:18Z",), ("not-a-date",), (None,)], "ts string"
    ).select(
        format_gh_ts(parse_gh_ts("ts")).alias("rt"),
        parse_gh_ts("ts").alias("parsed"),
    )
    rows = df.collect()
    assert rows[0]["rt"] == "2024-08-23T16:24:18Z"
    assert rows[1]["parsed"] is None  # invalid -> null, no exception
    assert rows[2]["parsed"] is None
