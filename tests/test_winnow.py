"""Winnowing fingerprints: the SIGMOD'03 guarantee, a pure-Python
reference implementation, and Spark parity against it.

The guarantee under test (Schleimer, Wilkerson, Aiken §3): if two
documents share a substring of length >= k + w - 1, their selected
fingerprint sets intersect. The Hypothesis property exercises the
ALGORITHM via the Python reference (fast, no JVM); a separate test
pins Spark's array-expression pipeline == the reference on mixed
fixtures, so the property transfers.
"""

from __future__ import annotations

import hashlib
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# lock the CANONICAL registry order before touching any plan module
# directly: a direct module import at collection time would register
# its queries ahead of the window-group modules and silently reorder
# the driver window (pinned by test_driver_window_invariants)
from github_data_pipeline_spark.plans import all_plans

all_plans()

from github_data_pipeline_spark.plans.winnow_plans import (  # noqa: E402
    WIN_GUARANTEE,
    WIN_K,
    WIN_W,
    _winnowed,
)


def _h32(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16)


def winnow_ref(text: str) -> set[int]:
    """Pure-Python reference of the plan's winnowing selection."""
    n = len(text) - WIN_K + 1
    if n <= 0:
        return set()
    h = [_h32(text[i : i + WIN_K]) for i in range(n)]
    windows = max(len(h) - WIN_W + 1, 1)
    return {min(h[j : j + WIN_W]) for j in range(windows)}


_ALPHA = string.ascii_lowercase + " "


@settings(max_examples=200, deadline=None)
@given(
    pre_a=st.text(_ALPHA, max_size=40),
    post_a=st.text(_ALPHA, max_size=40),
    pre_b=st.text(_ALPHA, max_size=40),
    post_b=st.text(_ALPHA, max_size=40),
    shared=st.text(_ALPHA, min_size=WIN_GUARANTEE, max_size=60),
)
def test_shared_substring_guarantee(pre_a, post_a, pre_b, post_b, shared):
    """Any shared substring of >= k + w - 1 chars leaves a common
    fingerprint, whatever surrounds it in either document."""
    a = pre_a + shared + post_a
    b = pre_b + shared + post_b
    assert winnow_ref(a) & winnow_ref(b)


@settings(max_examples=200, deadline=None)
@given(text=st.text(_ALPHA, max_size=120))
def test_selection_is_subset_and_covering(text):
    """Every fingerprint is a real gram hash, and every w-window of
    gram hashes is represented by some selected fingerprint."""
    fps = winnow_ref(text)
    n = len(text) - WIN_K + 1
    if n <= 0:
        assert fps == set()
        return
    h = [_h32(text[i : i + WIN_K]) for i in range(n)]
    assert fps <= set(h)
    for j in range(max(len(h) - WIN_W + 1, 1)):
        assert min(h[j : j + WIN_W]) in fps


@pytest.fixture(scope="module")
def winnow_df(spark, sf_dir):
    return {
        r["doc_id"]: (r["n_grams"], set(r["fps"]))
        for r in _winnowed(spark, sf_dir).collect()
    }


def test_spark_matches_reference(spark, sf_dir, winnow_df):
    """Spark's array-expression winnowing == the Python reference on
    real corpus docs (first 25 + the shortest), so the Hypothesis
    guarantees proved on the reference transfer to the plan."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id LIMIT 25"
    ).fetchall()
    assert rows
    for doc_id, text in rows:
        expect = winnow_ref(text)
        if not expect:
            assert doc_id not in winnow_df
            continue
        n_grams, fps = winnow_df[doc_id]
        assert n_grams == len(text) - WIN_K + 1
        assert fps == expect, f"doc {doc_id}"


def test_short_and_empty_docs(spark):
    """Docs shorter than one gram vanish; docs with fewer than w grams
    winnow their whole hash list (one window)."""
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.plans.winnow_plans import (
        _FPS_SPARK,
        _H_SPARK,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abcdefgh"), (4, "abcdefghij")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["fps"]
        for r in df.withColumn("h", F.expr(_H_SPARK))
        .filter(F.size("h") > 0)
        .select("doc_id", F.expr(_FPS_SPARK).alias("fps"))
        .collect()
    }
    assert set(out) == {3, 4}
    assert set(out[3]) == winnow_ref("abcdefgh")
    assert set(out[4]) == winnow_ref("abcdefghij")
