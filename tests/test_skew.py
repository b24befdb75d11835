"""Salted join: result-equivalence with the plain join, salt spreading,
and guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.skew import (
    SALT_COL,
    key_frequencies,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + a long tail — the shape that kills one reducer
    rows = [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)]
    big = spark.createDataFrame(rows, "k int, payload int")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "cold3"), (999, "unmatched")],
        "k int, label string",
    )
    return big, small


def test_salted_inner_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(big, small, "k").groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_preserves_unmatched_big_rows(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", how="left")
    assert salted.count() == plain.count() == 1000
    assert (
        salted.filter(F.col("label").isNull()).count()
        == plain.filter(F.col("label").isNull()).count()
    )


def test_salt_actually_spreads_hot_key(spark, skewed):
    big, _ = skewed
    salted = big.withColumn(SALT_COL, (F.rand(42) * 16).cast("int"))
    buckets = (
        salted.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    )
    assert buckets > 8  # hot key fans out over most of the 16 buckets


def test_right_join_rejected(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="right")


def test_key_frequencies_census(spark, skewed):
    big, _ = skewed
    top = key_frequencies(big, "k", top=3).collect()
    assert (top[0]["k"], top[0]["rows"]) == (1, 900)
    assert top[1]["rows"] == 1
