"""int8 embedding quantization (functions/vectors.py): error bounds,
cosine preservation, and the JVM-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from github_data_pipeline_spark.functions import vectors as V
from github_data_pipeline_spark.sources.tables import load_table


def test_quantization_roundtrip_error_bounded(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", "embedding", V.quantize_int8("embedding").alias("qv"))
    deq = q.select(
        "vec_id",
        "embedding",
        V.dequantize_int8("qv").alias("approx"),
        F.col("qv.scale").alias("scale"),
    )
    # max elementwise error <= scale/2 (round-to-nearest)
    err = deq.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "embedding", "approx",
                    lambda a, b: F.abs(a.cast("double") - b) / F.col("scale"),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("worst_half_steps")
    ).collect()[0]["worst_half_steps"]
    assert err <= 0.5 + 1e-9


def test_quantized_cosine_close(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(200)
    q = e.select("vec_id", "embedding", V.quantize_int8("embedding").alias("qv"))
    both = q.select(
        V.cosine(F.col("embedding"), V.dequantize_int8("qv")).alias("self_cos")
    )
    worst = both.agg(F.min("self_cos").alias("m")).collect()[0]["m"]
    # int8 keeps a vector within ~1e-3 cosine of itself
    assert worst > 0.999


def test_quantization_jvm_only(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    df = e.select(V.quantize_int8("embedding").alias("qv"))
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()


def test_zero_vector_safe(spark):
    df = spark.range(1).select(
        F.array(F.lit(0.0), F.lit(0.0)).alias("v")
    ).select(V.quantize_int8("v").alias("qv"))
    row = df.collect()[0]["qv"]
    assert row["scale"] == 1.0 and list(row["q"]) == [0, 0]
