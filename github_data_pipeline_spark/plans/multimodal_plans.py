"""Multimodal-column queries: binary payloads decoded via Arrow-batched
mapInPandas (operators/multimodal.py), feature rollups, frame sampling.

The corpus is ASCII, so byte arithmetic on the payload equals character
arithmetic on the text — which is how the DuckDB oracle reproduces the
Python decoder's deterministic fake features exactly, validating the
whole Arrow round-trip (schema, batching, row alignment), not just the
formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, extract_features
from ..sources.tables import load_table
from .core import REGISTRY

_add = REGISTRY.add

_N_CHARS = "octet_length(encode(text))"
_HEAD64_SUM = (
    "list_sum(list_transform(generate_series(1, least(64, length(text))), "
    "i -> ascii(substr(text, i, 1))))"
)


@_add(
    "multimodal_decode_features",
    f"""
    SELECT
      doc_id,
      CAST({_N_CHARS} AS BIGINT) AS n_bytes,
      CAST(16 + {_N_CHARS} % 17 AS INT) AS width,
      CAST(16 + {_N_CHARS} % 13 AS INT) AS height,
      CAST({_HEAD64_SUM} AS DOUBLE) / least(64, length(text)) AS mean_pixel
    FROM documents
    """,
    doc="The multimodal decode path end-to-end: binary payload column -> "
    "mapInPandas (Arrow batches) -> per-doc feature row. The decoder is "
    "a deterministic stub (operators/multimodal.py); the oracle "
    "recomputes its features in SQL, so a pass proves the Python/Arrow "
    "plumbing preserves schema, types and row alignment.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


@_add(
    "multimodal_meta_rollup",
    """
    SELECT
      source AS origin,
      CAST(COUNT(*) AS BIGINT) AS payloads,
      CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source
    """,
    doc="Typed-metadata rollup without touching payload bytes — column "
    "pruning keeps the scan to the small meta struct; the binary "
    "column is never read (check ReadSchema in .explain).",
    tags=("multimodal", "pruning"),
)
def multimodal_meta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return with_payload.groupBy(F.col("meta.origin").alias("origin")).agg(
        F.count(F.lit(1)).alias("payloads"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@_add(
    "multimodal_frame_sample",
    """
    SELECT
      doc_id,
      CAST(to_json(
        list_transform(generate_series(1, least(4, (length(text)+63) // 64)),
                       f -> CAST(ascii(substr(text, (f-1)*64 + 1, 1)) AS BIGINT))
      ) AS VARCHAR) AS frame_leads
    FROM documents
    """,
    doc="Frame sampling shape for video-like payloads: take the lead "
    "byte of up to 4 fixed-stride 64-byte 'frames' per payload. In "
    "production the lambda becomes a per-frame decode over "
    "mapInPandas; the stride/slice plumbing is identical. The lead-byte "
    "array is serialized to a JSON string so the driver's pandas "
    "canonicalizer (which cannot hash list cells) can compare it.",
    tags=("multimodal", "frames"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.least(F.lit(4), F.floor((F.length("text") + 63) / 64))
    frames = F.transform(
        F.sequence(F.lit(1), n_frames),
        lambda f: F.ascii(
            F.substring(F.col("text"), ((f - 1) * 64 + 1).cast("int"), 1)
        ).cast("long"),
    )
    return docs.select("doc_id", F.to_json(frames).alias("frame_leads"))
