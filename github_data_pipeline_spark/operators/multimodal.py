"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted inside Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so ``decode_image`` is a
deterministic fake behind an import-try (the contract the brief asks
for): the Spark-side plumbing — binary column, batch iteration, output
schema, partition behavior — is real and oracle-checked; swapping in a
real decoder (PIL/libav) changes only the inner function.

Scale: mapInPandas streams Arrow record batches — payload bytes never
materialize on the driver, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary columns ride
Parquet as-is; pushdown still prunes on the metadata columns.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - codec not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, mean_pixel double"
)

_HEADER_BYTES = 64


def decode_image(payload: bytes) -> dict[str, Any]:
    """Decode an image payload to (width, height, mean_pixel).

    Real codec if available; otherwise a deterministic fake derived
    from the bytes themselves (size-mod dimensions, mean of the first
    64 'pixel' bytes) so tests and oracles are exact.
    """
    if _HAVE_PIL and payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError(
            "real image decoding is intentionally stubbed in this container"
        )
    n = len(payload)
    header = payload[:_HEADER_BYTES]
    return {
        "n_bytes": n,
        "width": 16 + (n % 17),
        "height": 16 + (n % 13),
        "mean_pixel": (sum(header) / len(header)) if header else 0.0,
    }


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload BINARY, meta STRUCT) — the canonical
    multimodal column shape: opaque bytes + typed, prunable metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column."""

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_pixel": [f["mean_pixel"] for f in feats],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize_images(docs_with_payload: DataFrame, max_dim: int = 16) -> DataFrame:
    """Binary->binary transform stage (the resize step of an image
    pipeline): payload re-encoded at reduced size, new dims attached.

    The fake "resize" is a deterministic byte downsample (every k-th
    byte so output <= max_dim^2 bytes) — a real implementation swaps
    the inner lambda for PIL thumbnail, schema and plan unchanged.
    Payloads stream through Arrow batches; nothing touches the driver.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = max_dim * max_dim
        for pdf in batches:
            out_payload, widths, heights = [], [], []
            for p in pdf["payload"]:
                p = bytes(p)
                step = max(1, -(-len(p) // budget))  # ceil division
                small = p[::step]
                d = decode_image(p)
                scale = max(d["width"], d["height"]) / max_dim
                widths.append(max(1, int(d["width"] / max(scale, 1))))
                heights.append(max(1, int(d["height"] / max(scale, 1))))
                out_payload.append(small)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "width": widths,
                    "height": heights,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA
    )


WINDOW_SCHEMA = (
    "doc_id long, window_index int, offset_bytes long, n_bytes long, rms double"
)


def audio_windows(
    docs_with_payload: DataFrame, window_bytes: int = 256, hop_bytes: int = 128
) -> DataFrame:
    """1->N flat-map stage (the frame-sampling step of an audio
    pipeline): each payload expands to overlapping windows with a
    per-window energy statistic.

    Output row count per doc is ``floor((n - window)/hop) + 1`` (one
    short-tail window for docs under window_bytes), so a batch of B
    payloads fans out to O(B * n/hop) rows — mapInPandas yields them
    incrementally per input batch, keeping executor memory bounded by
    one Arrow batch, never the full expansion.
    """

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "window_index": [], "offset_bytes": [],
                "n_bytes": [], "rms": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                offsets = (
                    range(0, max(len(p) - window_bytes, 0) + 1, hop_bytes)
                    if p
                    else []
                )
                for i, off in enumerate(offsets):
                    w = p[off : off + window_bytes]
                    rows["doc_id"].append(int(doc_id))
                    rows["window_index"].append(i)
                    rows["offset_bytes"].append(off)
                    rows["n_bytes"].append(len(w))
                    rows["rms"].append(
                        (sum(b * b for b in w) / len(w)) ** 0.5 if w else 0.0
                    )
            yield pd.DataFrame(rows)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        window_batches, schema=WINDOW_SCHEMA
    )
