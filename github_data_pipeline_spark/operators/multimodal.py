"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted inside Arrow-batched ``mapInPandas``.

``decode_image`` degrades gracefully by capability: PIL when
importable, a real stdlib PNG decode (zlib + scanline unfilter) for
PNG payloads without PIL, and a deterministic fake for non-image
payloads — the fake is the oracle path (the synthetic corpus carries
no real images), so the Spark-side plumbing — binary column, batch
iteration, output schema, partition behavior — stays oracle-checked
while real PNG bytes actually decode in codec-less containers.

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
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def _unfilter_scanline(
    ftype: int, line: bytearray, prev: bytearray, bpp: int
) -> bytearray:
    """Undo one PNG scanline filter (types 0-4, RFC 2083 §6)."""
    if ftype == 0:  # None
        return line
    if ftype == 1:  # Sub
        for i in range(bpp, len(line)):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
        return line
    if ftype == 2:  # Up
        for i in range(len(line)):
            line[i] = (line[i] + prev[i]) & 0xFF
        return line
    if ftype == 3:  # Average
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        return line
    if ftype == 4:  # Paeth
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            line[i] = (line[i] + pred) & 0xFF
        return line
    raise ValueError(f"unsupported PNG filter type {ftype}")


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _decode_png_stdlib(payload: bytes) -> dict[str, Any]:
    """Real PNG decode with only the standard library (zlib): 8-bit,
    non-interlaced greyscale/RGB(+alpha), all five scanline filters.
    mean_pixel is the mean over the color samples (alpha excluded),
    matching the PIL path's convention."""
    import struct
    import zlib

    pos = len(_PNG_MAGIC)
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG shape (depth={depth}, "
                    f"color={color}, interlace={interlace})"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    prev = bytearray(stride)
    alpha = channels in (2, 4)
    color_n = channels - 1 if alpha else channels
    total = 0
    count = 0
    for y in range(height):
        off = y * (stride + 1)
        line = _unfilter_scanline(
            raw[off], bytearray(raw[off + 1 : off + 1 + stride]), prev, channels
        )
        if alpha:
            for i in range(0, stride, channels):
                total += sum(line[i : i + color_n])
        else:
            total += sum(line)
        count += width * color_n
        prev = line
    return {
        "n_bytes": len(payload),
        "width": int(width),
        "height": int(height),
        "mean_pixel": (total / count) if count else 0.0,
    }


def _decode_pil(payload: bytes) -> dict[str, Any]:  # pragma: no cover
    """Real decode through PIL (any format PIL knows); mean over RGB."""
    import io

    with Image.open(io.BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        data = rgb.tobytes()
        return {
            "n_bytes": len(payload),
            "width": int(rgb.width),
            "height": int(rgb.height),
            "mean_pixel": (sum(data) / len(data)) if data else 0.0,
        }


def decode_image(payload: bytes) -> dict[str, Any]:
    """Decode an image payload to (width, height, mean_pixel).

    Three branches, most-capable first:

    * a real codec (PIL) when importable — any format PIL knows;
    * a real stdlib decode when PIL is absent: zlib inflate + scanline
      unfilter for PNG, and a baseline-JFIF Huffman+IDCT decoder
      (operators/jpeg_stdlib.py — baseline sequential, 8-bit, 4:4:4)
      for JPEG — so real image data degrades gracefully in codec-less
      containers instead of raising, and BOTH container branches run
      against real encoded pixels in CI;
    * the deterministic fake for anything else (size-mod dimensions,
      mean of the first 64 'pixel' bytes) — the oracle path the
      registry queries pin, exercised by the synthetic corpus whose
      payloads are never real images.

    A payload that merely LOOKS like an image (magic bytes followed by
    truncated or corrupt data) must not kill the enclosing mapInPandas
    stage with an undocumented decode error — at 100 TB one hostile
    document would otherwise fail the job. EVERY real-decode branch is
    wrapped (the PIL branch too, not just the stdlib one — r8 ADVICE):
    a PIL failure falls through to the stdlib PNG parse, and any parse
    failure lands on the deterministic fake, the same degradation path
    every non-image payload takes.
    """
    payload = bytes(payload)
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        if _HAVE_PIL:
            try:
                return _decode_pil(payload)
            except Exception:
                pass  # corrupt data wearing PNG magic -> stdlib parse
        try:
            return _decode_png_stdlib(payload)
        except Exception:
            pass  # corrupt/truncated pseudo-PNG -> deterministic fake
    if payload[: len(_JPEG_MAGIC)] == _JPEG_MAGIC:
        if _HAVE_PIL:
            try:
                return _decode_pil(payload)
            except Exception:
                pass  # corrupt data wearing JPEG magic -> stdlib parse
        try:
            from .jpeg_stdlib import decode_baseline_jpeg

            return decode_baseline_jpeg(payload)
        except Exception:
            pass  # outside the baseline subset / corrupt -> fake
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
