"""Context-window document chunking — split long documents into
fixed-width overlapping windows for training-sequence preparation.

The reference pipeline ships whole documents to its index (reference
``src/indexing/indexer.py`` writes one ES doc per blame file); a
training-data pipeline additionally needs the *chunking* step that
turns a long document into model-context-sized pieces whose overlap
preserves cross-boundary information. This is the upstream twin of
``operators/packing.py`` (which packs many *short* texts into one
sequence; chunking splits one *long* text into many).

Scale design (100 TB): the whole operator is map-side Catalyst —
``sequence`` + ``posexplode`` + ``substring`` — so it runs inside
whole-stage codegen with zero shuffles and streams through executors
partition-by-partition. Output size is input size x (1 + overlap/step),
a constant-factor expansion Catalyst accounts for in AQE planning.

Chunk arithmetic (all integer, engine-portable):

    step      = chunk_chars - overlap            (> 0 enforced)
    n_chunks  = 1 + max(0, len - chunk_chars + step - 1) // step
    start_i   = i * step          (0-based chunk index i)
    chunk_i   = text[start_i : start_i + chunk_chars]

The last chunk may be shorter than ``chunk_chars``; every character of
the input appears in at least one chunk, and consecutive full chunks
share exactly ``overlap`` characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_CHARS = 512
DEFAULT_OVERLAP = 64


def n_chunks(text_len: Column, chunk_chars: int, overlap: int) -> Column:
    """Number of windows covering ``text_len`` characters.

    Ceil-division via ``floor((extra + step - 1) / step)``. The Spark
    division is double-typed, but both operands are non-negative ints
    bounded by the JVM string-length limit (2^31) — far inside
    double's 2^53 exact-integer range — so the floor is exact and
    agrees with the DuckDB oracle's integer ``//`` for every
    representable input.
    """
    step = chunk_chars - overlap
    extra = F.greatest(text_len - F.lit(chunk_chars), F.lit(0))
    return F.lit(1) + F.floor((extra + F.lit(step - 1)) / F.lit(step)).cast(
        "long"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = DEFAULT_CHUNK_CHARS,
    overlap: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Returns ``(id_col, chunk_idx, chunk_text)`` with 0-based
    ``chunk_idx``. Empty/whitespace-only/NULL docs still yield one
    (possibly empty) chunk so no document silently disappears (NULL
    text coalesces to '' — otherwise sequence(1, NULL) explodes to
    zero rows) — dropping empties is the caller's curation decision,
    not the chunker's.
    """
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_chars ({chunk_chars})"
        )
    step = chunk_chars - overlap
    text = F.coalesce(F.col(text_col), F.lit(""))
    n = n_chunks(F.length(text), chunk_chars, overlap)
    exploded = docs.select(
        F.col(id_col),
        text.alias("_t"),
        F.posexplode(F.sequence(F.lit(1), n)).alias("chunk_idx", "_i"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.substring(
            F.col("_t"),
            (F.col("chunk_idx") * step + 1).cast("int"),
            chunk_chars,
        ).alias("chunk_text"),
    )
