"""GitHub timestamp handling.

The reference parses/formats ``%Y-%m-%dT%H:%M:%SZ`` UTC strings and
treats invalid values as null (reference ``src/retrieval/collectors.py:455-465``).
Spark's ``to_timestamp`` returns null on parse failure by default (non-ANSI
cast path), matching that contract; under ANSI mode we guard with
``try_to_timestamp``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GH_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def parse_gh_ts(c: Column | str) -> Column:
    """ISO-8601 Z-suffixed string -> TimestampType; invalid -> null."""
    col = F.col(c) if isinstance(c, str) else c
    return F.try_to_timestamp(col, F.lit(GH_TS_FORMAT))


def format_gh_ts(c: Column | str) -> Column:
    """TimestampType -> GitHub wire format (UTC, second granularity)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, GH_TS_FORMAT)


def max_doc_timestamp(*cols: Column | str) -> Column:
    """Greatest of several GitHub timestamp string columns.

    Mirrors the reference's incremental watermark computation
    (``_max_timestamp_from_docs``, collectors.py:468-477): the watermark
    is the max over rows of the greatest per-row candidate timestamp.
    Use as ``df.agg(F.max(max_doc_timestamp("updated_at", "closed_at",
    "created_at")))``.
    """
    parsed = [parse_gh_ts(c) for c in cols]
    return F.greatest(*parsed) if len(parsed) > 1 else parsed[0]
