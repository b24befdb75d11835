"""Size-gated join hints.

A *forced* ``F.broadcast()`` hint bypasses Spark's size check
(``spark.sql.autoBroadcastJoinThreshold``): the planner trusts the
caller unconditionally, so hinting a table whose cardinality grows
with the corpus — candidate sets, per-doc size tables, vocabulary
statistics — is a 100-TB scale hazard. At every tested SF the table
is tiny and the hint is the right plan, but at 10^9+ documents the
same hint OOMs every executor instead of degrading to a keyed shuffle
join.

``broadcast_if_bounded`` makes the hint honest: the caller supplies a
*cheap upper bound* on the table's row count (a parquet footer count,
the exact count of an already-materialized candidate set — never a
job over unmaterialized corpus data) and the hint is applied only
under the bound. Over the bound the frame is returned un-hinted; all
call sites key their joins, so Catalyst plans a shuffled hash /
sort-merge join that scales, and AQE still converts it back to a
broadcast join at runtime if the actual size turns out small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Row bound under which a forced broadcast hint is considered safe for
# NARROW rows (a handful of fixed-width columns): ~tens of MB on the
# driver and per executor. Deliberately far above any tested SF (the
# gated tables hold  <= ~5k rows at sf0.1) and far below the 10^8+
# cardinalities a 100-TB corpus produces, so the gate flips strategy
# exactly where the design point demands it.
BROADCAST_MAX_ROWS = 2_000_000

# Tighter bound for rows carrying heavy payloads (shingle/token
# arrays, ~KBs per row): the same memory budget buys ~10x fewer rows.
BROADCAST_MAX_HEAVY_ROWS = 200_000


def broadcast_if_bounded(
    df: DataFrame, bound_rows: int, max_rows: int = BROADCAST_MAX_ROWS
) -> DataFrame:
    """Return ``F.broadcast(df)`` only when ``bound_rows`` (a cheap
    UPPER BOUND on df's cardinality, supplied by the caller) is at
    most ``max_rows``; otherwise return ``df`` un-hinted so the
    planner picks a scalable keyed join."""
    if bound_rows <= max_rows:
        return F.broadcast(df)
    return df


#: Sentinel row bound meaning "cardinality unknown": always over every
#: max_rows threshold, so broadcast_if_bounded leaves the frame
#: un-hinted — the conservative strategy when no cheap bound exists.
UNBOUNDED = 2**63


def parquet_row_bound(sf_dir: str, table: str) -> int:
    """``parquet_num_rows``, but a table whose parquet footprint cannot
    be read (unit tests monkeypatch ``load_table`` with in-memory
    frames and fake directories) yields :data:`UNBOUNDED` instead of
    raising — an unknown cardinality must disable the hint, never crash
    the query builder. ValueError covers pyarrow's ``ArrowInvalid``
    (a ValueError subclass raised for corrupt / non-parquet footers),
    which OSError alone would let crash the builder."""
    try:
        n = parquet_num_rows(sf_dir, table)
    except (OSError, ValueError):
        return UNBOUNDED
    # A directory that exists but contains zero part files scans to 0,
    # which is NOT evidence of a small table — it means the footprint
    # was never written (or is still being staged). Treat it as
    # unknown so the hint stays off.
    return n if n > 0 else UNBOUNDED


def parquet_num_rows(sf_dir: str, table: str) -> int:
    """Exact row count of a testdata parquet table from file footers —
    pyarrow metadata reads only, no Spark job, so it is safe to call
    inside a query builder. Handles both a single ``.parquet`` file
    and a directory of part files (the layout a cluster writes)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows
