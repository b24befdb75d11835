"""Shared helpers for oracle-diff testing (used by tests/ and tools/).

Comparison is strictly cell-exact: doubles must match bit-for-bit,
timestamps to the microsecond. This is deliberately stricter than the
driver's order-insensitive value hash — if we pass here, we pass there.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

DUCKDB_VIEW_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in DUCKDB_VIEW_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon_cell(v) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return repr(v)


def canon_rows(cols: Sequence[str], rows: Sequence[Sequence]) -> tuple[list, list]:
    """Sort columns by name (driver contract) and rows canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(row[i]) for i in order) for row in rows]
    return sorted(cols), sorted(out)


def diff_frames(
    s_cols, s_rows, d_cols, d_rows
) -> str | None:
    """None if identical, else a human-readable first-difference message."""
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    if sc != dc:
        return f"columns differ: spark={sc} oracle={dc}"
    if len(sr) != len(dr):
        return f"row count differs: spark={len(sr)} oracle={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return f"first diff at sorted-row {i}:\n  spark={a}\n  oracle={b}"
    return None


def run_oracle(con, sql: str) -> tuple[list, list]:
    res = con.sql(sql)
    return [d[0] for d in res.description], res.fetchall()
