"""Sequence packing — assemble tokenized documents into fixed-budget
training rows (the "pack to 4k/8k context" step between curation and
the trainer's data loader).

Packing is a bin-packing problem; the distributed form packs WITHIN
partitions (first-fit-decreasing per partition, the standard
practice — global bin packing is NP-hard and cross-partition moves buy
~nothing at corpus scale when every partition holds thousands of
docs). Token counts are computed JVM-side first, so the Python stage
sees only (doc_id, n_tokens) longs — document text never crosses the
Arrow boundary. Pack ids are (partition << 32) | local index: globally
unique without any coordination.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

PACK_SCHEMA = (
    "pack_id long, doc_ids array<long>, n_docs int, "
    "total_tokens long, oversize boolean"
)


def _pack_partition(pdfs: Iterator[pd.DataFrame], budget: int):
    """First-fit-decreasing over one partition's (pid, doc_id,
    n_tokens) rows; oversize docs (> budget alone) become flagged
    singleton packs instead of being silently dropped or truncated."""
    rows = pd.concat(list(pdfs), ignore_index=True) if pdfs else None
    if rows is None or rows.empty:
        yield pd.DataFrame(
            columns=["pack_id", "doc_ids", "n_docs", "total_tokens", "oversize"]
        )
        return
    pid = int(rows["pid"].iloc[0])
    base = pid << 32
    # deterministic: sort by count desc, id asc
    rows = rows.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    packs: list[dict] = []
    # (remaining, pack_index) heap would give best-fit; first-fit over a
    # plain list is the classic FFD and keeps behavior easy to reason
    # about. Partition sizes are bounded by the input partitioning, so
    # the O(docs * open_packs) scan stays local and small.
    open_packs: list[tuple[int, int]] = []  # (remaining, idx)
    for doc_id, n_tok in zip(rows["doc_id"], rows["n_tokens"]):
        n_tok = int(n_tok)
        if n_tok > budget:
            packs.append(
                {"doc_ids": [int(doc_id)], "total": n_tok, "oversize": True}
            )
            continue
        placed = False
        for i, (rem, idx) in enumerate(open_packs):
            if n_tok <= rem:
                packs[idx]["doc_ids"].append(int(doc_id))
                packs[idx]["total"] += n_tok
                open_packs[i] = (rem - n_tok, idx)
                placed = True
                break
        if not placed:
            packs.append(
                {"doc_ids": [int(doc_id)], "total": n_tok, "oversize": False}
            )
            open_packs.append((budget - n_tok, len(packs) - 1))
    yield pd.DataFrame(
        {
            "pack_id": [base + i for i in range(len(packs))],
            "doc_ids": [p["doc_ids"] for p in packs],
            "n_docs": [len(p["doc_ids"]) for p in packs],
            "total_tokens": [p["total"] for p in packs],
            "oversize": [p["oversize"] for p in packs],
        }
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    pid=None,
) -> DataFrame:
    """Pack docs into token-budget rows.

    Returns (pack_id, doc_ids, n_docs, total_tokens, oversize): every
    input doc appears in exactly one pack; no non-oversize pack
    exceeds ``budget`` tokens (tests/test_packing.py pins both).

    ``pid`` (optional Column): deterministic shard key. The default
    ``spark_partition_id()`` packs whatever partitioning the input
    arrives with — zero extra shuffle, the production shape — but the
    pack assignment then depends on that partitioning. A data-derived
    ``pid`` (e.g. ``pmod(doc_id, P)``) makes the whole packing a pure
    function of the data: same packs under ANY input partitioning,
    which is what the oracle-scored registry entry pins.
    """
    counted = docs.select(
        (F.spark_partition_id() if pid is None else pid).alias("pid"),
        F.col("doc_id"),
        T.token_count(text_col).cast("long").alias("n_tokens"),
    )
    return counted.groupBy("pid").applyInPandas(
        lambda pdf: next(_pack_partition(iter([pdf]), budget)),
        schema=PACK_SCHEMA,
    )
