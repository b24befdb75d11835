"""Chunking invariants: full coverage of the input text, exact overlap
between consecutive windows, correct window count, and oracle parity
for the registry query (the cell-exact twin runs in the correctness
gate; here we pin the algebra on controlled inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from github_data_pipeline_spark.operators.chunking import (
    chunk_documents,
    n_chunks,
)


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _expected_chunks(text: str, chunk: int, overlap: int) -> list[str]:
    step = chunk - overlap
    n = 1 + max(0, (len(text) - chunk + step - 1) // step)
    return [text[i * step : i * step + chunk] for i in range(n)]


@pytest.mark.parametrize("chunk,overlap", [(8, 2), (16, 0), (512, 64), (5, 4)])
def test_chunks_match_python_reference(spark, chunk, overlap):
    texts = [
        "",
        "a",
        "x" * (chunk - 1),
        "y" * chunk,
        "z" * (chunk + 1),
        "".join(chr(97 + (i % 26)) for i in range(chunk * 3 + 7)),
    ]
    got = (
        chunk_documents(_mk(spark, texts), chunk_chars=chunk, overlap=overlap)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    want = []
    for i, t in enumerate(texts):
        for j, c in enumerate(_expected_chunks(t, chunk, overlap)):
            want.append((i, j, c))
    assert [(r.doc_id, r.chunk_idx, r.chunk_text) for r in got] == want


def test_every_char_covered_and_overlap_exact(spark):
    chunk, overlap = 12, 3
    step = chunk - overlap
    text = "".join(chr(33 + (i % 90)) for i in range(100))
    rows = (
        chunk_documents(_mk(spark, [text]), chunk_chars=chunk, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    # stitching chunk[i][:step] for all but the last, plus the last whole
    # chunk, reconstructs the original text exactly
    rebuilt = "".join(r.chunk_text[:step] for r in rows[:-1]) + rows[-1].chunk_text
    assert rebuilt == text
    # consecutive full-size chunks share exactly `overlap` characters
    for a, b in zip(rows, rows[1:]):
        if len(a.chunk_text) == chunk:
            assert a.chunk_text[-overlap:] == b.chunk_text[:overlap]


def test_n_chunks_formula(spark):
    df = spark.range(0, 60).select(
        F.col("id").alias("n"),
        n_chunks(F.col("id"), 10, 4).alias("k"),
    )
    for r in df.collect():
        step = 6
        want = 1 + max(0, (r.n - 10 + step - 1) // step)
        assert r.k == want, (r.n, r.k, want)


def test_empty_doc_yields_one_empty_chunk(spark):
    rows = chunk_documents(_mk(spark, [""]), 8, 2).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "" and rows[0].chunk_idx == 0


def test_overlap_must_be_smaller_than_chunk(spark):
    with pytest.raises(ValueError):
        chunk_documents(_mk(spark, ["abc"]), chunk_chars=4, overlap=4)

