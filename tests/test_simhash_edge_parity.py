"""SimHash engine parity on zero-token documents.

The synthetic testdata's minimum text length is ~44 chars, so the
driver gate never exercises empty/whitespace-only text. This test
builds a corpus that does (NULL, '', '   ', single-token and normal
docs) and pins that Spark and the DuckDB oracle drop zero-token docs
identically: without the size(tokens)>0 guard Spark would emit
simhash=0 for a whitespace-only doc while DuckDB (pre-list_filter)
hashed the '' token — a different signature, breaking parity on any
real corpus containing such docs.
"""

from __future__ import annotations

import duckdb
import pytest

from github_data_pipeline_spark.plans import all_plans
from github_data_pipeline_spark.testing import diff_frames, run_oracle

REGISTRY = all_plans()

EDGE_DOCS = [
    # near-identical pair -> simhash band-mates, so output is non-empty
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again!"),
    (3, None),  # NULL text
    (4, ""),  # empty
    (5, "   \t  \n "),  # whitespace-only
    (6, "solo"),  # single token
    (7, "an entirely different document about spark catalyst plans"),
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("simhash_edge")
    spark.createDataFrame(EDGE_DOCS, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_simhash_zero_token_parity(spark, edge_sf_dir):
    q = REGISTRY["simhash_hamming_pairs"]
    sdf = q.builder(spark, edge_sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_sf_dir}/documents.parquet/*.parquet'"
    )
    d_cols, d_rows = run_oracle(con, q.oracle)
    con.close()

    msg = diff_frames(sdf.columns, s_rows, d_cols, d_rows)
    assert msg is None, msg
    # the near-identical pair must survive (non-vacuous)...
    assert any(r[0] == 1 and r[1] == 2 for r in s_rows)
    # ...and no zero-token doc may appear on either side of any pair
    flat = {r[0] for r in s_rows} | {r[1] for r in s_rows}
    assert flat.isdisjoint({3, 4, 5})
