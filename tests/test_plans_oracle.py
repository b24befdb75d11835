"""Every registered query must exactly match its DuckDB oracle at
sf0.001 (the driver re-runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from github_data_pipeline_spark.plans import all_plans
from github_data_pipeline_spark.testing import diff_frames, run_oracle

REGISTRY = all_plans()
NAMES = [q.name for q in REGISTRY]


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.builder(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(s_rows) >= 0  # rows-only contract: must at least run
        return
    d_cols, d_rows = run_oracle(duck, q.oracle)
    msg = diff_frames(sdf.columns, s_rows, d_cols, d_rows)
    assert msg is None, f"{name}: {msg}"


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
