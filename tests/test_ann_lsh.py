"""ANN LSH plan guards: non-vacuous bucket joins and deterministic
bucket assignment (the recall gate itself is oracle-checked in the
correctness gate)."""

from __future__ import annotations


def test_ann_lsh_topk_nonvacuous(spark, sf_dir):
    """Every query vector finds bucket-mates at the smallest SF (guards
    the vacuous-pass trap), and bucket assignment is deterministic."""
    from github_data_pipeline_spark.plans import all_plans

    q = all_plans()["ann_lsh_topk"].builder
    rows = q(spark, sf_dir).collect()
    assert len(rows) > 0
    by_query = {r.query_id for r in rows}
    assert len(by_query) == 8
    again = q(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
