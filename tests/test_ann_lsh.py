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


def test_adaptive_n_planes_boundaries():
    """Plane count doubles the bucket space exactly when the corpus
    crosses target * 2^p — strict inequality, integer-only."""
    from github_data_pipeline_spark.functions.lsh import (
        MAX_PLANES,
        adaptive_n_planes,
    )

    t = 2000
    assert adaptive_n_planes(0, t) == 0
    assert adaptive_n_planes(t, t) == 0        # boundary: not strictly greater
    assert adaptive_n_planes(t + 1, t) == 1
    assert adaptive_n_planes(2 * t, t) == 1
    assert adaptive_n_planes(2 * t + 1, t) == 2
    assert adaptive_n_planes(60000, t) == 5
    assert adaptive_n_planes(10**12, t) == MAX_PLANES  # capped


def test_bucket_col_zero_planes_is_constant(spark):
    from pyspark.sql import functions as F

    from github_data_pipeline_spark.functions.lsh import bucket_col

    df = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(4)],
        "vec_id long, embedding array<float>",
    ).select(bucket_col(F.col("embedding"), 0).alias("b"))
    assert {r.b for r in df.collect()} == {0}


def test_masked_bucket_matches_spark_at_five_planes(spark):
    """Cross-engine parity of the ACTIVE mask path: every oracle SF has
    n_planes == 0 (corpus <= NEARDUP_CELL_TARGET), so without this test
    a bug in duck_bucket_masked's bit weights or mask comparison would
    surface only on the first real corpus past the target."""
    import duckdb

    from pyspark.sql import functions as F

    from github_data_pipeline_spark.functions.lsh import (
        bucket_col,
        duck_bucket_masked,
    )

    vecs = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(64)])
        for i in range(40)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", bucket_col(F.col("embedding"), 5).alias("b")
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {v}::FLOAT[])" for i, v in ((i, list(map(float, v))) for i, v in vecs)
        )
        + ") t(vec_id, embedding)"
    )
    want = dict(
        con.execute(
            f"SELECT vec_id, {duck_bucket_masked('embeddings', '5')} FROM embeddings"
        ).fetchall()
    )
    assert got == want
    assert len(set(got.values())) > 1  # planes actually split the space


def test_multiprobe_recall_monotone(spark, sf_dir):
    """Widening the probe can only add candidates (nested sets), so
    recall@5 must be non-decreasing per query: ivf_p1 <= ivf_p2 <=
    ivf_p4 and lsh (Hamming-0) <= lsh_h1. Also pins the method row
    layout the oracle mirrors (6 methods x 8 queries)."""
    from github_data_pipeline_spark.plans import all_plans

    rows = all_plans()["ann_recall"].builder(spark, sf_dir).collect()
    by = {(r.method, r.query_id): r.recall_at_5 for r in rows}
    methods = {m for m, _ in by}
    assert methods == {"ivf", "ivf_p1", "ivf_p2", "ivf_p4", "lsh", "lsh_h1"}
    assert len(rows) == 6 * 8
    for qid in range(8):
        assert by[("ivf_p1", qid)] <= by[("ivf_p2", qid)] <= by[("ivf_p4", qid)]
        assert by[("lsh", qid)] <= by[("lsh_h1", qid)]
