"""Round-11 operator tests: PCA deflation, d=64 covariance pairs,
incremental LSH entry, and the packing/rotation additions' invariants
not already covered by their oracles."""

from __future__ import annotations

import math


def test_pca_deflation_components_are_orthogonal(spark, sf_dir):
    """Hotelling deflation's contract: each extracted component is
    orthogonal to the previous ones. The integer truncation makes this
    approximate in theory, but on real data the residual cosine is
    ~1e-5 — assert a loose 0.01 so the test pins the geometry, not the
    noise floor. (Eigenvalue ORDER is deliberately not asserted: the
    infinity-norm estimate after 5 iterations is not converged on a
    near-flat random spectrum, and the oracle already pins the exact
    recurrence values.)"""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.similarity_plans import (
        PCA_DIMS,
        PCA_TOPK,
    )

    rows = all_plans()["pca_topk_deflation"].builder(spark, sf_dir).collect()
    assert len(rows) == PCA_TOPK * PCA_DIMS
    comps: dict[int, list[int]] = {}
    for r in rows:
        comps.setdefault(r["component"], [0] * PCA_DIMS)[r["dim"]] = r[
            "eigvec_fp"
        ]
    for a in range(PCA_TOPK):
        for b in range(a + 1, PCA_TOPK):
            va, vb = comps[a], comps[b]
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            assert abs(dot / (na * nb)) < 0.01, (a, b, dot / (na * nb))


def test_pca_deflation_first_component_matches_parent_entry(spark, sf_dir):
    """Component 0 of the deflation entry must be BIT-identical to the
    single-component recurrence at the deflation iteration count —
    same recurrence, same fixed-point staging, no drift between the
    two renderings."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.similarity_plans import (
        PCA_DIMS,
        PCA_TOPK_ITERS,
        _pca_frame,
    )

    reg = all_plans()
    # the flagship entry keeps T=5; the deflation entry runs T=3 per
    # component, so compare against the single-component recurrence at
    # the SAME iteration count
    single = {
        r["dim"]: (r["eigvec_fp"], r["lambda_fp12"])
        for r in _pca_frame(
            spark, sf_dir, PCA_DIMS, iters=PCA_TOPK_ITERS
        ).collect()
    }
    topk = {
        r["dim"]: (r["eigvec_fp"], r["lambda_fp12"])
        for r in reg["pca_topk_deflation"].builder(spark, sf_dir).collect()
        if r["component"] == 0
    }
    assert single == topk


def test_covariance_pairs_runs_at_full_fixture_dimension(spark, sf_dir):
    """The keyed pairs entry must cover the fixture's true d=64 —
    2,080 upper-triangle rows — not the d=8 report slice (the one-row
    form keeps d=8; its doc names d ~ 64 as where its O(d^2)-column
    width stops being the right shape)."""
    from github_data_pipeline_spark.plans import all_plans
    from github_data_pipeline_spark.plans.similarity_plans import (
        COV_DIMS_FULL,
    )

    assert COV_DIMS_FULL == 64
    n = all_plans()["embedding_covariance_pairs"].builder(
        spark, sf_dir
    ).count()
    assert n == COV_DIMS_FULL * (COV_DIMS_FULL + 1) // 2


def test_lsh_incremental_entry_has_both_lanes(spark, sf_dir):
    """The incremental==full proof is vacuous unless BOTH lanes emit:
    prior (even-even) pairs and incremental (touching-odd) pairs."""
    from github_data_pipeline_spark.plans import all_plans

    rows = all_plans()["lsh_incremental_index"].builder(
        spark, sf_dir
    ).collect()
    flags = {r["from_increment"] for r in rows}
    assert flags == {0, 1}, flags
    for r in rows:
        touches_odd = r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1
        assert touches_odd == (r["from_increment"] == 1)


def test_percentile_cont_integer_spec_matches_native(spark, sf_dir):
    """The exact-integer PERCENTILE_CONT derivation must agree with a
    native floating-point quantile_cont to within float noise — guards
    the rank/remainder arithmetic against an off-by-one in the spec
    itself (cross-engine equality alone would not catch a shared
    mis-derivation)."""
    import duckdb

    from github_data_pipeline_spark.plans import all_plans

    rows = all_plans()["doc_length_percentile_cont"].builder(
        spark, sf_dir
    ).collect()
    mine = {(r["source"], r["q"]): r["pcont_x100"] for r in rows}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    native = con.execute(
        """
        SELECT source, 50 AS q, quantile_cont(n_chars, 0.50)
        FROM documents GROUP BY source
        UNION ALL SELECT source, 90, quantile_cont(n_chars, 0.90)
        FROM documents GROUP BY source
        UNION ALL SELECT source, 99, quantile_cont(n_chars, 0.99)
        FROM documents GROUP BY source
        """
    ).fetchall()
    assert len(native) == len(mine)
    for s_, q_, v in native:
        assert abs(mine[(s_, q_)] - 100 * v) < 1e-6, (s_, q_)
