"""Round-9 operators: salted group top-k, CDC apply, PR curve,
stream interval join — the invariants the DuckDB oracle cannot express
(full-table parity, label-definition drift, delete semantics)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from github_data_pipeline_spark.sources.tables import load_table


def test_salted_topk_equals_plain_window_over_all_groups(spark, sf_dir):
    """The registry entry slices output to custkey % 50 == 1 for oracle
    size; the rewrite must match the plain window for EVERY group."""
    from github_data_pipeline_spark.functions.hashing import md5_h32
    from github_data_pipeline_spark.plans.skew_plans import (
        TOPK_PER_GROUP,
        TOPK_SALT,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("g"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("o_orderkey"))
    plain = (
        o.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= TOPK_PER_GROUP)
        .select("g", "o_orderkey", "r")
    )
    salted = o.withColumn("salt", md5_h32(F.col("o_orderkey")) % TOPK_SALT)
    w1 = Window.partitionBy("g", "salt").orderBy(
        F.desc("v"), F.asc("o_orderkey")
    )
    two_phase = (
        salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= TOPK_PER_GROUP)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= TOPK_PER_GROUP)
        .select("g", "o_orderkey", "r")
    )
    assert two_phase.exceptAll(plain).count() == 0
    assert plain.exceptAll(two_phase).count() == 0


def test_cdc_apply_delete_and_insert_semantics(spark, sf_dir):
    """Deleted keys gone, inserted offset keys present with status N,
    updated keys carry status X and +100 cents, untouched keys
    unchanged — checked on the un-aggregated applied table rebuilt
    from the same change feed."""
    from github_data_pipeline_spark.plans.audit_plans import (
        CDC_DELETE_MOD,
        CDC_INSERT_OFFSET,
        CDC_UPDATE_MOD,
    )
    from github_data_pipeline_spark.plans import all_plans

    reg = all_plans()
    rows = {
        r["status"]: r
        for r in reg["cdc_apply_changes"].builder(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    n_upd = o.filter(F.col("o_orderkey") % CDC_UPDATE_MOD == 3).count()
    n_del = o.filter(F.col("o_orderkey") % CDC_DELETE_MOD == 7).count()
    assert n_upd > 0 and n_del > 0, "change feed vacuous on this fixture"
    total_rows = sum(r["rows_"] for r in rows.values())
    # base minus deletes plus inserts
    assert total_rows == n - n_del + n_upd
    assert rows["X"]["rows_"] == n_upd  # every update landed
    assert rows["N"]["rows_"] == n_upd  # every insert landed
    assert rows["N"]["min_key"] > CDC_INSERT_OFFSET  # inserts offset-keyed
    # no surviving key ≡ 7 (mod 10) below the insert offset
    for r in rows.values():
        if r["min_key"] < CDC_INSERT_OFFSET:
            assert r["min_key"] % CDC_DELETE_MOD != 7


def test_pr_curve_label_is_exactly_quality_pred(spark, sf_dir):
    """The PR curve's label column re-states quality_pred in fixed
    integers; if curation.quality_pred ever changes, this pins the
    drift."""
    from github_data_pipeline_spark.curation import quality_pred
    from github_data_pipeline_spark.functions import text as T

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = T.tokens("text")
    want = d.select(
        "doc_id", quality_pred(toks).cast("int").alias("label")
    )
    got = d.select(
        "doc_id",
        (
            F.size(toks).between(20, 400)
            & (T.stopword_hits(toks) * 10 >= F.size(toks))
        )
        .cast("int")
        .alias("label"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pr_curve_rows_monotone(spark, sf_dir):
    """tp and fp shrink (weakly) as the threshold rises; tp+fn and
    fp+tn are threshold-invariant (the label marginals)."""
    from github_data_pipeline_spark.plans import all_plans

    reg = all_plans()
    rows = sorted(
        reg["classifier_pr_curve"].builder(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert len(rows) == 5
    for a, b in zip(rows, rows[1:]):
        assert a["tp"] >= b["tp"] and a["fp"] >= b["fp"]
    marg = {(r["tp"] + r["fn"], r["fp"] + r["tn"]) for r in rows}
    assert len(marg) == 1
    assert rows[0]["tp"] > 0
