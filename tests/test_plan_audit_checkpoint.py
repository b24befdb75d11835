"""The plan audit must see BEHIND localCheckpoint boundaries.

A checkpoint truncates lineage, so a plain explain of the final frame
starts at a checkpoint-RDD scan — any Python stage upstream of the
checkpoint is structurally invisible (the r10 blind spot: the audited
row for token_heavy_hitters showed no Python stage at all). The audit
now records every pre-checkpoint plan while the builder runs and folds
it into the row; these tests pin both directions of the guarantee.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.plan_audit import audit_query  # noqa: E402


def test_smuggled_python_udf_behind_checkpoint_fails_audit(spark, sf_dir):
    """A row-at-a-time Python UDF hidden upstream of a localCheckpoint
    must still fail the audit — the exact hole the pre-checkpoint
    capture exists to close."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    poison = udf(lambda x: x + 1, "long")

    def builder(spark, sf_dir):
        df = spark.range(10).select(poison("id").alias("v")).localCheckpoint()
        return df.groupBy().agg(F.sum("v").alias("s"))

    a = audit_query(spark, "smuggle_test", builder, sf_dir)
    assert any("BatchEvalPython" in h for h in a.hazards), a.hazards
    assert "BatchEvalPython" in a.python_stages


def test_allowlisted_stage_behind_checkpoint_is_visible_not_hazard(
    spark, sf_dir
):
    """token_heavy_hitters' Misra-Gries MapInPandas sits before its
    checkpoint; the audit must now SHOW it in the row (it was invisible
    in r10) while the allowlist keeps it from being a hazard."""
    from github_data_pipeline_spark.plans import all_plans

    q = all_plans()["token_heavy_hitters"]
    a = audit_query(spark, q.name, q.builder, sf_dir)
    assert "MapInPandas" in a.python_stages
    assert a.hazards == []
    assert any("pre-checkpoint" in n for n in a.notes)


def test_unlisted_arrow_stage_behind_checkpoint_fails_audit(spark, sf_dir):
    """An Arrow stage that is NOT on the allowlist must fail even when
    hidden behind a checkpoint (only BY-DESIGN Python stages pass)."""
    def builder(spark, sf_dir):
        import pandas as pd

        def ident(it):
            for pdf in it:
                yield pdf

        df = (
            spark.range(10)
            .mapInPandas(ident, schema="id long")
            .localCheckpoint()
        )
        return df.groupBy().count()

    a = audit_query(spark, "smuggle_arrow_test", builder, sf_dir)
    assert any("outside the allowlist" in h for h in a.hazards), a.hazards
