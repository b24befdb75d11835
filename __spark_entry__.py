"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
oracle for each (omitted only for genuinely non-SQL-expressible ops).
All real logic lives in ``github_data_pipeline_spark/plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from github_data_pipeline_spark.plans import all_plans
from github_data_pipeline_spark.session import tune_session

FLAGSHIP = "revenue_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    registry = all_plans()
    return registry[FLAGSHIP].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_plans().queries()


def oracle_sql() -> dict[str, str]:
    return all_plans().oracle_sql()
