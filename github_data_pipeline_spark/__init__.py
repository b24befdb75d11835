"""github_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch Spark implementation of the query and data-processing
capabilities of the reference ETL/analytics stack
``abijeet-dhillon/github_data_pipeline`` (GitHub repository telemetry:
issues / PRs / commits / contributors / blame, derived link datasets,
and nine validated analytics scenarios), re-expressed as idiomatic
Spark DataFrame / Spark SQL plans, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB pipeline needs.

Layout:
    session     — tuned SparkSession factory (AQE, UTC, Arrow)
    schemas     — typed StructType schemas for the 9 logical tables
    sources     — parquet/json table loaders, GitHub API client
    functions   — scalar/column expression library (refs, money, text,
                  vectors, hashing, timestamps)
    operators   — derived-dataset transforms (linkers, blame rollup,
                  incremental merge, dedup, similarity, multimodal)
    plans       — the analytics query registry (oracle-checkable)
    streaming   — Structured Streaming jobs over the events stream
"""

__version__ = "0.1.0"
