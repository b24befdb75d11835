"""The curation gates are stateless map-side filters, so the SAME code
runs under Structured Streaming: stream the documents table, apply
clean/language/quality, and the drained result must equal the batch
stages exactly."""

from __future__ import annotations

from github_data_pipeline_spark.curation import (
    clean_stage,
    language_stage,
    quality_stage,
    repetition_stage,
)
from github_data_pipeline_spark.sources.tables import load_table
from github_data_pipeline_spark.streaming.jobs import run_available_now


def test_streamed_gates_equal_batch(spark, sf_dir):
    batch_docs = load_table(spark, sf_dir, "documents")
    schema = batch_docs.schema
    stream_docs = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/documents.parque*"
    )

    def gates(df):
        return repetition_stage(
            quality_stage(language_stage(clean_stage(df)))
        ).select(
            "doc_id"
        )

    got = {
        r["doc_id"]
        for r in run_available_now(
            gates(stream_docs), "cur_t", output_mode="append"
        )
    }
    want = {r["doc_id"] for r in gates(batch_docs).collect()}
    assert got == want and len(want) > 0
