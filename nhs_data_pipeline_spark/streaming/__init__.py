"""Structured Streaming mirrors of the batch engine."""

from nhs_data_pipeline_spark.streaming.pipeline import (  # noqa: F401
    dedup_stream,
    dedup_stream_against_store,
    enrich_stream,
    interval_join_streams,
    near_dedup_stream_against_store,
    run_stream_to_memory,
    stream_files,
    windowed_rollup,
)
