"""Structured Streaming mirror: the streaming rollup over a file source
equals the batch rollup over the same data."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from nhs_data_pipeline_spark.streaming import (
    run_stream_to_memory,
    stream_files,
    windowed_rollup,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows():
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    out = []
    for i in range(100):
        out.append(
            (base + datetime.timedelta(minutes=7 * i), f"t{i % 3}", float(i))
        )
    return out


def test_stream_matches_batch(spark, tmp_path):
    batch = spark.createDataFrame(_rows(), SCHEMA)
    src = str(tmp_path / "stream_src")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    batch.limit(50).coalesce(1).write.parquet(src)
    batch.exceptAll(batch.limit(50)).coalesce(1).write.mode("append").parquet(src)

    stream = stream_files(spark, src, SCHEMA, max_files_per_trigger=1)
    assert stream.isStreaming
    rolled = windowed_rollup(stream, window="30 minutes", watermark="1 hour")
    # complete mode: append would hold back windows the watermark hasn't
    # passed yet, so the final windows of a finite run never emit
    run_stream_to_memory(rolled, "rollup_test", output_mode="complete")

    got = {
        (r.window_start, r.event_type): (r.n, r.value_sum)
        for r in spark.table("rollup_test").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n, r.value_sum)
        for r in windowed_rollup(batch, window="30 minutes").collect()
    }
    assert got == expected
