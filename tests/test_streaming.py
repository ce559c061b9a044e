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


def test_sessionize_stream_matches_batch(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    from nhs_data_pipeline_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions separated by a 2-hour gap; user 2: one session
    for m in [0, 5, 10, 130, 135]:
        rows.append((base + datetime.timedelta(minutes=m), 1, 1.0))
    for m in [0, 20]:
        rows.append((base + datetime.timedelta(minutes=m), 2, 2.0))
    # sentinel far-future event per user advances the watermark so all
    # real sessions close during the availableNow run
    for u in (1, 2):
        rows.append((base + datetime.timedelta(days=30), u, 0.0))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")

    src = str(tmp_path / "sess_src")
    ev.coalesce(1).write.parquet(src)
    schema = ev.schema
    stream = stream_files(spark, src, schema)
    sessions = sessionize_stream(stream.withWatermark("ts", "0 seconds"), gap_seconds=1800)
    run_stream_to_memory(sessions, "sessions_test", output_mode="append")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.table("sessions_test").collect()
    }

    batch = sessionize_batch(ev, gap_seconds=1800)
    exp = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in batch.collect()
        # the sentinel sessions never close in the stream; exclude them
        if r.session_start < base + datetime.timedelta(days=1)
    }
    assert exp  # sanity: 3 real sessions
    assert got == exp
