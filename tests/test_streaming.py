"""Streaming surface: the stateful applyInPandasWithState sessionizer
and the watermarked window aggregate must equal their batch
equivalents on finite (availableNow) input."""

import os

from pyspark.sql import functions as F

from pdfspark.operators.retrieval import sessionize_events
from pdfspark.streaming.stateful import sessionize_stream
from pdfspark.streaming.windowed import windowed_counts_stream

SF_DIR = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF_DIR, "events.parquet")


def test_stateful_stream_equals_batch_sessionize(spark):
    batch = {
        (r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts,
                                    r.total_value)
        for r in sessionize_events(
            spark.read.parquet(EVENTS)
        ).collect()
    }
    stream = {
        (r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts,
                                    r.total_value)
        for r in sessionize_stream(spark, EVENTS).collect()
    }
    assert batch == stream


def test_windowed_stream_equals_batch_groupby(spark):
    ev = spark.read.parquet(EVENTS).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
        .collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_counts_stream(spark, EVENTS).collect()
    }
    assert batch == stream
