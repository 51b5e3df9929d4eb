"""Structured Streaming surface (SURVEY §2.8 — optional demo).

The reference is strictly batch; this module shows the engine's
streaming path on the driver's `events` table: file-source readStream
-> watermark -> tumbling-window aggregate -> availableNow trigger ->
memory sink. On a finite input the result equals the batch
`groupBy(window(...))`, which is what the DuckDB oracle computes —
so even the streaming query is hash-verified.

At scale this is the standard ingestion topology: the file source
becomes Kafka/Iceberg streaming, availableNow becomes continuous
micro-batches, and the 10-minute watermark bounds state for late
data. State is keyed by (window, event_type) — small cardinality, no
skew concern.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_stream(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Run the windowed aggregation as a real streaming query
    (availableNow) and return the materialized result."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    agg = (
        # parquet TIMESTAMP_NTZ -> TIMESTAMP (session TZ = UTC, exact)
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    sink = f"stream_windowed_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("w.start").cast("string").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
