"""Event-time streaming aggregation (engine extension — the reference has
no event-time semantics, SURVEY.md §2.8; this is the Structured-Streaming
surface a training-data ingest pipeline needs for telemetry/event tables).

Tumbling-window counts with a watermark for late data; availableNow
trigger so the same code runs incrementally over a growing directory and
is exactly reproducible in tests (results == the equivalent batch
``groupBy(window(...))``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin: tumbling-window counts + value sums per type."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
) -> DataFrame:
    """Incremental event-time aggregation: readStream over the events
    directory -> watermark -> tumbling window -> append-mode parquet sink
    (only windows past the watermark are finalized — late rows inside the
    watermark still update their window before it seals)."""
    chk = os.path.join(out_dir, "_chk")
    dst = os.path.join(out_dir, "windows")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", dst)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.read.parquet(dst)
