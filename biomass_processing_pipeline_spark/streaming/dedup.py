"""Streaming exact deduplication (engine extension, SURVEY.md §2.8 x the
LLM-data-pipeline dedup family): a training-data ingest stream must drop
re-crawled / re-delivered duplicate documents ON ARRIVAL, not in a nightly
batch pass.

``dropDuplicatesWithinWatermark`` keeps the first row per content key and
holds per-key state only until the event-time watermark passes it — the
bounded-state streaming twin of ``dedup.exact_dedup``. At 10^12-document
scale the state store is hash-partitioned by the dedup key across
executors, exactly like the batch hash-partition shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, ts timestamp, content_hash long, text string"
IMAGES_SCHEMA = "image_id string, ts timestamp, tile_code string, phash long"


def run_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    key_cols: list[str] | None = None,
    watermark: str = "24 hours",
    timeout_sec: int = 300,
    max_files_per_trigger: int = 2,
    schema: str = DOCS_SCHEMA,
) -> DataFrame:
    """Incremental exact dedup: readStream over a document directory ->
    event-time watermark -> ``dropDuplicatesWithinWatermark`` on the
    content key -> append-mode parquet sink. availableNow trigger so the
    same code runs reproducibly over a static directory in tests and
    incrementally on a live feed in production; the checkpoint carries the
    dedup state across restarts (a re-run emits nothing new)."""
    key_cols = key_cols or ["content_hash"]
    chk = os.path.join(out_dir, "_chk")
    dst = os.path.join(out_dir, "deduped")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", dst)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        # the availableNow query may still be writing — reading the sink
        # now would silently return partial dedup output
        q.stop()
        raise TimeoutError(
            f"dedup stream did not finish within {timeout_sec}s"
        )
    return spark.read.parquet(dst)


def doc_stream_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document-arrival stream derived from the events
    table: content_hash = event_id % 500 plants heavy cross-batch
    duplication (every hash arrives many times)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").alias("doc_id"),
        F.col("ts"),
        F.pmod(F.col("event_id"), F.lit(500)).alias("content_hash"),
        F.concat(F.lit("doc body "), F.col("event_id")).alias("text"),
    )


def image_stream_fixture(spark: SparkSession, fixture_dir: str,
                         redeliver_mod: int = 3) -> DataFrame:
    """Deterministic image-arrival stream from the image fixture: every
    image arrives once (ts = epoch + seq seconds), and every
    ``redeliver_mod``-th image is RE-DELIVERED an hour later under a new
    delivery id (a re-crawled tile upload: same tile, same pixels, so the
    same phash — the content key). Key = (tile_code, phash): the
    streaming twin of the batch ``phash_dedup_groups`` exact-signature
    collapse."""
    imgs = spark.read.parquet(f"{fixture_dir}/images.parquet").select(
        "image_id", "phash",
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})$", 1).cast("long").alias("_seq"),
    )
    base = imgs.select(
        "image_id",
        (F.timestamp_seconds(F.lit(1_700_000_000) + F.col("_seq"))).alias("ts"),
        "tile_code", "phash",
    )
    redelivered = imgs.where(F.col("_seq") % redeliver_mod == 0).select(
        F.concat(F.col("image_id"), F.lit("_rd")).alias("image_id"),
        (F.timestamp_seconds(
            F.lit(1_700_000_000 + 3600) + F.col("_seq"))).alias("ts"),
        "tile_code", "phash",
    )
    return base.unionByName(redelivered)


def run_image_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    watermark: str = "24 hours",
    timeout_sec: int = 300,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Streaming image near-dup ingest gate: drop re-delivered captures of
    a tile ON ARRIVAL, keyed by (tile_code, phash) — the exact-signature
    level of the batch ``phash_dedup_groups`` (its banding/CC near-dup
    stage then runs over the already-thinned stream output). State is
    hash-partitioned by the key and bounded by the watermark, so a
    10^12-image firehose holds only the active window's distinct
    (tile, sig) pairs."""
    return run_dedup_stream(
        spark, src_dir, out_dir,
        key_cols=["tile_code", "phash"],
        watermark=watermark,
        timeout_sec=timeout_sec,
        max_files_per_trigger=max_files_per_trigger,
        schema=IMAGES_SCHEMA,
    )
