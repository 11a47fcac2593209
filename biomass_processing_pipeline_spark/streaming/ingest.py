"""Incremental image ingest as Structured Streaming (SURVEY.md §2.8).

The reference has no event-time streaming; its "streaming" is on-demand
tile fetch + resume checkpoints (``V3_STREAMING_IMPLEMENTATION.md``,
``blob_manager_v3.py:376-456,649-845``). The faithful Spark mapping is
incremental batch: ``readStream`` over the images directory with
``trigger(availableNow=True)`` — each micro-batch runs the decode +
cell-index pipeline and appends the same lineage rows the batch path
writes, so a killed ingest resumes from Spark's own streaming checkpoint
AND the engine's lineage stays consistent.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def ingest_images(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    prefix_level: int = 6,
    timeout_sec: int = 300,
) -> dict:
    """availableNow ingest: decode partials + footprint for every new image
    file, appended to ``out_dir/partials`` partitioned by cell prefix.

    Returns counters. Re-running after new files land in ``src_dir``
    processes only the new files (streaming file-source checkpoint).
    """
    from biomass_processing_pipeline_spark.operators.zonal import decode_partials
    from biomass_processing_pipeline_spark.plans.partitioning import (
        with_cell_prefix,
    )
    from biomass_processing_pipeline_spark.sources.images import with_footprint

    chk = os.path.join(out_dir, "_stream_checkpoint")
    dst = os.path.join(out_dir, "partials")
    lineage = os.path.join(out_dir, "_lineage")

    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        fp = with_cell_prefix(
            with_footprint(batch_df), prefix_level=prefix_level
        ).select("image_id", "cell_id", "cell_prefix")
        partials = decode_partials(batch_df).join(fp, "image_id")
        # batch-LOCAL row count piggybacked on the write itself via
        # observe(): one data pass, and crucially NO re-scan of the whole
        # destination per micro-batch (that would be O(total) per batch =
        # O(N^2) over an ingest lifetime — a scale-killer at 100 TB)
        obs = Observation(f"ingest_batch_{batch_id}")
        observed = partials.observe(obs, F.count(F.lit(1)).alias("rows"))
        observed.write.mode("append").partitionBy("cell_prefix").parquet(dst)
        row = spark.createDataFrame(
            [(int(batch_id), int(obs.get["rows"]), time.time(), "complete")],
            "batch_id long, rows_batch long, ts double, status string",
        )
        row.write.mode("append").parquet(lineage)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    # running total = sum of batch-local lineage rows (metadata-tiny table),
    # never a full scan of the data directory
    if os.path.exists(lineage):
        n_rows = int(
            spark.read.parquet(lineage)
            .agg(F.coalesce(F.sum("rows_batch"), F.lit(0)))
            .collect()[0][0]
        )
    else:
        n_rows = 0
    return {"rows_total": n_rows, "checkpoint": chk}
