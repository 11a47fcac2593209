"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 extension; task brief: "applyInPandasWithState for custom
stateful operators").

Running per-tile ingest tracker: as image batches stream in, each tile
accumulates (n_images, first/last date seen, distinct bands bitmap) in
GroupState — the stateful analogue of the reference's monotonically
accumulated stats dicts (comprehensive_biomass_processor_v3.py:40-50,
541-552), which it keeps in driver memory; here state is per-key,
checkpointed and crash-safe.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

STATE_SCHEMA = "n_images long, first_date string, last_date string, bands long"
OUTPUT_SCHEMA = (
    "tile_code string, n_images long, first_date string, last_date string, "
    "n_bands int"
)

_BANDS = ["B02", "B03", "B04", "B08"]


def _track_tiles(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-tile counters across micro-batches. Bands fold into
    a bitmap long so state stays fixed-size regardless of batch count."""
    if state.exists:
        n, first_d, last_d, bands = state.get
    else:
        n, first_d, last_d, bands = 0, None, None, 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            d_min = pdf["date"].min()
            d_max = pdf["date"].max()
            first_d = d_min if first_d is None else min(first_d, d_min)
            last_d = d_max if last_d is None else max(last_d, d_max)
            for b in pdf["band"].unique():
                if b in _BANDS:
                    bands |= 1 << _BANDS.index(b)
    state.update((n, first_d, last_d, bands))
    yield pd.DataFrame({
        "tile_code": [key[0]],
        "n_images": [n],
        "first_date": [first_d],
        "last_date": [last_d],
        "n_bands": [bin(bands).count("1")],
    })


def run_tile_tracker(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    timeout_sec: int = 300,
) -> DataFrame:
    """availableNow stateful ingest tracker: parse tile/date/band from
    image ids, maintain per-tile GroupState, append each batch's updated
    tile rows to the sink. Re-invocation resumes Spark state from the
    checkpoint, so counters keep accumulating across runs.

    Returns the LATEST row per tile from the sink (update-log compaction:
    max n_images per tile is the newest state, counters are monotone).
    """
    chk = os.path.join(out_dir, "_chk")
    dst = os.path.join(out_dir, "tiles")
    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    parsed = stream.select(
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})_", 1).alias("date"),
        F.regexp_extract("image_id", r"_(B\d\d)_", 1).alias("band"),
    )
    tracked = parsed.groupBy("tile_code").applyInPandasWithState(
        _track_tiles,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        tracked.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(dst)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    log = spark.read.parquet(dst)
    latest = log.groupBy("tile_code").agg(
        F.max("n_images").alias("n_images"),
        F.min("first_date").alias("first_date"),
        F.max("last_date").alias("last_date"),
        F.max("n_bands").alias("n_bands"),
    )
    return latest
