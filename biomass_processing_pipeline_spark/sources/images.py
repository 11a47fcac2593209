"""Images-table source: load + derive footprint columns from ``image_id``.

The reference derives tile bounds from MGRS blob names
(``/root/reference/src/core/coordinate_utils_v3.py:200-229`` regex parse,
``:391-472`` grid math). Here: the name-lattice indices parse natively with
``regexp_extract`` (JVM-side), and the deterministic in-tile offset (a
splitmix64 hash of ``seq``) is one Arrow-batched pandas UDF returning a
(lon, lat) struct; the Morton ``cell_id`` is then a pure Column expression.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark.synth import tile_offset_np

_POS_TYPE = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


def load_images(spark: SparkSession, fixture_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(fixture_dir, "images.parquet"))


@pandas_udf(_POS_TYPE)
def _offset_udf(tx: pd.Series, ty: pd.Series, seq: pd.Series,
                bad: pd.Series) -> pd.DataFrame:
    # malformed image_id rows arrive pre-flagged in ``bad`` with their
    # int columns coalesced to 0 (with_footprint): if NULLs reached this
    # UDF directly, Arrow would hand the WHOLE int64 column over as
    # float64 and any seq above 2^53 would be silently perturbed before
    # hashing — the coalesce keeps the column int64-exact end to end.
    # Flagged rows mask to NULL lon/lat (not NaN: ANSI would raise
    # casting NaN inside the downstream Morton cell expression).
    badv = bad.to_numpy(bool)
    lon, lat = tile_offset_np(
        tx.to_numpy(np.int64), ty.to_numpy(np.int64), seq.to_numpy(np.int64),
    )
    return pd.DataFrame({
        "lon": pd.array(np.where(badv, np.nan, lon), dtype="Float64"),
        "lat": pd.array(np.where(badv, np.nan, lat), dtype="Float64"),
    })


# The function IS deterministic, but flagging it so stops Catalyst from
# duplicating the eval when a downstream join pushes an IsNotNull filter
# back through it (observed: two ArrowEvalPython stages for one UDF).
_offset_udf = _offset_udf.asNondeterministic()


def with_footprint(images: DataFrame, level: int = cells.DEFAULT_LEVEL) -> DataFrame:
    """Add name-tile indices, centroid lon/lat, and Morton cell_id columns.

    Column pruning note: only ``image_id`` feeds these expressions, so a
    downstream query that doesn't touch ``bytes`` never reads the binary
    column from parquet (verified in tests via the physical plan ReadSchema).
    """
    df = (
        images
        # try_cast: a malformed image_id (regexp_extract -> '' or a
        # non-numeric trailing segment) must quarantine to NULL footprint
        # columns, not raise ANSI CAST_INVALID_INPUT and kill the scan —
        # the reference's regex parse likewise skips non-matching names
        # (coordinate_utils_v3.py:200-229). NULL cell_id rows drop out of
        # the spatial equi-joins; nothing else is affected.
        .withColumn("tx", F.regexp_extract(
            "image_id", r"^T(\d)(\d)_", 1).try_cast("int"))
        .withColumn("ty", F.regexp_extract(
            "image_id", r"^T(\d)(\d)_", 2).try_cast("int"))
        .withColumn("band", F.regexp_extract("image_id", r"_(B\d\d)_", 1))
        .withColumn("seq", F.element_at(
            F.split("image_id", "_"), -1).try_cast("long"))
        .withColumn("_pos", _offset_udf(
            F.coalesce("tx", F.lit(0)),
            F.coalesce("ty", F.lit(0)),
            F.coalesce("seq", F.lit(0).cast("long")),
            F.col("tx").isNull() | F.col("ty").isNull()
            | F.col("seq").isNull(),
        ))
        .withColumn("lon", F.col("_pos.lon"))
        .withColumn("lat", F.col("_pos.lat"))
        .drop("_pos")
    )
    # NULL-gate the cell: cell_id_col's clamp (greatest(0, raw)) SKIPS
    # nulls, so a quarantined NULL-lon row would otherwise silently land
    # in cell (0,0) instead of staying out of the spatial joins
    return df.withColumn(
        "cell_id",
        F.when(
            F.col("lon").isNotNull() & F.col("lat").isNotNull(),
            cells.cell_id_col(F.col("lon"), F.col("lat"), level),
        ),
    )
