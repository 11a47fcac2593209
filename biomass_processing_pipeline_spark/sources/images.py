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
def _offset_udf(tx: pd.Series, ty: pd.Series, seq: pd.Series) -> pd.DataFrame:
    lon, lat = tile_offset_np(tx.to_numpy(), ty.to_numpy(), seq.to_numpy())
    return pd.DataFrame({"lon": lon, "lat": lat})


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
        .withColumn("tx", F.regexp_extract("image_id", r"^T(\d)(\d)_", 1).cast("int"))
        .withColumn("ty", F.regexp_extract("image_id", r"^T(\d)(\d)_", 2).cast("int"))
        .withColumn("band", F.regexp_extract("image_id", r"_(B\d\d)_", 1))
        .withColumn("seq", F.element_at(F.split("image_id", "_"), -1).cast("long"))
        .withColumn("_pos", _offset_udf(F.col("tx"), F.col("ty"), F.col("seq")))
        .withColumn("lon", F.col("_pos.lon"))
        .withColumn("lat", F.col("_pos.lat"))
        .drop("_pos")
    )
    return df.withColumn("cell_id", cells.cell_id_col(F.col("lon"), F.col("lat"), level))
