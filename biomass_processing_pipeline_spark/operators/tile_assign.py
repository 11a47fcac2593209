"""Image -> tile assignment (SURVEY.md J4/J5: bbox interval join via
cell equi-join + exact bbox refine).

Reference semantics: ``bounds_intersect`` rectangle overlap against the
tile index (``/root/reference/src/core/coordinate_utils_v3.py:231-248``)
with the MGRS candidate-ring coarse filter (``:264-318``). Spark-first
shape: explode each tile's bbox into covering cells at the index level,
equi-join on ``cell_id`` (broadcast — the tile lattice is metadata-only and
tiny, like the reference's in-memory tile index), then refine with plain
column predicates (JVM-side, codegen'd — no UDF needed for rectangles).

For point centroids inside a non-overlapping lattice the refine yields
exactly one tile per image.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import cells


def tile_cover_df(
    spark: SparkSession, tiles: pd.DataFrame, level: int = cells.DEFAULT_LEVEL
) -> DataFrame:
    rows = []
    for t in tiles.itertuples(index=False):
        for c in cells.cover_bbox_np(t.minx, t.miny, t.maxx, t.maxy, level):
            rows.append((int(c), t.tile_code, t.minx, t.miny, t.maxx, t.maxy))
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["cell_id", "tile_code", "t_minx", "t_miny", "t_maxx", "t_maxy"]
        )
    )


def assign_images_to_tiles(
    spark: SparkSession,
    images: DataFrame,
    tiles: pd.DataFrame,
    level: int = cells.DEFAULT_LEVEL,
) -> DataFrame:
    """images(image_id, lon, lat, cell_id) -> (image_id, tile_code).

    Containment rule (documented, matches the closed-form golden):
    min-edge inclusive, max-edge exclusive — each point owned by exactly
    one lattice tile. Ties cannot occur; the trailing min() is a guard
    for float edge cases only.
    """
    cover = tile_cover_df(spark, tiles, level)
    hit = (
        images.join(F.broadcast(cover), "cell_id")
        .where(
            (F.col("lon") >= F.col("t_minx")) & (F.col("lon") < F.col("t_maxx"))
            & (F.col("lat") >= F.col("t_miny")) & (F.col("lat") < F.col("t_maxy"))
        )
    )
    return hit.groupBy("image_id").agg(F.min("tile_code").alias("tile_code"))
