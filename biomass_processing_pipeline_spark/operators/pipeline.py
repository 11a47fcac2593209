"""Fused north_rule job: county PIP + tile assignment in ONE shuffle.

The naive composition (PIP groupBy + tile groupBy + join of the two
outputs) shuffles the point set three times. This operator fuses them:

  points -> broadcast county-cover join -> native bbox filter
         -> rect fast path | Arrow ray-cast refine (concave only)
         -> closed-form lattice tile column (pure floor math — the
            reference's own WorldCover tile naming, coordinate_utils_v3.py
            :327-358, is exactly this)
         -> ONE groupBy(point) agg(min fips, min tile)

The tile column is attached before the single shuffle because it is a
pure function of the point's coordinates — no join needed for a regular
lattice. Irregular tile sets still use operators.tile_assign's bbox join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark import geometry as G
from biomass_processing_pipeline_spark.operators.pip import (
    polygon_cover_df,
    prepare_polygons,
)


def lattice_params(tiles: pd.DataFrame) -> tuple[float, float, float, int]:
    """Infer (x0, y0, g, n_side) from a regular tile lattice; raises if the
    tile set is not a uniform grid (caller must fall back to the bbox join).
    """
    g = float(tiles["maxx"].iloc[0] - tiles["minx"].iloc[0])
    x0 = float(tiles["minx"].min())
    y0 = float(tiles["miny"].min())
    n_side = int(round(np.sqrt(len(tiles))))
    widths = (tiles["maxx"] - tiles["minx"]).to_numpy()
    heights = (tiles["maxy"] - tiles["miny"]).to_numpy()
    if not (np.allclose(widths, g) and np.allclose(heights, g)
            and n_side * n_side == len(tiles)):
        raise ValueError("tile set is not a regular lattice")
    return x0, y0, g, n_side


def lattice_tile_col(lon, lat, x0: float, y0: float, g: float, n_side: int):
    tx = F.least(
        F.lit(n_side - 1),
        F.greatest(F.lit(0), F.floor((lon - F.lit(x0)) / F.lit(g))),
    ).cast("int")
    ty = F.least(
        F.lit(n_side - 1),
        F.greatest(F.lit(0), F.floor((lat - F.lit(y0)) / F.lit(g))),
    ).cast("int")
    return F.format_string("G%02d%02d", tx, ty)


def build_dictionaries(
    spark: SparkSession, counties: pd.DataFrame,
    level: int = cells.DEFAULT_LEVEL,
) -> tuple[DataFrame, object]:
    """Build the broadcastable county dictionaries ONCE; reuse across
    batches/runs (the reference hoists its county index build out of the
    batch loop the same way, optimized_county_processor_v3.py:131-326)."""
    cover = polygon_cover_df(spark, counties, "fips", level, with_bbox=True)
    prepared = spark.sparkContext.broadcast(prepare_polygons(counties, "fips"))
    return cover, prepared


def county_tile_assign(
    spark: SparkSession,
    points: DataFrame,
    counties: pd.DataFrame,
    tiles: pd.DataFrame,
    level: int = cells.DEFAULT_LEVEL,
    point_key: str = "image_id",
    dicts: tuple[DataFrame, object] | None = None,
    assume_tiling: bool = True,
) -> DataFrame:
    """points(point_key, lon, lat, cell_id) -> (point_key, fips, tile_code).

    Same results as assign_points_to_polygons + assign_images_to_tiles
    everywhere except exact piece seams (below); verified in tests.

    ``assume_tiling``: county dictionaries are spatial *partitions*
    (non-overlapping tilings), so with half-open [min, max) piece tests
    each point matches EXACTLY ONE rectilinear piece — the dedup groupBy
    (a shuffle with one group per point: the worst case for hash
    aggregation) is provably unnecessary and the whole job becomes
    map-only. This is the 10^12-scale path: zero shuffles, pure
    whole-stage-codegen scan. Set False for overlapping polygon sets to
    get the exact min-key groupBy semantics.

    Seam rule (documented divergence): a point EXACTLY on a shared piece
    edge belongs to the piece whose min edge it lies on (half-open
    ownership — the same side a standard ray-cast assigns for rectangles),
    while the unfused closed-bbox path resolves the two matches min-key.
    Points on the tiling's global max edges are NOT dropped: the half-open
    test closes at the global bounds (see ``gx1``/``gy1`` below).
    """
    cover, prepared = dicts if dicts is not None else build_dictionaries(
        spark, counties, level
    )

    @pandas_udf("boolean")
    def _refine(lon: pd.Series, lat: pd.Series, key: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lon_v, lat_v, key_v = lon.to_numpy(), lat.to_numpy(), key.to_numpy()
        for k in pd.unique(key_v):
            m = key_v == k
            out[m] = G.points_in_geom(lon_v[m], lat_v[m], prepared.value[k])
        return pd.Series(out)

    x0, y0, g, n_side = lattice_params(tiles)
    tile = lattice_tile_col(F.col("lon"), F.col("lat"), x0, y0, g, n_side)

    if assume_tiling and not cover.where(~F.col("is_rect")).isEmpty():
        # non-rectilinear polygons present: piece tests aren't exact, the
        # map-only ownership argument doesn't hold -> exact path
        assume_tiling = False
    if assume_tiling:
        # half-open piece ownership: exactly one match per point -> map-only.
        # The max edge closes at the tiling's GLOBAL bounds so boundary
        # points on the outermost edge aren't dropped (ownership stays
        # unique: per dimension a coordinate satisfies the half-open test of
        # exactly one piece, or the closed test of the single outermost one).
        gx1 = max(float(p[0][0].max()) for g in prepared.value.values() for p in g)
        gy1 = max(float(p[0][1].max()) for g in prepared.value.values() for p in g)
        own_x = (F.col("lon") >= F.col("p_minx")) & (
            (F.col("lon") < F.col("p_maxx"))
            | ((F.col("lon") == F.col("p_maxx")) & (F.col("p_maxx") == gx1))
        )
        own_y = (F.col("lat") >= F.col("p_miny")) & (
            (F.col("lat") < F.col("p_maxy"))
            | ((F.col("lat") == F.col("p_maxy")) & (F.col("p_maxy") == gy1))
        )
        hits = points.join(F.broadcast(cover), "cell_id").where(own_x & own_y)
        return hits.select(point_key, "fips", tile.alias("tile_code"))

    cand = points.join(F.broadcast(cover), "cell_id").where(
        (F.col("lon") >= F.col("p_minx")) & (F.col("lon") <= F.col("p_maxx"))
        & (F.col("lat") >= F.col("p_miny")) & (F.col("lat") <= F.col("p_maxy"))
    )
    rect = cand.where(F.col("is_rect"))
    concave = cand.where(~F.col("is_rect")).where(
        _refine(F.col("lon"), F.col("lat"), F.col("fips"))
    )
    hits = rect.unionByName(concave)
    return (
        hits.withColumn("tile_code", tile)
        .groupBy(point_key)
        .agg(F.min("fips").alias("fips"), F.min("tile_code").alias("tile_code"))
    )
