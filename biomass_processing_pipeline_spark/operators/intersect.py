"""Polygon x polygon intersection join (SURVEY.md J1) + crop allocation
math (A7-A9, scalar inventory §2.7).

Reference semantics: ``ST_Intersects`` + ``ST_Intersection`` area per
(parcel, crop polygon) pair (``/root/reference/src/config/
database_config_v3.py:82-92``; vectorized variant ``gpd.overlay``
``src/pipeline/optimized_county_processor_v1.py:506``), then per-parcel
area/yield/residue rollups and the dominant-crop argmax
(``src/analyzers/crop_analyzer_v3.py:69-197,384-409``).

Spark-first shape:

1. coarse: cell-cover equi-join parcels x class polygons (both covers are
   exploded (cell_id, key) tables; the class-polygon dictionary is the
   broadcast side, per north_rule);
2. refine: exact intersection area in one Arrow-batched grouped UDF —
   Sutherland–Hodgman clip (triangulated when both sides are concave;
   holes/multipolygons via inclusion–exclusion), numpy;
3. relational tail: urban-code filter (F1), tiny-intersection filter (F4),
   yield/residue arithmetic from a broadcast crop-coefficient dimension,
   per-parcel aggregates + dominant-crop window (A8/W2-W3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark import geometry as G
from biomass_processing_pipeline_spark.synth import URBAN_CODES

# crop coefficients keyed by class_code (analogue of CROP_BIOMASS_FACTORS,
# reference src/config/database_config_v3.py:186-204): yield tons/acre,
# residue ratio, moisture fraction, harvestable fraction
CROP_COEFFS = {
    1: (4.5, 1.0, 0.15, 0.50), 5: (3.2, 1.5, 0.12, 0.45),
    24: (2.1, 1.3, 0.10, 0.40), 36: (5.5, 0.8, 0.20, 0.55),
    2: (1.8, 1.2, 0.10, 0.40), 4: (2.5, 1.1, 0.12, 0.42),
    21: (1.6, 1.4, 0.11, 0.38), 27: (2.0, 1.2, 0.09, 0.41),
    28: (2.2, 1.3, 0.10, 0.44), 31: (1.4, 1.6, 0.08, 0.35),
}


def crop_coeff_df(spark: SparkSession) -> DataFrame:
    rows = [
        (code, y, r, m, h) for code, (y, r, m, h) in sorted(CROP_COEFFS.items())
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["class_code", "yield_tpa", "residue_ratio", "moisture",
                     "harvestable_pct"],
        )
    )


def intersection_join(
    spark: SparkSession,
    parcels: pd.DataFrame,
    class_polys: pd.DataFrame,
    level: int = cells.DEFAULT_LEVEL,
    min_acres: float = 0.01,
    method: str = "auto",
) -> DataFrame:
    """-> (parcel_id, fips, class_code, area_acres, parcel_acres, pct_of_parcel)

    Exact intersection areas; rows below ``min_acres`` dropped (F4); urban
    codes dropped (F1).

    method:
      - "auto"  : native piecewise path when BOTH polygon sets are
                  rectilinear, else the Arrow clip UDF;
      - "native": rectilinear pieces partition each polygon, so
                  area(A∩B) = Σ over piece pairs of rect∩rect — pure
                  column math (greatest/least + the approx-acre formula),
                  whole-stage codegen, no Python;
      - "udf"   : exact clip per candidate pair in an Arrow UDF — GENERAL
                  polygons: concave both sides (triangulated clip), holes
                  (inclusion-exclusion), multipolygons.
    """
    from biomass_processing_pipeline_spark.operators.pip import polygon_cover_df

    # parse every WKT exactly once; the parsed geoms feed the method
    # choice, the cover builds AND the refine broadcast
    p_geoms = [G.parse_wkt(w) for w in parcels["geom_wkt"]]
    c_geoms = [G.parse_wkt(w) for w in class_polys["geom_wkt"]]

    # fail fast on invalid (self-intersecting) rings: clipped areas would
    # be silently wrong. The reference gates with fix_geometry/make_valid
    # (geometry_utils_v1.py:34-53) and skips unfixable parcels; here the
    # dictionary is driver-side, so surface the bad key loudly instead.
    for name, keys, geoms in (("parcel", parcels["parcel_id"], p_geoms),
                              ("class_poly", class_polys["class_poly_id"],
                               c_geoms)):
        for key, g in zip(keys, geoms):
            for poly in g:
                for ring in poly:
                    if not G.is_simple_ring(*ring):
                        raise ValueError(
                            f"{name} {key!r} has a self-intersecting ring; "
                            "run make_valid/fix upstream"
                        )

    def _simple_rectilinear(g) -> bool:
        return (len(g) == 1 and len(g[0]) == 1
                and G.is_rectilinear(*g[0][0]))

    all_rectilinear = all(
        _simple_rectilinear(g) for g in p_geoms + c_geoms
    )
    if method == "auto":
        method = "native" if all_rectilinear else "udf"

    meta = spark.createDataFrame(class_polys[["class_poly_id", "class_code"]])
    pmeta = spark.createDataFrame(
        pd.DataFrame({
            "parcel_id": parcels["parcel_id"],
            "fips": parcels["fips"],
            "parcel_acres": parcels["acres"],
        })
    )

    if method == "native":
        p_cover = polygon_cover_df(spark, parcels, "parcel_id", level,
                                   with_bbox=True, geoms=p_geoms)
        c_cover = polygon_cover_df(spark, class_polys, "class_poly_id", level,
                                   with_bbox=True, geoms=c_geoms).select(
            "cell_id", "class_poly_id",
            F.col("piece").alias("c_piece"),
            F.col("p_minx").alias("c_minx"), F.col("p_miny").alias("c_miny"),
            F.col("p_maxx").alias("c_maxx"), F.col("p_maxy").alias("c_maxy"),
        )
        piece_pairs = (
            p_cover.join(c_cover, "cell_id")
            .select("parcel_id", "piece", "p_minx", "p_miny", "p_maxx", "p_maxy",
                    "class_poly_id", "c_piece", "c_minx", "c_miny", "c_maxx",
                    "c_maxy")
            .dropDuplicates(["parcel_id", "piece", "class_poly_id", "c_piece"])
        )
        ix0 = F.greatest("p_minx", "c_minx")
        iy0 = F.greatest("p_miny", "c_miny")
        ix1 = F.least("p_maxx", "c_maxx")
        iy1 = F.least("p_maxy", "c_maxy")
        deg2 = (ix1 - ix0) * (iy1 - iy0)
        mean_lat = (iy0 + iy1) / 2.0
        acres = (
            deg2 * F.lit(G.DEG_M * G.DEG_M)
            * F.cos(F.radians(mean_lat)) * F.lit(G.ACRES_PER_M2)
        )
        piecewise = piece_pairs.where((ix1 > ix0) & (iy1 > iy0)).select(
            "parcel_id", "class_poly_id", acres.alias("piece_acres")
        )
        areas = piecewise.groupBy("parcel_id", "class_poly_id").agg(
            F.sum("piece_acres").alias("area_acres")
        )
    else:
        p_cover = polygon_cover_df(spark, parcels, "parcel_id", level,
                                   geoms=p_geoms)
        c_cover = polygon_cover_df(spark, class_polys, "class_poly_id", level,
                                   geoms=c_geoms)
        pairs = (
            p_cover.join(c_cover, "cell_id")
            .select("parcel_id", "class_poly_id")
            .distinct()
        )
        prepared_p = spark.sparkContext.broadcast(
            dict(zip(parcels["parcel_id"], p_geoms))
        )
        prepared_c = spark.sparkContext.broadcast(
            dict(zip((int(c) for c in class_polys["class_poly_id"]), c_geoms))
        )

        @pandas_udf("double")
        def _area(parcel_id: pd.Series, class_poly_id: pd.Series) -> pd.Series:
            # general geometry: concave either side (triangulated clip),
            # holes (inclusion-exclusion), multipolygons; convex pairs run
            # the legacy whole-ring Sutherland-Hodgman path bit-identically
            # (reference handles arbitrary PostGIS geometry via shapely,
            # geometry_utils_v1.py:103-118)
            out = np.zeros(len(parcel_id))
            for i, (pid, cid) in enumerate(zip(parcel_id, class_poly_id)):
                out[i] = G.intersection_acres(
                    prepared_c.value[int(cid)], prepared_p.value[pid]
                )
            return pd.Series(out)

        areas = pairs.withColumn("area_acres", _area("parcel_id", "class_poly_id"))

    return (
        areas.where(F.col("area_acres") >= F.lit(min_acres))
        .join(F.broadcast(meta), "class_poly_id")
        .where(~F.col("class_code").isin(list(URBAN_CODES)))
        .join(F.broadcast(pmeta), "parcel_id")
        .withColumn(
            "pct_of_parcel", F.col("area_acres") * 100.0 / F.col("parcel_acres")
        )
    )


def crop_rollup(intersections: DataFrame, coeffs: DataFrame) -> DataFrame:
    """A7 + §2.7 crop math: per (parcel, class) yield/residue columns."""
    j = intersections.join(F.broadcast(coeffs), "class_code")
    return (
        j.withColumn("yield_tons", F.col("area_acres") * F.col("yield_tpa"))
        .withColumn("residue_wet", F.col("yield_tons") * F.col("residue_ratio"))
        .withColumn("residue_dry", F.col("residue_wet") * (1.0 - F.col("moisture")))
        .withColumn(
            "harvestable_tons", F.col("residue_dry") * F.col("harvestable_pct")
        )
    )


def parcel_crop_summary(rollup: DataFrame) -> DataFrame:
    """A7/A8: per-parcel sums + dominant crop (argmax by area, W2/W3)."""
    per_class = rollup.groupBy("parcel_id", "fips", "class_code").agg(
        F.sum("area_acres").alias("area_acres"),
        F.sum("yield_tons").alias("yield_tons"),
        F.sum("harvestable_tons").alias("harvestable_tons"),
    )
    w = Window.partitionBy("parcel_id").orderBy(
        F.desc("area_acres"), F.asc("class_code")
    )
    ranked = per_class.withColumn("rn", F.row_number().over(w))
    sums = per_class.groupBy("parcel_id", "fips").agg(
        F.sum("area_acres").alias("crop_acres"),
        F.sum("yield_tons").alias("total_yield_tons"),
        F.sum("harvestable_tons").alias("total_harvestable_tons"),
        F.count("*").alias("n_crops"),
    )
    dominant = ranked.where(F.col("rn") == 1).select(
        "parcel_id",
        F.col("class_code").alias("dominant_crop"),
        F.col("area_acres").alias("dominant_acres"),
    )
    return sums.join(dominant, "parcel_id")
