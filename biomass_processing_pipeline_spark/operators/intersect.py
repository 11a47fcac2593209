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


def parcel_cover_distributed(
    parcels: DataFrame,
    level: int = cells.DEFAULT_LEVEL,
    key_col: str = "parcel_id",
) -> DataFrame:
    """Distributed piece/cover table for a FACT-SIZED polygon side.

    The reference's J1 parcel side is the 150M-row fact table
    (``optimized_county_processor_v1.py:506``) — a driver-side pandas
    build serializes the whole job behind the driver at 100x. Here every
    Arrow batch runs the SAME vectorized numpy cover build
    (``pip.cover_pdf_from_geoms``: bbox-rectangle fast path, exact
    rectilinear decomposition, batched ``cover_bboxes_np``) where the
    data lives; the simplicity gate (``is_simple_ring``) runs inside the
    same pass and raises loudly on self-intersecting rings (clip areas on
    bow-ties are silently wrong — reference fix_geometry parity).

    Input needs (key_col, geom_wkt); output
    (key_col, piece, p_minx..p_maxy, is_rect, cell_id).
    """
    from biomass_processing_pipeline_spark.operators.pip import (
        cover_pdf_from_geoms,
    )

    key_type = dict(parcels.dtypes)[key_col]
    schema = (
        f"{key_col} {key_type}, piece long, p_minx double, p_miny double, "
        "p_maxx double, p_maxy double, is_rect boolean, cell_id long, "
        "cell_ix long, cell_iy long"
    )
    cols = [key_col, "piece", "p_minx", "p_miny", "p_maxx", "p_maxy",
            "is_rect", "cell_id", "cell_ix", "cell_iy"]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            geoms = [G.parse_wkt(w) for w in pdf["geom_wkt"]]
            cover = cover_pdf_from_geoms(
                list(pdf[key_col]), geoms, key_col, level,
                with_bbox=True, validate=True,
            )
            yield cover[cols]

    src = parcels.select(key_col, "geom_wkt")
    # Everything downstream of this cover (broadcast candidate join,
    # anchor-cell dedup, piecewise area math, partial agg) is map-resident
    # — there is no later exchange to restore parallelism. A small tier's
    # parquet scan can collapse to a couple of splits, which would pin the
    # whole J1 pipeline to that width; fan the SLIM 2-col input out first
    # (20k-200k rows — nothing next to the 100M+ candidate stream the old
    # dedup shuffle moved). At fact scale the scan already has >= cores
    # splits and this is a no-op.
    par = parcels.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(gen, schema=schema)


def intersection_join(
    spark: SparkSession,
    parcels,
    class_polys: pd.DataFrame,
    level: int = cells.DEFAULT_LEVEL,
    min_acres: float = 0.01,
    method: str = "auto",
) -> DataFrame:
    """-> (parcel_id, fips, class_code, area_acres, parcel_acres, pct_of_parcel)

    Exact intersection areas; rows below ``min_acres`` dropped (F4); urban
    codes dropped (F1).

    ``parcels`` is the FACT side — a Spark DataFrame with
    (parcel_id, fips, acres, geom_wkt) — and is processed fully
    distributed: piece decomposition + cell cover in one mapInPandas pass
    (:func:`parcel_cover_distributed`), attributes joined back by id. A
    pandas DataFrame is also accepted (dictionary-sized callers, tests);
    it is validated eagerly driver-side then run through the SAME
    distributed pipeline. ``class_polys`` is the polygon DICTIONARY
    (counties / CDL classes) — driver-built cover, broadcast, per
    north_rule.

    method:
      - "auto"  : per-pair routing — rect-piece x rect-piece candidates
                  take the native piecewise path (pure column math,
                  whole-stage codegen), every other pair takes the Arrow
                  clip UDF (concave, holes, multipolygons);
      - "native": force the piecewise path (requires both sides
                  rectilinear — exact there, silently lossy otherwise);
      - "udf"   : force the Arrow clip UDF for all candidate pairs.
    """
    from biomass_processing_pipeline_spark.operators.pip import polygon_cover_df

    if isinstance(parcels, pd.DataFrame):
        # dictionary-sized pandas callers keep the eager driver-side gate
        # (fail at call time, not first action)
        p_geoms = [G.parse_wkt(w) for w in parcels["geom_wkt"]]
        for key, g in zip(parcels["parcel_id"], p_geoms):
            for poly in g:
                for ring in poly:
                    if not G.is_simple_ring(*ring):
                        raise ValueError(
                            f"parcel {key!r} has a self-intersecting ring; "
                            "run make_valid/fix upstream"
                        )
        parcels = spark.createDataFrame(
            parcels[["parcel_id", "fips", "acres", "geom_wkt"]]
        )

    c_geoms = [G.parse_wkt(w) for w in class_polys["geom_wkt"]]
    # the class dictionary is driver-side: surface bad keys loudly here
    # (reference gates with fix_geometry, geometry_utils_v1.py:34-53)
    for key, g in zip(class_polys["class_poly_id"], c_geoms):
        for poly in g:
            for ring in poly:
                if not G.is_simple_ring(*ring):
                    raise ValueError(
                        f"class_poly {key!r} has a self-intersecting ring; "
                        "run make_valid/fix upstream"
                    )

    meta = spark.createDataFrame(class_polys[["class_poly_id", "class_code"]])
    pmeta = parcels.select(
        "parcel_id", "fips", F.col("acres").alias("parcel_acres")
    )

    p_cover = parcel_cover_distributed(parcels, level)
    c_cover = polygon_cover_df(spark, class_polys, "class_poly_id", level,
                               with_bbox=True, geoms=c_geoms).select(
        "cell_id", "class_poly_id",
        F.col("piece").alias("c_piece"),
        F.col("p_minx").alias("c_minx"), F.col("p_miny").alias("c_miny"),
        F.col("p_maxx").alias("c_maxx"), F.col("p_maxy").alias("c_maxy"),
        F.col("is_rect").alias("c_is_rect"),
    )
    cand = p_cover.join(F.broadcast(c_cover), "cell_id")

    # Anchor-cell duplicate avoidance (the PBSM/"reference point"
    # technique): a piece pair sharing M cover cells comes out of the
    # equi-join M times. Both covers are CLOSED piece-BBOX covers
    # (cover_pdf_from_geoms), so the bbox-intersection corner
    # (max of the min edges) falls — with the SAME clamp/floor math as
    # the cover build (ix_col/iy_col ≡ ixy_np op-for-op) — in a cell that
    # is in BOTH covers, exactly once. Keeping only the row whose join
    # cell IS that anchor cell dedups candidates map-side inside
    # whole-stage codegen; the former dropDuplicates/distinct shuffled
    # the full cell×piece-pair stream (measured 122M rows at the sf1
    # tier) before any math ran — THE scale bottleneck at 100x. The
    # comparison is per-AXIS against the cover row's numpy-decoded
    # (cell_ix, cell_iy) — NOT cell_id == cell_id_col(anchor): the Column
    # Morton interleave self-duplicates its operand subtree 2^5 times per
    # axis, falls out of codegen, and interprets at ~50us/row (measured
    # 196s over this same 122M-row join).
    # …and bbox-disjoint piece pairs are pruned in the SAME codegen stage:
    # two pieces can share a cover cell without their bboxes overlapping
    # (each clips a different corner of the cell). >= keeps touching
    # bboxes — their intersection is zero-area and falls to the area math
    # either way, so this prunes only provably-empty pairs.
    cand = cand.where(
        (F.col("p_maxx") >= F.col("c_minx"))
        & (F.col("c_maxx") >= F.col("p_minx"))
        & (F.col("p_maxy") >= F.col("c_miny"))
        & (F.col("c_maxy") >= F.col("p_miny"))
        & (cells.ix_col(F.greatest("p_minx", "c_minx"), level)
           == F.col("cell_ix"))
        & (cells.iy_col(F.greatest("p_miny", "c_miny"), level)
           == F.col("cell_iy"))
    )

    if method == "native":
        native_cand = cand
        udf_pairs = None
    elif method == "udf":
        native_cand = None
        udf_pairs = cand.select("parcel_id", "class_poly_id").distinct()
    else:  # auto: per-pair routing on the piece flags
        native_cand = cand.where(F.col("is_rect") & F.col("c_is_rect"))
        udf_pairs = (
            cand.where(~(F.col("is_rect") & F.col("c_is_rect")))
            .select("parcel_id", "class_poly_id")
            .distinct()
        )

    parts = []
    if native_cand is not None:
        # rect pieces PARTITION each polygon exactly, so
        # area(A∩B) = Σ over piece pairs of rect∩rect — pure column math,
        # whole-stage codegen, no Python; the anchor filter above already
        # guarantees one row per (parcel piece, class piece) pair
        piece_pairs = native_cand
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
        parts.append(
            piecewise.groupBy("parcel_id", "class_poly_id").agg(
                F.sum("piece_acres").alias("area_acres")
            )
        )
    if udf_pairs is not None:
        # whole-geometry exact clip: the class dictionary is broadcast;
        # the parcel WKT rides a slim id-keyed join back onto candidates
        # (never through the cover explosion)
        prepared_c = spark.sparkContext.broadcast(
            dict(zip((int(c) for c in class_polys["class_poly_id"]), c_geoms))
        )

        @pandas_udf("double")
        def _area(wkt: pd.Series, class_poly_id: pd.Series) -> pd.Series:
            # general geometry: concave either side (triangulated clip),
            # holes (inclusion-exclusion), multipolygons; convex pairs run
            # the legacy whole-ring Sutherland-Hodgman path bit-identically
            # (reference handles arbitrary PostGIS geometry via shapely,
            # geometry_utils_v1.py:103-118). Parcels repeat across class
            # polys in a batch -> memoize the parse per distinct WKT.
            memo: dict[str, list] = {}
            out = np.zeros(len(wkt))
            for i, (w, cid) in enumerate(zip(wkt, class_poly_id)):
                g = memo.get(w)
                if g is None:
                    g = memo[w] = G.parse_wkt(w)
                out[i] = G.intersection_acres(prepared_c.value[int(cid)], g)
            return pd.Series(out)

        # deterministic in fact, but flagged nondeterministic so Catalyst
        # cannot push the downstream `area_acres >= min_acres` filter BELOW
        # the projection and evaluate the clip UDF twice (two
        # ArrowEvalPython nodes — the most expensive UDF in the J1 path at
        # 2x cost; same guard pattern as similarity._buckets_udf)
        _area_once = _area.asNondeterministic()
        with_wkt = udf_pairs.join(
            parcels.select("parcel_id", "geom_wkt"), "parcel_id"
        )
        parts.append(
            with_wkt.select(
                "parcel_id", "class_poly_id",
                _area_once("geom_wkt", "class_poly_id").alias("area_acres"),
            )
        )

    areas = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    return (
        areas.where(F.col("area_acres") >= F.lit(min_acres))
        .join(F.broadcast(meta), "class_poly_id")
        .where(~F.col("class_code").isin(list(URBAN_CODES)))
        .join(pmeta, "parcel_id")
        .withColumn(
            # try_divide: guarded for min_acres=0 callers, where a
            # zero-area parcel's zero-area intersection row survives the
            # filter and 0/0 would raise under ANSI (default 0.01 already
            # excludes it: intersection area <= parcel area)
            "pct_of_parcel",
            F.try_divide(F.col("area_acres") * 100.0, F.col("parcel_acres")),
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
    """A7/A8: per-parcel sums + dominant crop (argmax by area, W2/W3).

    The dominant crop is a ``max(struct(area, -class_code))`` in the SAME
    aggregation as the sums (round 6): identical semantics to the former
    ``row_number() over (order by area desc, class_code asc) = 1`` window
    — max area wins, ties take the smaller class — but the plan drops the
    window's extra exchange+sort AND the sums-join (was a SortMergeJoin
    of two aggregates of the same parent): 4 Exchanges -> 2, no sort, no
    join. Identical rows verified by the intersect goldens and the
    ``intersect_rect`` oracle."""
    per_class = rollup.groupBy("parcel_id", "fips", "class_code").agg(
        F.sum("area_acres").alias("area_acres"),
        F.sum("yield_tons").alias("yield_tons"),
        F.sum("harvestable_tons").alias("harvestable_tons"),
    )
    dom = F.max(F.struct(
        F.col("area_acres"),
        (-F.col("class_code")).alias("_neg"),
        F.col("class_code").alias("_cc"),
    ))
    return per_class.groupBy("parcel_id", "fips").agg(
        F.sum("area_acres").alias("crop_acres"),
        F.sum("yield_tons").alias("total_yield_tons"),
        F.sum("harvestable_tons").alias("total_harvestable_tons"),
        F.count("*").alias("n_crops"),
        dom["_cc"].alias("dominant_crop"),
        dom["area_acres"].alias("dominant_acres"),
    )
