"""Point-in-polygon assignment (SURVEY.md J7, the north_rule core operator).

Two-phase filter-refine, expressed as plain DataFrame ops so Catalyst owns
the physical plan — the same shape as the reference's coarse-ring +
exact-bbox tile selection (``/root/reference/src/core/coordinate_utils_v3.py
:264-318``) and its R-tree candidate + exact-intersect refine
(``src/pipeline/optimized_county_processor_v3.py:267,309``):

1. **coarse**: equi-join point ``cell_id`` against an exploded
   (cell_id, polygon_key) covering table. The covering table is tiny
   (polygon dictionary x covered cells) -> ``broadcast``.
2. **refine**: vectorized ray-casting inside one Arrow-batched pandas UDF
   over the broadcast prepared-polygon coordinate arrays (analogue of the
   reference's per-parcel shapely ``contains``; here numpy over Arrow
   batches, no per-row Python).

Tie rule (documented, matches the golden generator): a point matching
several polygons (shared/staircase edges) is assigned the minimum key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark import geometry as G


def _is_rectangle(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff the ring is exactly its own bbox (4 corner vertices)."""
    if len(xs) != 4:
        return False
    corners = {(xs.min(), ys.min()), (xs.max(), ys.min()),
               (xs.max(), ys.max()), (xs.min(), ys.max())}
    return {(x, y) for x, y in zip(xs, ys)} == corners


def polygon_cover_df(
    spark: SparkSession,
    polys: pd.DataFrame,
    key_col: str,
    level: int = cells.DEFAULT_LEVEL,
    with_bbox: bool = False,
    geoms: list | None = None,
) -> DataFrame:
    """Exploded (cell_id, key[, bbox, is_rect]) covering table.

    Polygon dictionaries are county-bounded and small relative to the fact
    table, so the cover is computed driver-side in numpy and broadcast —
    but the build itself is BATCHED: every piece bbox goes through ONE
    vectorized ``cover_bboxes_np`` call instead of a per-polygon numpy
    loop (at tens of thousands of dictionary polygons the serial build
    otherwise dominates the whole job). ``with_bbox`` adds the piece bbox
    + an ``is_rect`` flag so the join can refine rectangles with pure
    column predicates and send only genuinely concave candidates to the
    ray-cast UDF. ``geoms``: optional pre-parsed geometries aligned with
    ``polys`` rows (callers that already parsed skip the re-parse).
    """
    keys = list(polys[key_col])
    if geoms is None:
        geoms = [G.parse_wkt(w) for w in polys["geom_wkt"]]
    return spark.createDataFrame(
        cover_pdf_from_geoms(keys, geoms, key_col, level, with_bbox)
    )


def cover_pdf_from_geoms(
    keys: list,
    geoms: list,
    key_col: str,
    level: int = cells.DEFAULT_LEVEL,
    with_bbox: bool = False,
    validate: bool = False,
) -> pd.DataFrame:
    """Pure-pandas cover builder shared by the driver-side dictionary path
    (:func:`polygon_cover_df`) and the DISTRIBUTED fact-side path
    (``intersect.parcel_cover_distributed`` maps it over Arrow batches —
    the same numpy kernels, executed where the data lives).

    ``validate=True`` additionally gates every ring through
    ``is_simple_ring`` (clip areas on self-intersecting rings are silently
    wrong) and raises loudly, reference fix_geometry parity."""
    # one flat piece table: (key, piece_idx, bbox, is_rect)
    p_keys: list = []
    p_piece: list[int] = []
    p_bbox: list[tuple[float, float, float, float]] = []
    p_rect: list[bool] = []
    for key, geom in zip(keys, geoms):
        if validate:
            for poly in geom:
                for ring in poly:
                    if not G.is_simple_ring(*ring):
                        raise ValueError(
                            f"polygon {key!r} has a self-intersecting "
                            "ring; run make_valid/fix upstream"
                        )
        simple = len(geom) == 1 and len(geom[0]) == 1  # one part, no holes
        if with_bbox and simple and G.is_bbox_rectangle(*geom[0][0]):
            xs, ys = geom[0][0]
            p_keys.append(key)
            p_piece.append(0)
            p_bbox.append((xs.min(), ys.min(), xs.max(), ys.max()))
            p_rect.append(True)
        elif with_bbox and simple and G.is_rectilinear(*geom[0][0]):
            # exact rectangle decomposition: PIP becomes a pure bbox test
            # per piece — no Python refine for this polygon at all
            for pi, bb in enumerate(G.decompose_rectilinear(*geom[0][0])):
                p_keys.append(key)
                p_piece.append(pi)
                p_bbox.append(bb)
                p_rect.append(True)
        else:
            # holes/multipolygons/concave (or bbox-less mode): overall bbox
            exts = [p[0] for p in geom]
            p_keys.append(key)
            p_piece.append(0)
            p_bbox.append((
                min(float(r[0].min()) for r in exts),
                min(float(r[1].min()) for r in exts),
                max(float(r[0].max()) for r in exts),
                max(float(r[1].max()) for r in exts),
            ))
            p_rect.append(False)

    bb = np.asarray(p_bbox, dtype=np.float64).reshape(-1, 4)
    idx, cell_ids = cells.cover_bboxes_np(
        bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], level
    )
    key_arr = np.asarray(p_keys, dtype=object)
    pdf = pd.DataFrame({
        "cell_id": cell_ids,
        key_col: key_arr[idx],
    })
    if with_bbox:
        pdf["piece"] = np.asarray(p_piece, dtype=np.int64)[idx]
        pdf["p_minx"] = bb[idx, 0]
        pdf["p_miny"] = bb[idx, 1]
        pdf["p_maxx"] = bb[idx, 2]
        pdf["p_maxy"] = bb[idx, 3]
        pdf["is_rect"] = np.asarray(p_rect, dtype=bool)[idx]
        # the cell's lattice coordinates, decoded here in numpy: the
        # anchor-cell dedup filter compares plain floor() expressions
        # against these (a native-Column Morton re-encode of the anchor
        # point self-duplicates its operand tree 2^5 times per axis —
        # measured to fall out of codegen into ~50us/row interpreted eval)
        cix, ciy = cells.decode_np(cell_ids)
        pdf["cell_ix"] = cix
        pdf["cell_iy"] = ciy
    return pdf.drop_duplicates()


def prepare_polygons(polys: pd.DataFrame, key_col: str) -> dict:
    """key -> parsed general geometry (list of polygons, each a list of
    (xs, ys) rings — holes and multipolygons included) for the refine UDF."""
    return {
        getattr(t, key_col): G.parse_wkt(t.geom_wkt)
        for t in polys.itertuples(index=False)
    }


def assign_points_to_polygons(
    spark: SparkSession,
    points: DataFrame,
    polys: pd.DataFrame,
    key_col: str = "fips",
    level: int = cells.DEFAULT_LEVEL,
    point_key: str = "image_id",
) -> DataFrame:
    """points(point_key, lon, lat, cell_id) -> (point_key, key_col).

    Exactly-one assignment under the min-key tie rule; points outside every
    polygon are dropped (reference drops parcels with no county context).

    Physical shape: broadcast cover join -> **native bbox filter** (kills
    most false candidates JVM-side) -> rectangles accepted outright
    (``is_rect``: bbox test IS the exact test) -> only concave candidates
    cross into the Arrow ray-cast UDF. At the fixture's 5/7 rectangle
    ratio, >70% of candidate rows never touch Python.
    """
    cover = polygon_cover_df(spark, polys, key_col, level, with_bbox=True)
    prepared = spark.sparkContext.broadcast(prepare_polygons(polys, key_col))

    @pandas_udf("boolean")
    def _refine(lon: pd.Series, lat: pd.Series, key: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lon_v = lon.to_numpy()
        lat_v = lat.to_numpy()
        key_v = key.to_numpy()
        # group the Arrow batch by candidate polygon -> one vectorized
        # ray-cast per polygon, not per row (even-odd across rings, so
        # holes and multipolygon parts are handled natively)
        for k in pd.unique(key_v):
            m = key_v == k
            out[m] = G.points_in_geom(lon_v[m], lat_v[m], prepared.value[k])
        return pd.Series(out)

    candidates = points.join(F.broadcast(cover), "cell_id").where(
        (F.col("lon") >= F.col("p_minx")) & (F.col("lon") <= F.col("p_maxx"))
        & (F.col("lat") >= F.col("p_miny")) & (F.col("lat") <= F.col("p_maxy"))
    )
    # two physical branches: an OR with a UDF would push every row through
    # Python (no short-circuit for non-deterministic exprs) — a union keeps
    # rectangle candidates entirely JVM-side
    rect_hits = candidates.where(F.col("is_rect"))
    concave_hits = candidates.where(~F.col("is_rect")).where(
        _refine(F.col("lon"), F.col("lat"), F.col(key_col))
    )
    refined = rect_hits.unionByName(concave_hits)
    return refined.groupBy(point_key).agg(F.min(key_col).alias(key_col))
