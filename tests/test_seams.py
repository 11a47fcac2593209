"""Seam semantics of the fused map-only county+tile assign.

Documented rule (operators/pipeline.py): a point EXACTLY on a shared piece
edge belongs to the piece whose MIN edge it lies on (half-open ownership);
the unfused closed-bbox path resolves the double match min-key. Points on
the tiling's global max edges must never be dropped.
"""

import numpy as np
import pandas as pd

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark.operators.pipeline import county_tile_assign


def _fixture(spark):
    counties = pd.DataFrame([
        {"fips": "A", "geom_wkt": "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"},
        {"fips": "B", "geom_wkt": "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"},
        {"fips": "C", "geom_wkt": "POLYGON ((0 1, 1 1, 1 2, 0 2, 0 1))"},
        {"fips": "D", "geom_wkt": "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"},
    ])
    tiles = pd.DataFrame([
        {"minx": float(i), "miny": float(j),
         "maxx": float(i + 1), "maxy": float(j + 1)}
        for i in range(2) for j in range(2)
    ])
    pts = pd.DataFrame({
        "pid": np.arange(7),
        "lon": [0.5, 1.0, 0.5, 1.0, 2.0, 2.0, 0.0],
        "lat": [0.5, 0.5, 1.0, 1.0, 0.5, 2.0, 0.0],
    })
    pts["cell_id"] = cells.cell_id_np(
        pts.lon.to_numpy(), pts.lat.to_numpy(), cells.DEFAULT_LEVEL
    )
    return counties, tiles, spark.createDataFrame(pts)


def test_fused_seam_ownership_and_no_drops(spark):
    counties, tiles, pts = _fixture(spark)
    got = county_tile_assign(
        spark, pts, counties, tiles, point_key="pid"
    ).toPandas().set_index("pid")["fips"]
    # every point assigned exactly once — including the global max edge/corner
    assert len(got) == 7 and got.index.nunique() == 7
    # half-open: seam points go to the min-edge owner (east/north neighbor)
    expect = {0: "A", 1: "B", 2: "C", 3: "D", 4: "B", 5: "D", 6: "A"}
    assert got.to_dict() == expect


def test_unfused_seam_is_min_key(spark):
    counties, tiles, pts = _fixture(spark)
    got = county_tile_assign(
        spark, pts, counties, tiles, point_key="pid", assume_tiling=False
    ).toPandas().set_index("pid")["fips"]
    assert len(got) == 7
    # closed bbox: seam points match all touching pieces, min fips wins
    expect = {0: "A", 1: "A", 2: "A", 3: "A", 4: "B", 5: "D", 6: "A"}
    assert got.to_dict() == expect
