"""Cell index: numpy vs scalar oracle vs native Spark Column must agree."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import cells


def _rand_lonlat(n=500, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_numpy_matches_scalar_oracle():
    lon, lat = _rand_lonlat()
    got = cells.cell_id_np(lon, lat, 10)
    for i in range(0, 500, 37):
        assert got[i] == cells.cell_id_py(lon[i], lat[i], 10)


def test_roundtrip_decode():
    lon, lat = _rand_lonlat(seed=2)
    c = cells.cell_id_np(lon, lat, 12)
    ix, iy = cells.decode_np(c)
    ix0, iy0 = cells.ixy_np(lon, lat, 12)
    assert (ix == ix0).all() and (iy == iy0).all()


def test_parent_is_prefix():
    lon, lat = _rand_lonlat(seed=3)
    c10 = cells.cell_id_np(lon, lat, 10)
    c9 = cells.cell_id_np(lon, lat, 9)
    assert (c10 >> 2 == c9).all()


def test_neighbors_ring():
    c = cells.cell_id_np(np.array([-90.0]), np.array([40.0]), 10)
    ring = cells.neighbors_np(c, 10, 1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]
    ix, iy = cells.decode_np(ring[0])
    ix0, iy0 = cells.decode_np(c)
    assert (np.abs(ix - ix0[0]) <= 1).all() and (np.abs(iy - iy0[0]) <= 1).all()


def test_cover_bbox_contains_point_cells():
    cov = set(cells.cover_bbox_np(-91.0, 38.5, -90.0, 39.5, 10).tolist())
    pts = cells.cell_id_np(
        np.array([-90.9, -90.1, -90.5]), np.array([38.6, 39.4, 39.0]), 10
    )
    assert set(pts.tolist()) <= cov


def test_native_column_matches_numpy(spark):
    lon, lat = _rand_lonlat(seed=4)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn("cell", cells.cell_id_col(F.col("lon"), F.col("lat"), 10))
        .select("cell")
        .toPandas()["cell"]
        .to_numpy()
    )
    assert (got == cells.cell_id_np(lon, lat, 10)).all()


def test_prefix_column(spark):
    lon, lat = _rand_lonlat(seed=5)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    out = df.select(
        cells.cell_prefix_col(
            cells.cell_id_col(F.col("lon"), F.col("lat"), 12), 12, 6
        ).alias("p"),
        cells.cell_id_col(F.col("lon"), F.col("lat"), 6).alias("c6"),
    ).toPandas()
    assert (out["p"] == out["c6"]).all()
