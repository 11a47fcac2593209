"""Flagship PIP assignment vs brute-force golden (exact, per north_rule)."""

import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.pip import assign_points_to_polygons
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def test_pip_matches_golden_exactly(spark, smoke_dir):
    images = load_images(spark, smoke_dir)
    fp = with_footprint(images.select("image_id"))
    counties = pd.read_parquet(f"{smoke_dir}/counties.parquet")
    got = (
        assign_points_to_polygons(spark, fp, counties, "fips")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    gold = (
        pd.read_parquet(f"{smoke_dir}/golden_image_county.parquet")
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(gold)
    merged = gold.merge(got, on="image_id", suffixes=("_g", "_e"))
    assert (merged.fips_g == merged.fips_e).all()


def test_footprint_prunes_bytes_column(spark, smoke_dir):
    """The PIP plan must not read the binary column (column pruning)."""
    images = load_images(spark, smoke_dir)
    fp = with_footprint(images).select("image_id", "lon", "lat", "cell_id")
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan


def test_raycast_path_on_non_rectilinear_polygons(spark):
    """Triangles/hexagons can't decompose into rectangles, so candidates
    MUST flow through the Arrow ray-cast refine; verify against a numpy
    brute-force oracle."""
    import numpy as np

    from biomass_processing_pipeline_spark import geometry as G

    polys = pd.DataFrame([
        {"key": "tri", "geom_wkt": "POLYGON ((0 0, 4 0, 2 3, 0 0))",
         "minx": 0.0, "miny": 0.0, "maxx": 4.0, "maxy": 3.0},
        {"key": "hex", "geom_wkt":
         "POLYGON ((6 1, 8 0, 10 1, 10 3, 8 4, 6 3, 6 1))",
         "minx": 6.0, "miny": 0.0, "maxx": 10.0, "maxy": 4.0},
    ])
    rng = np.random.default_rng(11)
    lon = rng.uniform(-1, 11, 400)
    lat = rng.uniform(-1, 5, 400)
    from biomass_processing_pipeline_spark import cells

    pts = spark.createDataFrame(
        pd.DataFrame({
            "pid": np.arange(400), "lon": lon, "lat": lat,
            "cell_id": cells.cell_id_np(lon, lat, cells.DEFAULT_LEVEL),
        })
    )
    got = (
        assign_points_to_polygons(spark, pts, polys, "key", point_key="pid")
        .toPandas().set_index("pid")["key"]
    )
    # the plan must include a Python eval (ray-cast actually ran)
    plan_df = assign_points_to_polygons(spark, pts, polys, "key", point_key="pid")
    assert "ArrowEvalPython" in plan_df._jdf.queryExecution().executedPlan().toString()
    for name in ("tri", "hex"):
        xs, ys = G.parse_wkt_polygon(polys[polys.key == name].geom_wkt.iloc[0])
        expect = G.points_in_polygon(lon, lat, xs, ys)
        got_mask = np.array([got.get(i) == name for i in range(400)])
        assert (got_mask == expect).all(), name


def test_caption_carries_county(spark, smoke_dir):
    """caption equality invariant: engine PIP fips == fips inside caption."""
    images = load_images(spark, smoke_dir)
    fp = with_footprint(images.select("image_id"))
    counties = pd.read_parquet(f"{smoke_dir}/counties.parquet")
    assigned = assign_points_to_polygons(spark, fp, counties, "fips")
    chk = (
        load_images(spark, smoke_dir)
        .join(assigned, "image_id")
        .withColumn("cap_fips", F.regexp_extract("caption", r"county (\d{5})", 1))
    )
    assert chk.where(F.col("cap_fips") != F.col("fips")).count() == 0
