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
