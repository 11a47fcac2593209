import pandas as pd

from biomass_processing_pipeline_spark.operators.tile_assign import (
    assign_images_to_tiles,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def test_tile_assignment_matches_closed_form_golden(spark, smoke_dir):
    images = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    tiles = pd.read_parquet(f"{smoke_dir}/tiles.parquet")
    got = (
        assign_images_to_tiles(spark, images, tiles)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    gold = (
        pd.read_parquet(f"{smoke_dir}/golden_image_tile.parquet")
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(gold)
    merged = gold.merge(got, on="image_id", suffixes=("_g", "_e"))
    assert (merged.tile_code_g == merged.tile_code_e).all()
