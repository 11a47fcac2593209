import math

import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import functions as BF


def test_haversine_known_distance(spark):
    # Chicago (-87.63, 41.88) to St. Louis (-90.20, 38.63) ~ 420 km
    df = spark.createDataFrame(
        pd.DataFrame({"lon1": [-87.63], "lat1": [41.88],
                      "lon2": [-90.20], "lat2": [38.63]})
    )
    got = df.select(
        BF.haversine_km(F.col("lon1"), F.col("lat1"),
                        F.col("lon2"), F.col("lat2")).alias("d")
    ).collect()[0].d
    assert abs(got - 421) < 5


def test_utm_and_bands(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"lon": [-90.0, 0.5], "lat": [40.0, -10.0]})
    )
    out = df.select(
        BF.utm_zone(F.col("lon")).alias("z"),
        BF.utm_epsg(F.col("lon"), F.col("lat")).alias("e"),
        BF.lat_band(F.col("lat")).alias("b"),
        BF.worldcover_tile_name(F.col("lon"), F.col("lat")).alias("wc"),
        BF.mgrs_like_tile_id(F.col("lon"), F.col("lat")).alias("m"),
    ).collect()
    assert out[0].z == 16 and out[0].e == 32616 and out[0].b == "T"
    assert out[0].wc == "N39W090" and out[0].m == "16T"
    assert out[1].e == 32731  # southern hemisphere
    assert out[1].wc == "S12E000"


def test_forest_math_and_confidence(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ag": [10.0], "bg": [2.0], "bole": [5.0],
                      "sawlog": [3.0], "stem": [2.0], "branch": [1.0],
                      "foliage": [0.5], "stump": [0.2]})
    )
    r = df.select(
        BF.standing_biomass(F.col("ag"), F.col("bg")).alias("standing"),
        BF.harvestable_biomass(F.col("bole"), F.col("sawlog"),
                               F.col("stem")).alias("harv"),
        BF.residue_biomass(F.col("branch"), F.col("foliage"), F.col("stump"),
                           F.col("stem")).alias("res"),
        BF.confidence_score(F.lit(2), F.lit(85.0), F.lit(0.4)).alias("conf"),
    ).collect()[0]
    assert r.standing == 12.0
    assert abs(r.harv - (5 + 3 + 0.8 * 2)) < 1e-12
    assert abs(r.res - (1 + 0.5 + 0.2 + 0.2 * 2)) < 1e-12
    assert abs(r.conf - round((0.8 + 0.8 + 0.7) / 3, 3)) < 1e-9
