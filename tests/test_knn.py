import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.knn import (
    distance_weighted_agg,
    knn_join,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def _points(spark, smoke_dir, n=200):
    images = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    gold_ids = (
        pd.read_parquet(f"{smoke_dir}/golden_knn.parquet")["image_id"].unique()[:n]
    )
    ids_df = spark.createDataFrame(pd.DataFrame({"image_id": gold_ids}))
    return images.join(F.broadcast(ids_df), "image_id")


def test_knn_matches_bruteforce_golden(spark, smoke_dir):
    points = _points(spark, smoke_dir)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    got = knn_join(points, plots, k=50).toPandas()
    gold = pd.read_parquet(f"{smoke_dir}/golden_knn.parquet")
    g = got.sort_values(["image_id", "rank"]).reset_index(drop=True)
    e = gold.sort_values(["image_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g.image_id == e.image_id).all()
    assert (g.plot_cn == e.plot_cn).all()
    assert np.allclose(g.distance, e.distance, atol=1e-12)


def test_distance_weighted_agg_matches_manual(spark, smoke_dir):
    points = _points(spark, smoke_dir, n=20)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    knn = knn_join(points, plots, k=10)
    agg = distance_weighted_agg(knn, plots, ["attr_1", "attr_2"]).toPandas()
    kpdf = knn.toPandas().merge(
        pd.read_parquet(f"{smoke_dir}/plots.parquet"), on="plot_cn"
    )
    for _, row in agg.iterrows():
        sub = kpdf[kpdf.image_id == row.image_id]
        w = 1.0 / (sub.distance + 0.01)
        assert abs(row.w_attr_1 - (w * sub.attr_1).sum() / w.sum()) < 1e-9
        assert abs(row.w_attr_2 - (w * sub.attr_2).sum() / w.sum()) < 1e-9
        assert row.n_neighbors == 10
