import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.knn import (
    knn_join,
    knn_weighted_agg_fused,
)
from biomass_processing_pipeline_spark.operators.pip import (
    assign_points_to_polygons,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def test_knn_empty_points(spark, smoke_dir):
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    empty = with_footprint(
        load_images(spark, smoke_dir).select("image_id")
    ).where(F.lit(False))
    assert knn_join(empty, plots, k=5).count() == 0
    assert knn_weighted_agg_fused(empty, plots, ["attr_1"], k=5).count() == 0


def test_knn_fewer_targets_than_k(spark, smoke_dir):
    pts = with_footprint(
        load_images(spark, smoke_dir).select("image_id")
    ).limit(5)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet").limit(3)
    out = knn_join(pts, plots, k=50).toPandas()
    # every point gets all 3 available neighbors via the exact fallback
    assert (out.groupby("image_id").size() == 3).all()
    assert out["rank"].max() == 3


def test_pip_points_outside_all_polygons(spark, smoke_dir):
    import numpy as np

    from biomass_processing_pipeline_spark import cells

    counties = pd.read_parquet(f"{smoke_dir}/counties.parquet")
    lon = np.array([0.0, 50.0])  # far outside the fixture extent
    lat = np.array([0.0, 50.0])
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 2], "lon": lon, "lat": lat,
        "cell_id": cells.cell_id_np(lon, lat, cells.DEFAULT_LEVEL),
    }))
    out = assign_points_to_polygons(spark, pts, counties, "fips", point_key="pid")
    assert out.count() == 0  # dropped, not misassigned


def test_malformed_image_id_quarantines_to_null_footprint(spark):
    """A malformed image_id must parse to NULL tx/ty/seq/lon/lat/cell_id
    (dropping out of the spatial equi-joins) — under Spark 4 ANSI the
    former plain cast raised CAST_INVALID_INPUT and one bad name killed
    the whole footprint pass. Well-formed rows are untouched."""
    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark.sources.images import with_footprint

    ids = spark.createDataFrame(
        [("T34_B02_20200101_00000042",),
         ("not-a-valid-id",),
         ("T34_B02_oops_notanumber",)],
        "image_id string")
    got = with_footprint(ids).toPandas().set_index("image_id")
    good = got.loc["T34_B02_20200101_00000042"]
    assert good.tx == 3 and good.ty == 4 and good.seq == 42
    assert np.isfinite(good.lon) and pd.notna(good.cell_id)
    for bad in ["not-a-valid-id", "T34_B02_oops_notanumber"]:
        row = got.loc[bad]
        assert pd.isna(row.seq) and pd.isna(row.lon) and pd.isna(row.lat)
        assert pd.isna(row.cell_id)


def test_huge_seq_hashes_int64_exact(spark):
    """A seq above 2^53 must hash exactly: the offset UDF used to route
    tx/ty/seq through a float64 hop (NULL-masking via NaN), so
    9007199254740993 silently became ...992 before splitmix64 — a wrong
    lon/lat with no error. The coalesce+flag protocol keeps the Arrow
    column int64 end to end, even in a batch that ALSO carries a
    malformed (NULL-seq) row — one NULL used to coerce the whole column
    to float64 for every sibling."""
    import pandas as pd

    from biomass_processing_pipeline_spark.sources.images import with_footprint
    from biomass_processing_pipeline_spark.synth import tile_offset_np

    big = 9007199254740993  # 2^53 + 1: not representable in float64
    ids = spark.createDataFrame(
        [(f"T34_B02_20200101_{big}",), ("not-a-valid-id",)],
        "image_id string").coalesce(1)
    # collect(), not toPandas(): pandas itself would float64-coerce the
    # NULL-bearing seq column and mask exactly the bug under test
    got = {r.image_id: r for r in with_footprint(ids).collect()}
    row = got[f"T34_B02_20200101_{big}"]
    assert row.seq == big
    want_lon, want_lat = tile_offset_np(
        np.array([3], dtype=np.int64), np.array([4], dtype=np.int64),
        np.array([big], dtype=np.int64))
    assert row.lon == want_lon[0] and row.lat == want_lat[0]
    assert got["not-a-valid-id"].lon is None
