import numpy as np
import pandas as pd

from biomass_processing_pipeline_spark import geometry as G
from biomass_processing_pipeline_spark.operators.intersect import (
    crop_coeff_df,
    crop_rollup,
    intersection_join,
    parcel_crop_summary,
)
from biomass_processing_pipeline_spark.synth import URBAN_CODES


def _oracle_pairs(parcels, cpolys, min_acres=0.01):
    """Brute-force rect x rect intersection areas (closed form)."""
    rows = []
    for p in parcels.itertuples(index=False):
        for c in cpolys.itertuples(index=False):
            ix0, iy0 = max(p.minx, c.minx), max(p.miny, c.miny)
            ix1, iy1 = min(p.maxx, c.maxx), min(p.maxy, c.maxy)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            xs = np.array([ix0, ix1, ix1, ix0])
            ys = np.array([iy0, iy0, iy1, iy1])
            acres = G.approx_area_acres(xs, ys)
            if acres >= min_acres and c.class_code not in URBAN_CODES:
                rows.append((p.parcel_id, int(c.class_poly_id), acres))
    return pd.DataFrame(rows, columns=["parcel_id", "class_poly_id", "area_acres"])


def test_intersection_join_exact_vs_closed_form(spark, smoke_dir):
    parcels = pd.read_parquet(f"{smoke_dir}/parcels.parquet").head(60)
    cpolys = pd.read_parquet(f"{smoke_dir}/class_polygons.parquet")
    got = (
        intersection_join(spark, parcels, cpolys)
        .toPandas()
        .sort_values(["parcel_id", "class_poly_id"])
        .reset_index(drop=True)
    )
    exp = (
        _oracle_pairs(parcels, cpolys)
        .sort_values(["parcel_id", "class_poly_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got.parcel_id.values == exp.parcel_id.values).all()
    # rtol 1e-6: the approx-acre formula's cos(mean(lat)) factor depends on
    # the vertex list; the clipper may emit duplicate vertices vs the
    # closed-form rect, shifting mean(lat) by ~1e-8 relative.
    assert np.allclose(got.area_acres.values, exp.area_acres.values, rtol=1e-6)
    assert not got.class_code.isin(URBAN_CODES).any()


def test_crop_rollup_and_dominant(spark, smoke_dir):
    parcels = pd.read_parquet(f"{smoke_dir}/parcels.parquet").head(60)
    cpolys = pd.read_parquet(f"{smoke_dir}/class_polygons.parquet")
    inter = intersection_join(spark, parcels, cpolys)
    rollup = crop_rollup(inter, crop_coeff_df(spark))
    summary = parcel_crop_summary(rollup).toPandas()
    rpdf = rollup.toPandas()
    for _, row in summary.iterrows():
        sub = rpdf[rpdf.parcel_id == row.parcel_id]
        assert abs(row.crop_acres - sub.area_acres.sum()) < 1e-9
        assert abs(row.total_yield_tons - sub.yield_tons.sum()) < 1e-9
        per = sub.groupby("class_code").area_acres.sum()
        best = per[per == per.max()].index.min()
        assert row.dominant_crop == best
    # yield math: yield = acres * rate
    one = rpdf.iloc[0]
    from biomass_processing_pipeline_spark.operators.intersect import CROP_COEFFS

    y, r, m, h = CROP_COEFFS[one.class_code]
    assert abs(one.yield_tons - one.area_acres * y) < 1e-9
    assert abs(one.harvestable_tons - one.area_acres * y * r * (1 - m) * h) < 1e-9
