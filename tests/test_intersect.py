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


def test_intersection_join_dataframe_fact_side(spark, smoke_dir):
    """J1 with the parcel side as a Spark DataFrame (the reference's
    150M-row fact table shape): identical output to the pandas-input
    path, and the physical plan shows the cover built DISTRIBUTED
    (mapInPandas over the parquet scan, no driver-side LocalTableScan
    of parcel covers)."""
    parcels_pd = pd.read_parquet(f"{smoke_dir}/parcels.parquet").head(60)
    cpolys = pd.read_parquet(f"{smoke_dir}/class_polygons.parquet")
    parcels_df = (
        spark.read.parquet(f"{smoke_dir}/parcels.parquet")
        .orderBy("parcel_id").limit(60)
        .select("parcel_id", "fips", "acres", "geom_wkt")
    )
    cols = ["parcel_id", "class_poly_id", "area_acres"]
    got_df = (
        intersection_join(spark, parcels_df, cpolys)
        .toPandas()[cols].sort_values(cols[:2]).reset_index(drop=True)
    )
    got_pd = (
        intersection_join(spark, parcels_pd, cpolys)
        .toPandas()[cols].sort_values(cols[:2]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_df, got_pd)

    from biomass_processing_pipeline_spark.operators.intersect import (
        parcel_cover_distributed,
    )

    cover = parcel_cover_distributed(
        spark.read.parquet(f"{smoke_dir}/parcels.parquet")
    )
    plan = cover._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Scan parquet" in plan  # cover is derived from the scan...
    assert "LocalTableScan" not in plan  # ...not a driver-built table


def test_intersection_join_df_input_validates_in_executor(spark):
    """Self-intersecting rings on the DataFrame fact side must fail the
    job loudly at action time (the gate runs inside the cover UDF)."""
    import pytest as _pytest

    parcels = spark.createDataFrame(pd.DataFrame([
        {"parcel_id": "bad", "fips": "06001", "acres": 1.0,
         "geom_wkt": "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"},
    ]))
    cpolys = pd.DataFrame([
        {"class_poly_id": 1, "class_code": 1,
         "geom_wkt": "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"},
    ])
    with _pytest.raises(Exception, match="self-intersecting"):
        intersection_join(spark, parcels, cpolys).collect()


def test_intersection_join_mixed_routing(spark):
    """auto routing with a MIX of rectangular and concave parcels against
    a mix of rectangular and concave class polys: rect x rect pairs take
    the native piecewise path, everything else the clip UDF — results
    match whole-geometry brute force for every pair."""
    # small latitude extents: the native piecewise path converts deg^2 to
    # acres per piece; whole-geometry intersection_acres converts once —
    # the cos(lat) spread across 0.2 deg keeps them within ~1e-5 relative
    DART = ("POLYGON ((0 0, 0.16 0, 0.16 0.16, 0.08 0.06, 0 0.16, 0 0))")
    RECT = "POLYGON ((0.04 0.04, 0.12 0.04, 0.12 0.12, 0.04 0.12, 0.04 0.04))"
    LSHAPE = ("POLYGON ((0.16 0, 0.28 0, 0.28 0.12, 0.24 0.12, "
              "0.24 0.04, 0.16 0.04, 0.16 0))")
    TRI = "POLYGON ((0 0, 0.24 0, 0.12 0.14, 0 0))"
    BIGRECT = "POLYGON ((0 0, 0.2 0, 0.2 0.2, 0 0.2, 0 0))"
    parcels = spark.createDataFrame(pd.DataFrame([
        {"parcel_id": "rect", "fips": "06001", "acres": 10.0, "geom_wkt": RECT},
        {"parcel_id": "dart", "fips": "06001", "acres": 10.0, "geom_wkt": DART},
        {"parcel_id": "ell", "fips": "06003", "acres": 10.0, "geom_wkt": LSHAPE},
    ]))
    cpolys = pd.DataFrame([
        {"class_poly_id": 1, "class_code": 1, "geom_wkt": BIGRECT},
        {"class_poly_id": 2, "class_code": 5, "geom_wkt": TRI},
    ])
    got = (
        intersection_join(spark, parcels, cpolys, min_acres=1.0)
        .toPandas().set_index(["parcel_id", "class_poly_id"])["area_acres"]
    )
    for pid, w in (("rect", RECT), ("dart", DART), ("ell", LSHAPE)):
        for cid, cw in ((1, BIGRECT), (2, TRI)):
            exp = G.intersection_acres(G.parse_wkt(cw), G.parse_wkt(w))
            if exp >= 1.0:
                assert np.isclose(got.loc[(pid, cid)], exp, rtol=1e-5), (pid, cid)
            else:
                assert (pid, cid) not in got.index


def test_intersection_join_multicell_anchor_dedup(spark):
    """Piece pairs that share MANY cover cells must be counted once.

    Candidate dedup is the map-side anchor-cell (reference-point) filter —
    a pair sharing M cover cells leaves the equi-join M times and only the
    row on the bbox-intersection-corner cell survives. 2-degree rects at
    the default level-10 lattice (0.35-degree cells) overlap across dozens
    of shared cells, so a duplicate-kept pair would inflate area_acres by
    an integer factor and the closed-form oracle would catch it."""
    prows, crows = [], []
    for i, (x0, y0) in enumerate([(0.0, 0.0), (1.0, 0.5), (0.5, 1.0)]):
        x1, y1 = x0 + 2.0, y0 + 2.0
        prows.append({
            "parcel_id": f"p{i}", "fips": "06001", "acres": 1.0,
            "minx": x0, "miny": y0, "maxx": x1, "maxy": y1,
            "geom_wkt": (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                         f"{x0} {y1}, {x0} {y0}))"),
        })
    for j, (x0, y0) in enumerate([(0.2, 0.1), (1.3, 1.2)]):
        x1, y1 = x0 + 1.5, y0 + 1.5
        crows.append({
            "class_poly_id": j + 1, "class_code": 1,
            "minx": x0, "miny": y0, "maxx": x1, "maxy": y1,
            "geom_wkt": (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                         f"{x0} {y1}, {x0} {y0}))"),
        })
    parcels = pd.DataFrame(prows)
    cpolys = pd.DataFrame(crows)
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
    assert len(got) == len(exp) and len(exp) == 6  # every pair overlaps
    assert np.allclose(got.area_acres.values, exp.area_acres.values, rtol=1e-6)


def test_intersection_join_plan_has_no_dedup_shuffle(spark):
    """The candidate stream must reach the area math without a
    dropDuplicates aggregate: no HashAggregate in the plan may key on the
    piece-pair columns (the former dedup shuffled the full cell x
    piece-pair stream — 122M rows at the sf1 tier — before any math)."""
    parcels = spark.createDataFrame(pd.DataFrame([{
        "parcel_id": "p0", "fips": "06001", "acres": 1.0,
        "geom_wkt": "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    }]))
    cpolys = pd.DataFrame([{
        "class_poly_id": 1, "class_code": 1,
        "geom_wkt": "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))",
    }])
    out = intersection_join(spark, parcels, cpolys, method="native")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "HashAggregate(keys=" in line:
            keys = line.split("HashAggregate(keys=[")[1].split("]")[0]
            assert "c_piece" not in keys and "piece" not in keys, line
    # and the anchor filter itself must be present as a pure-column
    # predicate: per-axis floor(greatest(...)) equality against the
    # cover's decoded lattice coords — NOT a Morton re-encode ("shiftleft"
    # would mean the self-duplicating interleave tree is back in the
    # filter, which measured ~50us/row interpreted at the sf1 tier)
    assert "greatest(p_minx" in plan and "cell_ix" in plan
    assert "shiftleft" not in plan


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


def test_intersection_join_level_independent(spark, smoke_dir):
    """The cover lattice level is an internal tuning knob: the anchor-cell
    (reference-point) filter must keep exactly one candidate per piece pair
    at ANY level, so the operator's OUTPUT is level-invariant. A
    level-dependent survivor rule — wrong corner cell, an off-by-one in the
    decoded lattice coords, or a pair whose anchor cell is missing from one
    side's cover — would drop pairs or double-count areas at some level.

    Two shapes of stress: the smoke fixtures (volume; rect fast path) at
    coarse->fine levels, and the concave mixed-routing set (general clip
    path) at levels where the 0.28-degree geometries span 1 vs ~7 cells
    per axis."""
    parcels = pd.read_parquet(f"{smoke_dir}/parcels.parquet").head(40)
    cpolys = pd.read_parquet(f"{smoke_dir}/class_polygons.parquet")
    outs = {}
    for level in (8, 10, 12):
        outs[level] = (
            intersection_join(spark, parcels, cpolys, level=level)
            .toPandas()
            .sort_values(["parcel_id", "class_poly_id"])
            .reset_index(drop=True)
        )
    base = outs[10]
    assert len(base) > 0
    for level in (8, 12):
        got = outs[level]
        assert len(got) == len(base), level
        assert (got.parcel_id.values == base.parcel_id.values).all(), level
        assert (got.class_poly_id.values == base.class_poly_id.values).all()
        # identical per-pair math at every level; only float summation
        # order across pieces may differ
        assert np.allclose(got.area_acres.values, base.area_acres.values,
                           rtol=1e-9), level

    DART = "POLYGON ((0 0, 0.16 0, 0.16 0.16, 0.08 0.06, 0 0.16, 0 0))"
    LSHAPE = ("POLYGON ((0.16 0, 0.28 0, 0.28 0.12, 0.24 0.12, "
              "0.24 0.04, 0.16 0.04, 0.16 0))")
    TRI = "POLYGON ((0 0, 0.24 0, 0.12 0.14, 0 0))"
    BIGRECT = "POLYGON ((0 0, 0.2 0, 0.2 0.2, 0 0.2, 0 0))"
    parcels2 = pd.DataFrame([
        {"parcel_id": "dart", "fips": "06001", "acres": 10.0, "geom_wkt": DART},
        {"parcel_id": "ell", "fips": "06003", "acres": 10.0, "geom_wkt": LSHAPE},
    ])
    cpolys2 = pd.DataFrame([
        {"class_poly_id": 1, "class_code": 1, "geom_wkt": BIGRECT},
        {"class_poly_id": 2, "class_code": 5, "geom_wkt": TRI},
    ])
    ref = None
    for level in (10, 13):
        got = (
            intersection_join(spark, parcels2, cpolys2, level=level,
                              min_acres=1.0)
            .toPandas()
            .sort_values(["parcel_id", "class_poly_id"])
            .reset_index(drop=True)
        )
        if ref is None:
            ref = got
            assert len(ref) > 0
        else:
            assert (got.parcel_id.values == ref.parcel_id.values).all()
            assert np.allclose(got.area_acres.values, ref.area_acres.values,
                               rtol=1e-9)
