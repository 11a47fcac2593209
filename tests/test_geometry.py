import numpy as np

from biomass_processing_pipeline_spark import geometry as G


def test_wkt_roundtrip():
    xs = np.array([0.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0])
    wkt = G.polygon_wkt(xs, ys)
    xs2, ys2 = G.parse_wkt_polygon(wkt)
    assert np.allclose(xs, xs2) and np.allclose(ys, ys2)


def test_pip_square_and_concave():
    xs, ys = G.parse_wkt_polygon("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    inside = G.points_in_polygon(
        np.array([1.0, 3.0, -0.5]), np.array([1.0, 1.0, 1.0]), xs, ys
    )
    assert inside.tolist() == [True, False, False]
    # L-shape: notch must be outside
    lx, ly = G.parse_wkt_polygon("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))")
    got = G.points_in_polygon(
        np.array([0.5, 2.0, 2.0]), np.array([2.0, 0.5, 2.0]), lx, ly
    )
    assert got.tolist() == [True, True, False]


def test_shoelace_and_acres():
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([40.0, 40.0, 41.0, 41.0])
    assert abs(G.shoelace_area(xs, ys) - 1.0) < 1e-12
    acres = G.approx_area_acres(xs, ys)
    # 1 deg^2 at lat 40.5: 111320^2 * cos(40.5deg) m2 -> acres
    expect = 111320.0**2 * np.cos(np.radians(40.5)) * G.ACRES_PER_M2
    assert abs(acres - expect) < 1e-6


def test_intersection_area_rects_and_concave():
    sx, sy = G.parse_wkt_polygon("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    cx = np.array([1.0, 3.0, 3.0, 1.0])
    cy = np.array([1.0, 1.0, 3.0, 3.0])
    assert abs(G.intersection_area(sx, sy, cx, cy) - 1.0) < 1e-12
    # concave subject clipped by convex square
    lx, ly = G.parse_wkt_polygon("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))")
    clip_x = np.array([0.0, 2.0, 2.0, 0.0])
    clip_y = np.array([0.0, 0.0, 2.0, 2.0])
    assert abs(G.intersection_area(lx, ly, clip_x, clip_y) - 3.0) < 1e-12
    # disjoint
    far_x = np.array([10.0, 11.0, 11.0, 10.0])
    assert G.intersection_area(sx, sy, far_x, clip_y) == 0.0


def test_bounds_and_validity():
    assert G.bounds_intersect((0, 0, 2, 2), (1, 1, 3, 3))
    assert not G.bounds_intersect((0, 0, 1, 1), (2, 2, 3, 3))
    assert G.valid_lonlat(-92.0, 40.0)
    assert not G.valid_lonlat(-192.0, 40.0)
    assert G.is_valid_ring(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    assert not G.is_valid_ring(np.array([0.0, 1.0]), np.array([0.0, 0.0]))
