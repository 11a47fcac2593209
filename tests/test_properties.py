"""Property-based tests (hypothesis) for the pure math kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biomass_processing_pipeline_spark import cells, imaging, synth
from biomass_processing_pipeline_spark import geometry as G

lons = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=89.999999, allow_nan=False)
levels = st.integers(min_value=1, max_value=20)


@given(lons, lats, levels)
@settings(max_examples=200, deadline=None)
def test_cell_encode_decode_roundtrip(lon, lat, level):
    c = cells.cell_id_np(np.array([lon]), np.array([lat]), level)
    ix, iy = cells.decode_np(c)
    ix0, iy0 = cells.ixy_np(np.array([lon]), np.array([lat]), level)
    assert ix[0] == ix0[0] and iy[0] == iy0[0]
    assert cells.cell_id_py(lon, lat, level) == c[0]
    # parent relation
    if level > 1:
        assert (c[0] >> 2) == cells.cell_id_np(
            np.array([lon]), np.array([lat]), level - 1
        )[0]


@given(lons, lats, levels)
@settings(max_examples=100, deadline=None)
def test_cell_bounds_contain_point(lon, lat, level):
    c = cells.cell_id_np(np.array([lon]), np.array([lat]), level)
    minx, miny, maxx, maxy = cells.cell_bounds_np(c, level)
    assert minx[0] - 1e-9 <= lon <= maxx[0] + 1e-9
    assert miny[0] - 1e-9 <= lat <= maxy[0] + 1e-9


rect = st.tuples(
    st.floats(-50, 50), st.floats(-50, 50),
    st.floats(0.1, 40), st.floats(0.1, 40),
)


@given(rect, rect)
@settings(max_examples=200, deadline=None)
def test_clip_matches_closed_form_rects(r1, r2):
    x1, y1, w1, h1 = r1
    x2, y2, w2, h2 = r2
    sx = np.array([x1, x1 + w1, x1 + w1, x1])
    sy = np.array([y1, y1, y1 + h1, y1 + h1])
    cx = np.array([x2, x2 + w2, x2 + w2, x2])
    cy = np.array([y2, y2, y2 + h2, y2 + h2])
    got = G.intersection_area(sx, sy, cx, cy)
    iw = max(0.0, min(x1 + w1, x2 + w2) - max(x1, x2))
    ih = max(0.0, min(y1 + h1, y2 + h2) - max(y1, y2))
    assert abs(got - iw * ih) < 1e-6 * max(1.0, iw * ih)


@given(rect)
@settings(max_examples=100, deadline=None)
def test_pip_rect_membership(r1):
    x, y, w, h = r1
    xs = np.array([x, x + w, x + w, x])
    ys = np.array([y, y, y + h, y + h])
    px = np.array([x + w / 2, x - 1.0, x + w + 1.0])
    py = np.array([y + h / 2, y + h / 2, y + h / 2])
    inside = G.points_in_polygon(px, py, xs, ys)
    assert inside.tolist() == [True, False, False]


@given(st.integers(min_value=0, max_value=10**9),
       st.sampled_from([16, 32, 48]), st.sampled_from([16, 32]))
@settings(max_examples=30, deadline=None)
def test_codec_roundtrip_random_images(seq, w, h):
    px = synth.image_pixels(seq, w, h)
    for fmt in ("raw", "png"):
        assert (imaging.decode_image(imaging.encode_image(px, fmt)) == px).all()
    lossy = imaging.decode_image(imaging.encode_image(px, "jpeg"))
    assert imaging.psnr(px, lossy) >= 40.0


@given(st.lists(st.floats(-180, 180, allow_nan=False), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_mix64_deterministic_and_uniform_ish(vals):
    z = np.array([abs(int(v * 1e6)) for v in vals], dtype=np.uint64)
    a = synth.mix64(z)
    b = synth.mix64(z)
    assert (a == b).all()
    u = synth.u01(z)
    assert ((u >= 0) & (u < 1)).all()
