"""Pure-numpy geometry kernel (no shapely in this sandbox).

Covers the subset of geometry the engine needs, mirroring the reference's
``src/utils/geometry_utils_v1.py`` semantics:

- WKT POLYGON parse/format (exterior ring only — fixtures are simple polys)
- vectorized ray-casting point-in-polygon (J7 in SURVEY.md §2.3)
- Sutherland–Hodgman clipping for polygon×polygon intersection *area*
  (J1; clip polygon must be convex — parcels in our fixtures are)
- shoelace area + the reference's approximate acre formula
  (``geometry_utils_v1.py:55-83``: deg^2 * 111320^2 * cos(lat) * 0.000247105)
- bbox / centroid / validity helpers

PIP edge rule (documented per SURVEY.md §7.1): a point exactly on a
polygon edge counts as *inside* (the crossing test uses half-open
[ymin, ymax) intervals, and fixtures jitter points off borders so the
rule is never load-bearing for goldens).
"""

from __future__ import annotations

import re

import numpy as np

_WKT_POLY_RE = re.compile(r"POLYGON\s*\(\(\s*(.*?)\s*\)\)", re.IGNORECASE | re.DOTALL)

# the reference's published conversion is 0.000247105 m2->acres
# (crop_analyzer_v3.py:175 etc.); the inverse is DERIVED from it so
# acres<->m2 round-trips are exact across the whole engine
ACRES_PER_M2 = 0.000247105
M2_PER_ACRE = 1.0 / ACRES_PER_M2
DEG_M = 111320.0


def parse_wkt_polygon(wkt: str) -> tuple[np.ndarray, np.ndarray]:
    """WKT POLYGON -> (xs, ys) float64 arrays of the exterior ring.

    The closing vertex (== first) is dropped if present.
    """
    m = _WKT_POLY_RE.search(wkt)
    if not m:
        raise ValueError(f"not a simple POLYGON wkt: {wkt[:60]!r}")
    pts = [p.strip().split() for p in m.group(1).split(",")]
    arr = np.array([[float(a), float(b)] for a, b in pts], dtype=np.float64)
    if len(arr) > 1 and np.allclose(arr[0], arr[-1]):
        arr = arr[:-1]
    return arr[:, 0].copy(), arr[:, 1].copy()


def polygon_wkt(xs: np.ndarray, ys: np.ndarray) -> str:
    pts = ", ".join(f"{x:.9f} {y:.9f}" for x, y in zip(xs, ys))
    first = f"{xs[0]:.9f} {ys[0]:.9f}"
    return f"POLYGON (({pts}, {first}))"


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd ray casting: is each (px, py) inside ring (xs, ys)?

    All points tested against one polygon per call (the polygon dictionary is
    broadcast; points come in Arrow batches). O(n_points * n_vertices) numpy.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0, y0 = xs, ys
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    inside = np.zeros(len(px), dtype=bool)
    for i in range(len(xs)):
        ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
        # half-open in y avoids double-counting at shared vertices
        cond = (ay <= py) != (by <= py)
        if not cond.any():
            continue
        t = (py - ay) / (by - ay)  # safe: cond implies ay != by
        cross_x = ax + t * (bx - ax)
        inside ^= cond & (px < cross_x)
    return inside


def shoelace_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed-magnitude polygon area in coordinate units^2."""
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    return float(abs(np.sum(xs * y1 - x1 * ys)) / 2.0)


def approx_area_acres(xs: np.ndarray, ys: np.ndarray) -> float:
    """The reference's approximate degree->acre formula
    (``geometry_utils_v1.py:55-83``), kept bit-identical for parity."""
    deg2 = shoelace_area(xs, ys)
    lat = float(np.mean(ys))
    m2 = deg2 * DEG_M * DEG_M * np.cos(np.radians(lat))
    return m2 * ACRES_PER_M2


def clip_polygon_convex(
    sx: np.ndarray, sy: np.ndarray, cx: np.ndarray, cy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman: clip subject ring (sx, sy) by CONVEX ring (cx, cy).

    Clip ring must be counter-clockwise. Returns the (possibly empty)
    intersection ring. Used for exact intersection areas in J1.
    """
    out_x, out_y = list(sx), list(sy)
    n = len(cx)
    for i in range(n):
        ax, ay = cx[i], cy[i]
        bx, by = cx[(i + 1) % n], cy[(i + 1) % n]
        in_x, in_y = out_x, out_y
        out_x, out_y = [], []
        m = len(in_x)
        if m == 0:
            break
        for j in range(m):
            px_, py_ = in_x[j], in_y[j]
            qx_, qy_ = in_x[(j + 1) % m], in_y[(j + 1) % m]
            p_in = (bx - ax) * (py_ - ay) - (by - ay) * (px_ - ax) >= 0
            q_in = (bx - ax) * (qy_ - ay) - (by - ay) * (qx_ - ax) >= 0
            if p_in:
                out_x.append(px_)
                out_y.append(py_)
            if p_in != q_in:
                denom = (bx - ax) * (qy_ - py_) - (by - ay) * (qx_ - px_)
                if denom != 0:
                    t = ((bx - ax) * (ay - py_) - (by - ay) * (ax - px_)) / denom
                    out_x.append(px_ + t * (qx_ - px_))
                    out_y.append(py_ + t * (qy_ - py_))
    return np.array(out_x, dtype=np.float64), np.array(out_y, dtype=np.float64)


def intersection_area(
    sx: np.ndarray, sy: np.ndarray, cx: np.ndarray, cy: np.ndarray
) -> float:
    """Intersection area (deg^2) of subject ring with convex clip ring."""
    ix, iy = clip_polygon_convex(sx, sy, ensure_ccw(cx, cy)[0], ensure_ccw(cx, cy)[1])
    if len(ix) < 3:
        return 0.0
    return shoelace_area(ix, iy)


def ensure_ccw(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    signed = np.sum(xs * y1 - x1 * ys) / 2.0
    if signed < 0:
        return xs[::-1].copy(), ys[::-1].copy()
    return xs, ys


def bbox(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def bounds_intersect(
    a: tuple[float, float, float, float], b: tuple[float, float, float, float]
) -> bool:
    """Rectangle-overlap test (reference ``coordinate_utils_v3.py:231-248``)."""
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def is_rectilinear(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff every edge is axis-parallel."""
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    return bool(np.all((xs == x1) | (ys == y1)))


def decompose_rectilinear(xs: np.ndarray, ys: np.ndarray) -> list[tuple[float, float, float, float]]:
    """Partition a simple rectilinear polygon into axis-aligned rectangles.

    Horizontal-slab scanline: cut at every distinct y, find the x-intervals
    inside the polygon at each slab's midline (even-odd crossings of the
    vertical edges). Exact for rectilinear rings; lets point-in-polygon be a
    pure bbox test (no UDF) — the engine's fast path for gridded county /
    tile dictionaries.
    """
    ycuts = np.unique(ys)
    out: list[tuple[float, float, float, float]] = []
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    vert = xs == x1  # vertical edges
    for y0v, y1v in zip(ycuts[:-1], ycuts[1:]):
        mid = (y0v + y1v) / 2.0
        # vertical edges spanning the midline
        lo = np.minimum(ys, y1)
        hi = np.maximum(ys, y1)
        crossing = vert & (lo <= mid) & (hi > mid)
        cx = np.sort(xs[crossing])
        for a, b in zip(cx[0::2], cx[1::2]):
            out.append((float(a), float(y0v), float(b), float(y1v)))
    return out


def is_valid_ring(xs: np.ndarray, ys: np.ndarray) -> bool:
    """Minimal validity: >=3 distinct vertices, finite, nonzero area."""
    if len(xs) < 3 or not (np.isfinite(xs).all() and np.isfinite(ys).all()):
        return False
    return shoelace_area(xs, ys) > 0.0


def valid_lonlat(lon: float, lat: float) -> bool:
    """Reference ``geometry_utils_v1.py:187-198``."""
    return -180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0
