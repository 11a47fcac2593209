"""Pure-numpy geometry kernel (no shapely in this sandbox).

Covers the subset of geometry the engine needs, mirroring the reference's
``src/utils/geometry_utils_v1.py`` semantics:

- WKT POLYGON/MULTIPOLYGON parse/format incl. holes; GeoJSON conversion
- vectorized ray-casting point-in-polygon (J7 in SURVEY.md §2.3), even-odd
  across rings so holes/multipolygons work
- polygon×polygon intersection *area* (J1) for GENERAL geometry:
  Sutherland–Hodgman against a convex side when one exists, ear-clipped
  triangulation of the clip ring otherwise, inclusion–exclusion for holes
- make_valid / simplify (Douglas–Peucker) / buffer (round joins) analogues
  of geometry_utils_v1.py:34-160
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
# acres<->m2 round-trips are exact across the whole engine. (The
# reference ALSO uses a literal 4047 m2/acre inside its SQL min-area
# predicate, database_manager_v3.py:187 — that filter is expressed in
# acres directly here, so the literal never enters this engine's math;
# documented to keep the F2 parity question settled.)
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
    # slice-based edges (np.roll allocates twice; this path runs per
    # polygon in serial driver-side dictionary builds)
    inner = np.all((xs[:-1] == xs[1:]) | (ys[:-1] == ys[1:]))
    return bool(inner and (xs[-1] == xs[0] or ys[-1] == ys[0]))


def is_bbox_rectangle(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff the ring is exactly its own bbox (a 4-vertex axis-aligned
    rectangle) — the vectorized cover fast path."""
    if len(xs) != 4 or not is_rectilinear(xs, ys):
        return False
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    if x0 == x1 or y0 == y1:
        return False
    return bool(np.all((xs == x0) | (xs == x1))
                and np.all((ys == y0) | (ys == y1)))


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


# ---------------------------------------------------------------------------
# general geometry: holes, multipolygons, concave×concave intersection
# (reference handles arbitrary PostGIS geometry via shapely,
# geometry_utils_v1.py:17-160 — this is the numpy-native equivalent)
# ---------------------------------------------------------------------------

Ring = tuple  # (xs, ys) numpy float64 arrays, unclosed
Geom = list   # list of polygons; polygon = [exterior_ring, hole_ring, ...]

_WKT_HEAD_RE = re.compile(r"^\s*(POLYGON|MULTIPOLYGON)\s*", re.IGNORECASE)


def _parse_ring(body: str) -> Ring:
    vals = np.fromiter(
        (float(x) for x in body.replace(",", " ").split()),
        dtype=np.float64,
    )
    arr = vals.reshape(-1, 2)
    if len(arr) > 1 and abs(arr[0, 0] - arr[-1, 0]) <= 1e-9 \
            and abs(arr[0, 1] - arr[-1, 1]) <= 1e-9:
        arr = arr[:-1]
    return arr[:, 0].copy(), arr[:, 1].copy()


def _depth_groups(s: str, target: int) -> list[str]:
    """Substrings enclosed by parens that OPEN at exactly ``target`` depth.

    Paren-depth scanner (whitespace-agnostic) — regex splitting on
    ')), ((' breaks on legal WKT with spaces between parens, silently
    regrouping MULTIPOLYGON rings (a second exterior absorbed as a hole).
    """
    out: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
            if depth == target:
                start = i + 1
        elif ch == ")":
            if depth == target:
                out.append(s[start:i])
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parens in wkt body: {s[:60]!r}")
    if depth != 0:
        raise ValueError(f"unbalanced parens in wkt body: {s[:60]!r}")
    return out


def parse_wkt(wkt: str) -> Geom:
    """WKT POLYGON (with holes) or MULTIPOLYGON -> list of polygons, each a
    list of (xs, ys) rings with ring 0 the exterior."""
    m = _WKT_HEAD_RE.match(wkt)
    if not m:
        raise ValueError(f"unsupported wkt: {wkt[:60]!r}")
    body = wkt[m.end():]
    if m.group(1).upper() == "POLYGON":
        # body = ((ring), (hole), ...): rings open at depth 2
        rings = [_parse_ring(r) for r in _depth_groups(body, 2)]
        if not rings:
            raise ValueError(f"no rings in wkt: {wkt[:60]!r}")
        return [rings]
    # MULTIPOLYGON body = (((ring), ...), ((ring), ...)): polygon parts
    # open at depth 2, their rings at depth 1 within each part
    polys: Geom = []
    for part in _depth_groups(body, 2):
        rings = [_parse_ring(r) for r in _depth_groups(part, 1)]
        if not rings:
            raise ValueError(f"empty polygon part in wkt: {wkt[:60]!r}")
        polys.append(rings)
    if not polys:
        raise ValueError(f"no rings in wkt: {wkt[:60]!r}")
    return polys


def geom_wkt(geom: Geom) -> str:
    """Inverse of parse_wkt (POLYGON when one part, else MULTIPOLYGON)."""
    def ring_s(r: Ring) -> str:
        xs, ys = r
        pts = ", ".join(f"{x:.9f} {y:.9f}" for x, y in zip(xs, ys))
        return f"({pts}, {xs[0]:.9f} {ys[0]:.9f})"

    parts = ["(" + ", ".join(ring_s(r) for r in poly) + ")" for poly in geom]
    if len(parts) == 1:
        return "POLYGON " + parts[0]
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


def geojson_to_geom(gj: dict) -> Geom:
    """GeoJSON Polygon/MultiPolygon dict -> Geom (reference round-trips the
    same structures through shapely, geometry_utils_v1.py:103-118)."""
    t = gj["type"].lower()
    def ring(c):
        arr = np.asarray(c, dtype=np.float64)
        if len(arr) > 1 and np.allclose(arr[0], arr[-1]):
            arr = arr[:-1]
        return arr[:, 0].copy(), arr[:, 1].copy()
    if t == "polygon":
        return [[ring(r) for r in gj["coordinates"]]]
    if t == "multipolygon":
        return [[ring(r) for r in poly] for poly in gj["coordinates"]]
    raise ValueError(f"unsupported geojson type {gj['type']!r}")


def geom_to_geojson(geom: Geom) -> dict:
    def ring(r: Ring):
        xs, ys = r
        coords = [[float(x), float(y)] for x, y in zip(xs, ys)]
        coords.append(coords[0])
        return coords
    if len(geom) == 1:
        return {"type": "Polygon",
                "coordinates": [ring(r) for r in geom[0]]}
    return {"type": "MultiPolygon",
            "coordinates": [[ring(r) for r in poly] for poly in geom]}


def signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    return float(np.sum(xs * y1 - x1 * ys) / 2.0)


def is_convex(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff the ring is convex (collinear vertices allowed)."""
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    x2, y2 = np.roll(xs, -2), np.roll(ys, -2)
    cross = (x1 - xs) * (y2 - y1) - (y1 - ys) * (x2 - x1)
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def centroid(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """Polygon (area-weighted) centroid, reference get_geometry_centroid."""
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    cr = xs * y1 - x1 * ys
    a = np.sum(cr) / 2.0
    if a == 0:
        return float(xs.mean()), float(ys.mean())
    return (float(np.sum((xs + x1) * cr) / (6 * a)),
            float(np.sum((ys + y1) * cr) / (6 * a)))


def triangulate(xs: np.ndarray, ys: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Ear-clipping triangulation of a simple CCW ring (collinear vertices
    are dropped first). O(n^2) — polygon dictionaries are small and
    driver/broadcast side, never per-row."""
    cleaned = make_valid_ring(xs, ys)
    if cleaned is None:
        return []
    xs, ys = ensure_ccw(*cleaned)
    idx = list(range(len(xs)))

    def cross(o: int, a: int, b: int) -> float:
        return ((xs[a] - xs[o]) * (ys[b] - ys[o])
                - (ys[a] - ys[o]) * (xs[b] - xs[o]))

    tris: list[tuple[np.ndarray, np.ndarray]] = []
    spin = 0
    while len(idx) > 3 and spin <= len(idx):
        n = len(idx)
        clipped = False
        for i in range(n):
            a, b, c = idx[(i - 1) % n], idx[i], idx[(i + 1) % n]
            if cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner: not an ear
            ear = True
            for j in idx:
                if j in (a, b, c):
                    continue
                if (cross(a, b, j) >= 0 and cross(b, c, j) >= 0
                        and cross(c, a, j) >= 0):
                    ear = False
                    break
            if ear:
                tris.append((np.array([xs[a], xs[b], xs[c]]),
                             np.array([ys[a], ys[b], ys[c]])))
                idx.pop(i)
                clipped = True
                spin = 0
                break
        if not clipped:
            spin += 1
            break  # numerically stuck: emit what's left as a fan (best effort)
    if len(idx) == 3:
        a, b, c = idx
        tris.append((np.array([xs[a], xs[b], xs[c]]),
                     np.array([ys[a], ys[b], ys[c]])))
    elif len(idx) > 3:
        for i in range(1, len(idx) - 1):
            a, b, c = idx[0], idx[i], idx[i + 1]
            tris.append((np.array([xs[a], xs[b], xs[c]]),
                         np.array([ys[a], ys[b], ys[c]])))
    return tris


def _ring_pair_acres(sx, sy, cx, cy) -> float:
    """Intersection area in ACRES of two arbitrary simple rings.

    Convex side (either) becomes the Sutherland–Hodgman clip ring — for
    convex clip this is EXACTLY the legacy path (bit-identical areas).
    Concave×concave: the clip ring is triangulated (triangles partition it)
    and the piece deg^2 areas sum EXACTLY; the deg^2 total is converted to
    acres ONCE with the mean latitude over all intersection vertices — the
    single-formula conversion the reference applies to a whole shapely
    intersection (a per-piece cos(lat) weighting would diverge ~1e-4 on
    degree-tall concave pairs). S–H on a concave subject emits zero-area
    bridge edges whose shoelace contribution cancels, so each piece's
    deg^2 is exact.
    """
    sx, sy = ensure_ccw(np.asarray(sx), np.asarray(sy))
    cx, cy = ensure_ccw(np.asarray(cx), np.asarray(cy))
    if is_convex(cx, cy):
        pieces = [(cx, cy)]
    elif is_convex(sx, sy):
        sx, sy, cx, cy = cx, cy, sx, sy
        pieces = [(cx, cy)]
    else:
        pieces = triangulate(cx, cy)
    deg2 = 0.0
    piece_ys: list[np.ndarray] = []
    for px_, py_ in pieces:
        ix, iy = clip_polygon_convex(sx, sy, px_, py_)
        if len(ix) >= 3:
            deg2 += shoelace_area(ix, iy)
            piece_ys.append(iy)
    if not piece_ys:
        return 0.0
    # identical arithmetic to approx_area_acres so single-piece (convex
    # clip) results stay bit-identical to the legacy path
    lat = float(np.mean(np.concatenate(piece_ys)))
    m2 = deg2 * DEG_M * DEG_M * np.cos(np.radians(lat))
    return m2 * ACRES_PER_M2


def intersection_acres(ga: Geom, gb: Geom) -> float:
    """Intersection area in acres of two general geometries (concave OK,
    holes OK, multipolygons OK) via inclusion–exclusion over ring pairs:

        |A∩B| = |eA∩eB| − Σ|hA∩eB| − Σ|eA∩hB| + ΣΣ|hA∩hB|

    (valid because holes lie inside their exteriors and parts are
    disjoint). Simple convex×anything inputs take exactly the legacy
    whole-ring Sutherland–Hodgman path, keeping old results bit-identical.
    """
    total = 0.0
    for pa in ga:
        for pb in gb:
            ea, ha = pa[0], pa[1:]
            eb, hb = pb[0], pb[1:]
            t = _ring_pair_acres(*ea, *eb)
            for h in ha:
                t -= _ring_pair_acres(*h, *eb)
            for h in hb:
                t -= _ring_pair_acres(*ea, *h)
            for h1 in ha:
                for h2 in hb:
                    t += _ring_pair_acres(*h1, *h2)
            total += max(t, 0.0)
    return total


def points_in_rings(px, py, rings: list) -> np.ndarray:
    """Even-odd PIP across a polygon's rings: XOR of per-ring crossings
    handles holes natively (inside exterior, inside hole -> outside)."""
    inside = np.zeros(len(np.asarray(px)), dtype=bool)
    for xs, ys in rings:
        inside ^= points_in_polygon(px, py, xs, ys)
    return inside


def points_in_geom(px, py, geom: Geom) -> np.ndarray:
    """PIP against a general geometry (multipolygon parts are disjoint)."""
    inside = np.zeros(len(np.asarray(px)), dtype=bool)
    for poly in geom:
        inside |= points_in_rings(px, py, poly)
    return inside


def make_valid_ring(xs: np.ndarray, ys: np.ndarray):
    """Minimal ``make_valid`` analogue (reference fix_geometry,
    geometry_utils_v1.py:34-53): drop consecutive duplicate and collinear
    vertices; returns None when no valid ring remains (caller drops it,
    like the reference's None on unfixable geometry)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) and np.isclose(xs[0], xs[-1]) and np.isclose(ys[0], ys[-1]):
        xs, ys = xs[:-1], ys[:-1]
    keep = np.ones(len(xs), dtype=bool)
    for i in range(len(xs)):  # consecutive duplicates
        j = (i + 1) % len(xs)
        if keep[i] and xs[i] == xs[j] and ys[i] == ys[j] and i != j:
            keep[j] = False
    xs, ys = xs[keep], ys[keep]
    if len(xs) >= 3:  # collinear middles
        x0, y0 = np.roll(xs, 1), np.roll(ys, 1)
        x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
        cr = (xs - x0) * (y1 - ys) - (ys - y0) * (x1 - xs)
        m = cr != 0
        xs, ys = xs[m], ys[m]
    if len(xs) < 3 or not (np.isfinite(xs).all() and np.isfinite(ys).all()):
        return None
    if shoelace_area(xs, ys) <= 0.0:
        return None
    return xs, ys


def _dp_chain(cx: np.ndarray, cy: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker keep-mask for an open chain (endpoints kept)."""
    keep = np.zeros(len(cx), dtype=bool)
    keep[[0, len(cx) - 1]] = True
    stack = [(0, len(cx) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        ax, ay, bx, by = cx[i0], cy[i0], cx[i1], cy[i1]
        seg = np.hypot(bx - ax, by - ay)
        mid = slice(i0 + 1, i1)
        if seg == 0:
            d = np.hypot(cx[mid] - ax, cy[mid] - ay)
        else:
            d = np.abs((bx - ax) * (ay - cy[mid])
                       - (ax - cx[mid]) * (by - ay)) / seg
        k = int(np.argmax(d))
        if d[k] > tol:
            j = i0 + 1 + k
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return keep


def simplify_ring(xs: np.ndarray, ys: np.ndarray, tol: float):
    """Douglas–Peucker ring simplification (reference simplify_geometry,
    geometry_utils_v1.py:120-139: tolerance in degrees, returns the input
    unchanged when simplification would collapse/invalidate it)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 5:
        return xs, ys
    # anchor at two far-apart vertices so the ring's closure survives DP,
    # then simplify the two open chains between them independently
    a = int(np.argmin(xs))
    rx, ry = np.roll(xs, -a), np.roll(ys, -a)
    b = int(np.argmax(np.hypot(rx - rx[0], ry - ry[0])))
    k1 = _dp_chain(rx[: b + 1], ry[: b + 1], tol)
    cx = np.concatenate([rx[b:], rx[:1]])
    cy = np.concatenate([ry[b:], ry[:1]])
    k2 = _dp_chain(cx, cy, tol)
    keep = np.zeros(len(rx), dtype=bool)
    keep[: b + 1] = k1
    keep[b:] |= k2[:-1]
    out_x, out_y = rx[keep], ry[keep]
    if len(out_x) < 3 or shoelace_area(out_x, out_y) <= 0.0:
        return xs, ys  # reference returns the original on failure
    return out_x, out_y


def buffer_ring(xs: np.ndarray, ys: np.ndarray, dist: float,
                quad_segs: int = 8):
    """Round-join polygon buffer (reference buffer_geometry,
    geometry_utils_v1.py:141-160; shapely's default quad_segs=8).

    Exact (up to arc sampling) for convex rings and for concave rings whose
    reflex features are wider than ``dist``; tighter concavities are
    smoothed over (documented approximation — the reference's typical use
    is small search-radius padding, coordinate_utils_v3 ring selection).
    Negative dist shrinks; returns None when nothing remains.
    """
    xs, ys = ensure_ccw(np.asarray(xs, dtype=np.float64),
                        np.asarray(ys, dtype=np.float64))
    if dist == 0:
        v = make_valid_ring(xs, ys)
        return v
    n = len(xs)
    out_x: list[float] = []
    out_y: list[float] = []
    sign = 1.0 if dist > 0 else -1.0
    d = abs(dist)

    def nrm(ux: float, uy: float):
        # outward unit normal of a CCW edge = clockwise rotation
        L = np.hypot(ux, uy)
        return (uy / L, -ux / L) if L else (0.0, 0.0)

    for i in range(n):
        ax, ay = xs[(i - 1) % n], ys[(i - 1) % n]
        bx, by = xs[i], ys[i]
        cx_, cy_ = xs[(i + 1) % n], ys[(i + 1) % n]
        n1 = nrm(bx - ax, by - ay)
        n2 = nrm(cx_ - bx, cy_ - by)
        p1 = (bx + sign * d * n1[0], by + sign * d * n1[1])
        p2 = (bx + sign * d * n2[0], by + sign * d * n2[1])
        turn = (bx - ax) * (cy_ - by) - (by - ay) * (cx_ - bx)
        if turn * dist > 0:
            # offset bends AWAY from the corner: round join, arc around b
            out_x.append(p1[0]); out_y.append(p1[1])
            a1 = np.arctan2(p1[1] - by, p1[0] - bx)
            a2 = np.arctan2(p2[1] - by, p2[0] - bx)
            sweep = ((a2 - a1) % (2 * np.pi) if dist > 0
                     else -((a1 - a2) % (2 * np.pi)))
            steps = max(int(abs(sweep) / (np.pi / 2) * quad_segs), 1)
            for s in range(1, steps):
                ang = a1 + sweep * s / steps
                out_x.append(bx + d * np.cos(ang))
                out_y.append(by + d * np.sin(ang))
            out_x.append(p2[0]); out_y.append(p2[1])
        elif turn == 0:
            out_x.append(p1[0]); out_y.append(p1[1])
        else:
            # offset bends INTO the corner: miter join (intersection of the
            # two offset edge lines); bevel when nearly parallel
            d1x, d1y = bx - ax, by - ay
            d2x, d2y = cx_ - bx, cy_ - by
            denom = d1x * d2y - d1y * d2x
            if denom == 0:
                out_x.append(p1[0]); out_y.append(p1[1])
                out_x.append(p2[0]); out_y.append(p2[1])
            else:
                t = ((p2[0] - p1[0]) * d2y - (p2[1] - p1[1]) * d2x) / denom
                mx, my = p1[0] + t * d1x, p1[1] + t * d1y
                if np.hypot(mx - bx, my - by) > 4 * d:  # miter limit -> bevel
                    out_x.append(p1[0]); out_y.append(p1[1])
                    out_x.append(p2[0]); out_y.append(p2[1])
                else:
                    out_x.append(mx); out_y.append(my)
    v = make_valid_ring(np.array(out_x), np.array(out_y))
    if v is None or signed_area(*v) <= 0:
        return None  # collapsed/inverted (ring smaller than |dist|)
    if dist < 0:
        # an even number of edge inversions can re-right the orientation
        # (e.g. shrinking past the centroid): every surviving vertex must
        # keep |dist| clearance from the original boundary
        clear = points_ring_distance(v[0], v[1], xs, ys)
        if (clear < d * (1 - 1e-9)).any():
            return None
    return v


def points_ring_distance(px, py, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized distance from points to a ring's BOUNDARY (segments)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    ax, ay = xs[None, :], ys[None, :]
    bx, by = np.roll(xs, -1)[None, :], np.roll(ys, -1)[None, :]
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    t = np.clip(
        np.divide((px - ax) * dx + (py - ay) * dy, L2,
                  out=np.zeros_like(L2 + px), where=L2 > 0),
        0.0, 1.0,
    )
    qx, qy = ax + t * dx, ay + t * dy
    return np.sqrt((px - qx) ** 2 + (py - qy) ** 2).min(axis=1)


def is_simple_ring(xs: np.ndarray, ys: np.ndarray) -> bool:
    """True iff no two non-adjacent edges properly cross (O(n^2) segment
    test, vectorized per edge). Triangulation/clipping areas are only
    meaningful for simple rings — validate dictionary polygons ONCE at
    driver time, like the reference's fix_geometry gate."""
    n = len(xs)
    if n < 3:
        return False
    if n == 3:
        return True
    def _proper_cross(i, j):  # scalar test of edges (i,i+1) x (j,j+1)
        ax, ay, bx, by = xs[i], ys[i], xs[(i + 1) % n], ys[(i + 1) % n]
        cx, cy, dx, dy = xs[j], ys[j], xs[(j + 1) % n], ys[(j + 1) % n]
        d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
        d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
        d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
        return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))
    if n == 4:  # only two non-adjacent pairs exist
        return not (_proper_cross(0, 2) or _proper_cross(1, 3))
    if is_convex(xs, ys):
        return True  # convex rings cannot self-intersect
    x1, y1 = np.concatenate([xs[1:], xs[:1]]), np.concatenate([ys[1:], ys[:1]])
    for i in range(n):
        # candidates: edges j > i+1, excluding the wrap pair (0, n-1)
        j0 = i + 2
        j1 = n if i > 0 else n - 1
        if j0 >= j1:
            continue
        ax, ay, bx, by = xs[i], ys[i], x1[i], y1[i]
        cx, cy = xs[j0:j1], ys[j0:j1]
        dx, dy = x1[j0:j1], y1[j0:j1]
        d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
        d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
        d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
        if np.any(((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))):
            return False
    return True


def is_valid_ring(xs: np.ndarray, ys: np.ndarray) -> bool:
    """Minimal validity: >=3 distinct vertices, finite, nonzero area."""
    if len(xs) < 3 or not (np.isfinite(xs).all() and np.isfinite(ys).all()):
        return False
    return shoelace_area(xs, ys) > 0.0


def valid_lonlat(lon: float, lat: float) -> bool:
    """Reference ``geometry_utils_v1.py:187-198``."""
    return -180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0
