"""Hierarchical cell index (H3/S2-style, Morton/Z-order over WGS84).

The reference proves a deterministic grid suffices for its filter-refine
spatial joins (MGRS grid-square math, ``/root/reference/src/core/
coordinate_utils_v3.py:391-472``; candidate-ring tile selection ``:264-318``).
We use a square Morton (Z-order) grid over lon/lat:

- level ``L`` splits the world into ``2^L x 2^L`` cells;
- ``cell_id`` interleaves the bits of the (ix, iy) cell coordinates, so the
  *parent* cell at level ``L-1`` is ``cell_id >> 2`` and a coarse
  "cell prefix" partition key is ``cell_id >> 2*(L - Lp)``;
- k-ring neighbors are the cells at Chebyshev distance <= k.

Three implementations, all bit-identical:

1. :func:`cell_id_col` — **native Spark Column expressions** (shift/mask
   magic-number interleave). Stays inside whole-stage codegen; this is the
   hot path used by every scan.
2. numpy-vectorized (:func:`cell_id_np`, :func:`neighbors_np`, ...) — used
   inside Arrow-batched pandas UDFs where arrays are already in numpy
   (ring expansion, polygon covers).
3. plain-python scalar (:func:`cell_id_py`) — test oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# World extent; every coordinate is clamped into it.
LON_MIN, LON_MAX = -180.0, 180.0
LAT_MIN, LAT_MAX = -90.0, 90.0

# Default index level for the fixture extent (0.5deg-ish cells: 360/2^10 =
# 0.35deg). Level is a free parameter everywhere; 10 is the engine default.
DEFAULT_LEVEL = 10

_MAGIC = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


# ---------------------------------------------------------------------------
# 1. Native Spark Column implementation (JVM-side, codegen'd)
# ---------------------------------------------------------------------------

def _part1by1_col(c: Column) -> Column:
    """Spread the low 32 bits of ``c`` so bit i lands at position 2i."""
    out = c.cast("long")
    for shift, mask in _MAGIC:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def ix_col(lon: Column, level: int) -> Column:
    # NULL caveat: greatest(0, NULL) SKIPS the null (SQL semantics), so a
    # NULL coordinate clamps to index 0 rather than propagating — callers
    # with nullable coords must when()-gate the cell (sources/images.py
    # does); adding the gate here would blow the codegen tree (docstring
    # below).
    n = 1 << level
    raw = F.floor((lon - F.lit(LON_MIN)) / F.lit(LON_MAX - LON_MIN) * F.lit(n))
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw)).cast("long")


def iy_col(lat: Column, level: int) -> Column:
    n = 1 << level
    raw = F.floor((lat - F.lit(LAT_MIN)) / F.lit(LAT_MAX - LAT_MIN) * F.lit(n))
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw)).cast("long")


def cell_id_col(lon: Column, lat: Column, level: int = DEFAULT_LEVEL) -> Column:
    """Morton cell id as a pure Column expression (no Python in the loop).

    Feed PLAIN COLUMN REFERENCES only. Each magic step references its
    operand twice, so the expression tree embeds 2^5 copies of ``lon``/
    ``lat`` per axis: with a leaf ref that stays codegen'd (plan-gated in
    test_plans), but a composite operand (e.g. ``greatest(a, b)``) blows
    the tree past the codegen limit and Spark falls back to interpreted
    eval at ~50us/row — measured 196 s over a 122M-row join in round 5
    (intersect.py's anchor filter compares per-axis ix_col/iy_col against
    numpy-decoded lattice coords instead). Compute composite inputs into
    a real column first, then index that.
    """
    ix = _part1by1_col(ix_col(lon, level))
    iy = _part1by1_col(iy_col(lat, level))
    return ix.bitwiseOR(F.shiftleft(iy, 1))


def parent_col(cell: Column, levels_up: int = 1) -> Column:
    return F.shiftright(cell, 2 * levels_up)


def cell_prefix_col(cell: Column, level: int, prefix_level: int) -> Column:
    """Coarse partition key: the ancestor cell at ``prefix_level``."""
    return F.shiftright(cell, 2 * (level - prefix_level))


# ---------------------------------------------------------------------------
# 2. numpy implementation (for Arrow/pandas UDF internals)
# ---------------------------------------------------------------------------

def _part1by1_np(v: np.ndarray) -> np.ndarray:
    out = v.astype(np.int64)
    for shift, mask in _MAGIC:
        out = (out | (out << shift)) & mask
    return out


def _compact1by1_np(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1_np: gather even bits back into the low half."""
    out = v.astype(np.int64) & 0x5555555555555555
    out = (out | (out >> 1)) & 0x3333333333333333
    out = (out | (out >> 2)) & 0x0F0F0F0F0F0F0F0F
    out = (out | (out >> 4)) & 0x00FF00FF00FF00FF
    out = (out | (out >> 8)) & 0x0000FFFF0000FFFF
    out = (out | (out >> 16)) & 0x00000000FFFFFFFF
    return out


def ixy_np(lon: np.ndarray, lat: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << level
    ix = np.floor((np.asarray(lon, dtype=np.float64) - LON_MIN) / (LON_MAX - LON_MIN) * n)
    iy = np.floor((np.asarray(lat, dtype=np.float64) - LAT_MIN) / (LAT_MAX - LAT_MIN) * n)
    ix = np.clip(ix, 0, n - 1).astype(np.int64)
    iy = np.clip(iy, 0, n - 1).astype(np.int64)
    return ix, iy


def encode_np(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return _part1by1_np(ix) | (_part1by1_np(iy) << 1)


def decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return _compact1by1_np(cell), _compact1by1_np(cell >> 1)


def cell_id_np(lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    ix, iy = ixy_np(lon, lat, level)
    return encode_np(ix, iy)


def neighbors_np(cell: np.ndarray, level: int, k: int = 1) -> np.ndarray:
    """k-ring (including the cell itself) for each cell.

    Returns an object-dtype-free 2-D array of shape ``(len(cell),
    (2k+1)**2)``; out-of-range neighbors are clamped to the grid edge (they
    duplicate an in-range cell, which is harmless for candidate joins).
    Mirrors the reference's zone/band candidate ring
    (``coordinate_utils_v3.py:264-318``).
    """
    n = 1 << level
    ix, iy = decode_np(np.asarray(cell, dtype=np.int64))
    offs = np.arange(-k, k + 1)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    nx = np.clip(ix[:, None] + dx.ravel()[None, :], 0, n - 1)
    ny = np.clip(iy[:, None] + dy.ravel()[None, :], 0, n - 1)
    return encode_np(nx, ny)


def cover_bbox_np(
    minx: float, miny: float, maxx: float, maxy: float, level: int
) -> np.ndarray:
    """All cell ids whose square intersects the CLOSED bbox.

    The max edges are inclusive: a point exactly on ``maxx`` hashes into
    the next cell column, and candidate generation must still find it
    (boundary points are resolved by the refine + tie rule, never by the
    coarse cover silently dropping them).
    """
    n = 1 << level
    ix0, iy0 = ixy_np(np.array([minx]), np.array([miny]), level)
    ix1, iy1 = ixy_np(np.array([maxx]), np.array([maxy]), level)
    xs = np.arange(ix0[0], min(ix1[0], n - 1) + 1, dtype=np.int64)
    ys = np.arange(iy0[0], min(iy1[0], n - 1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return encode_np(gx.ravel(), gy.ravel())


def cover_bboxes_np(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray,
    level: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched cover_bbox_np over N closed bboxes in ONE numpy pass:
    returns (bbox_index, cell_id) pairs. Same cells as calling
    cover_bbox_np per bbox (closed max edges included), but ~100x faster
    for dictionary builds with tens of thousands of polygons — the
    driver-side cover build is serial and would otherwise dominate."""
    n = 1 << level
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    ix0, iy0 = ixy_np(minx, miny, level)
    ix1, iy1 = ixy_np(np.asarray(maxx, dtype=np.float64),
                      np.asarray(maxy, dtype=np.float64), level)
    ix1 = np.minimum(ix1, n - 1)
    iy1 = np.minimum(iy1, n - 1)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(minx), dtype=np.int64), counts)
    starts = np.zeros(len(minx), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_r = np.repeat(ny, counts)
    gx = np.repeat(ix0, counts) + local // ny_r
    gy = np.repeat(iy0, counts) + local % ny_r
    return idx, encode_np(gx, gy)


def cell_bounds_np(cell: np.ndarray, level: int) -> tuple[np.ndarray, ...]:
    """(minx, miny, maxx, maxy) of each cell square."""
    n = 1 << level
    wx = (LON_MAX - LON_MIN) / n
    wy = (LAT_MAX - LAT_MIN) / n
    ix, iy = decode_np(cell)
    minx = LON_MIN + ix * wx
    miny = LAT_MIN + iy * wy
    return minx, miny, minx + wx, miny + wy


# ---------------------------------------------------------------------------
# 3. scalar oracle
# ---------------------------------------------------------------------------

def cell_id_py(lon: float, lat: float, level: int = DEFAULT_LEVEL) -> int:
    n = 1 << level
    ix = min(n - 1, max(0, int((lon - LON_MIN) / (LON_MAX - LON_MIN) * n)))
    iy = min(n - 1, max(0, int((lat - LAT_MIN) / (LAT_MAX - LAT_MIN) * n)))
    out = 0
    for b in range(level):
        out |= ((ix >> b) & 1) << (2 * b)
        out |= ((iy >> b) & 1) << (2 * b + 1)
    return out
