"""Deterministic fixture synthesis (seed=42, pure function of seed).

Mirrors FIXTURES.md: an ``images`` fact table exactly per the input_hint
``(image_id, bytes, w, h, fmt, caption, phash)`` over a 4x4-degree fixture
extent, plus polygon dictionaries (counties, parcels, class_polygons), a
point layer (plots), a tile lattice (tiles), and brute-force goldens.

Design notes (scale-first):

- ``image_id`` = ``T{tx}{ty}_{date}_{band}_{seq:08d}`` mirrors the
  reference's blob naming ``{tile_id}_{date}_{band}.tif``
  (``/root/reference/src/core/blob_manager_v3.py:1178-1201``). The centroid
  is *derivable from the id alone*: name-tile origin + a splitmix64-hashed
  in-tile offset of ``seq``. No stored coordinates — the engine recomputes
  them, exactly as the reference derives tile bounds from MGRS names.
- ~80% of images are uniform over the extent, ~20% concentrated in 2
  "dense urban" name-tiles to exercise skew salting (north_rule).
- Pixel bytes are synthesized *distributed* (mapInPandas over a seq range),
  so bench-tier generation parallelizes; per-image RNG is Philox keyed by
  seq — partitioning-independent determinism.
- Goldens (image->county PIP, image->tile, kNN top-50, per-image zonal
  partials) are emitted in the same pass with brute-force/closed-form math.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import geometry as G
from biomass_processing_pipeline_spark import imaging

SEED = 42
EXTENT = (-92.0, 38.0, -88.0, 42.0)  # minx, miny, maxx, maxy
NAME_GRID = 8  # image_id naming lattice: 8x8 tiles of 0.5 deg
NAME_G = (EXTENT[2] - EXTENT[0]) / NAME_GRID
URBAN_TILES = ((2, 3), (5, 4))  # dense "urban" name-tiles (skew)
DATES = ("20240601", "20240615", "20240701", "20240715")
BANDS = ("B02", "B03", "B04", "B08")
FMTS = ("png", "jpeg", "raw")
SIZES = (32, 48, 64)
N_CLASSES = 10  # landcover-style classes 0..9 derived from channel 0

# CDL-like codes; urban codes must be filtered by F1
URBAN_CODES = (111, 112, 121, 122, 123, 124, 131)
CROP_CODES = (1, 5, 24, 36, 2, 4, 21, 27, 28, 31) + URBAN_CODES

TIERS = {
    "sf0.001": dict(images=2000, counties=(4, 2), parcels=200, plots=100,
                    class_polys=50, tiles=8, goldens=True),
    "sf0.01": dict(images=20000, counties=(8, 4), parcels=2000, plots=1000,
                   class_polys=500, tiles=16, goldens=True),
    "sf0.1": dict(images=200000, counties=(16, 8), parcels=20000, plots=10000,
                  class_polys=5000, tiles=32, goldens=False),
    # 10x the driver tier: the local memory-headroom / spill proxy for the
    # 100x claim (bench.py --sf1); ~12 GB of image blobs on disk
    "sf1": dict(images=2000000, counties=(32, 16), parcels=200000,
                plots=100000, class_polys=50000, tiles=64, goldens=False),
}


# ---------------------------------------------------------------------------
# splitmix64 — deterministic hashing, partitioning-independent
# ---------------------------------------------------------------------------

def mix64(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = np.asarray(z).astype(np.uint64)
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def u01(z: np.ndarray) -> np.ndarray:
    """uint64 -> uniform float64 in [0, 1)."""
    return (mix64(z) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# image_id codec (shared by synthesis and the engine decode)
# ---------------------------------------------------------------------------

def image_meta_np(seq: np.ndarray) -> pd.DataFrame:
    """Vectorized: seq -> (image_id parts, lon, lat, w, h, fmt)."""
    seq = np.asarray(seq, dtype=np.int64)
    useq = seq.astype(np.uint64)
    # ~20% urban skew: every 5th image goes to one of the 2 dense tiles
    urban = (seq % 5) == 0
    tflat = (mix64(useq * np.uint64(3) + np.uint64(1)) % np.uint64(NAME_GRID * NAME_GRID)).astype(np.int64)
    tx = tflat // NAME_GRID
    ty = tflat % NAME_GRID
    which = (seq % 2).astype(np.int64)
    ut = np.array(URBAN_TILES, dtype=np.int64)
    tx = np.where(urban, ut[which, 0], tx)
    ty = np.where(urban, ut[which, 1], ty)
    lon, lat = tile_offset_np(tx, ty, seq)
    date = np.array(DATES)[(mix64(useq * np.uint64(7) + np.uint64(2)) % np.uint64(4)).astype(np.int64)]
    band = np.array(BANDS)[(mix64(useq * np.uint64(11) + np.uint64(3)) % np.uint64(4)).astype(np.int64)]
    w = np.array(SIZES)[(mix64(useq * np.uint64(13) + np.uint64(4)) % np.uint64(3)).astype(np.int64)]
    h = np.array(SIZES)[(mix64(useq * np.uint64(17) + np.uint64(5)) % np.uint64(3)).astype(np.int64)]
    fmt = np.array(FMTS)[(mix64(useq * np.uint64(19) + np.uint64(6)) % np.uint64(3)).astype(np.int64)]
    image_id = pd.Series(
        ["T%d%d_%s_%s_%08d" % t for t in zip(tx, ty, date, band, seq)]
    )
    return pd.DataFrame(
        {"image_id": image_id, "seq": seq, "tx": tx, "ty": ty, "date": date,
         "band": band, "lon": lon, "lat": lat,
         "w": w.astype(np.int32), "h": h.astype(np.int32), "fmt": fmt}
    )


def tile_offset_np(tx: np.ndarray, ty: np.ndarray, seq: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """In-tile offset of image ``seq``: uniform in the middle 96% of the
    0.5-deg name tile (keeps centroids off polygon borders)."""
    useq = np.asarray(seq).astype(np.uint64)
    ox = 0.02 + 0.96 * u01(useq * np.uint64(2) + np.uint64(101))
    oy = 0.02 + 0.96 * u01(useq * np.uint64(2) + np.uint64(577))
    lon = EXTENT[0] + (np.asarray(tx) + ox) * NAME_G
    lat = EXTENT[1] + (np.asarray(ty) + oy) * NAME_G
    return lon, lat


def image_pixels(seq: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8: smooth field + Philox noise.

    Channels are (R, G, NIR)-like so NDVI-style math is meaningful.
    Smoothness keeps zlib payloads compressible (realistic imagery-like
    entropy, not white noise).
    """
    rng = np.random.Generator(np.random.Philox(key=np.uint64(SEED) * np.uint64(1 << 32) + np.uint64(seq)))
    yy, xx = np.mgrid[0:h, 0:w]
    phase = float(mix64(np.uint64(seq)) % np.uint64(628)) / 100.0
    base = 96.0 + 64.0 * np.sin(xx / w * 3.1 + phase) * np.cos(yy / h * 2.3 + 0.5 * phase)
    px = np.empty((h, w, 3), dtype=np.uint8)
    for c, gain in enumerate((1.0, 0.85, 1.25)):
        noise = rng.integers(-10, 11, size=(h, w))
        px[:, :, c] = np.clip(base * gain + noise, 0, 255).astype(np.uint8)
    return px


def grid_feat_sum(px: np.ndarray, grid: int = 4) -> float:
    """INDEPENDENT golden twin of ``multimodal.grid_features(px).sum()``:
    explicit per-cell loops and a strict left-fold double sum (the same
    fold Spark's ``aggregate`` over the float32 feature array performs).
    Block means of uint8 pixels are exact integers-over-count in float64,
    so the truncation-to-uint8 step agrees bit-for-bit with the engine's
    reshape/mean/astype pipeline."""
    h, w, _ = px.shape
    fh, fw = max(h // grid, 1), max(w // grid, 1)
    total = 0.0
    for gy in range(grid):
        for gx in range(grid):
            block = px[gy * fh:(gy + 1) * fh, gx * fw:(gx + 1) * fw]
            for ch in range(3):
                m = int(block[:, :, ch].mean())  # truncate == astype(uint8)
                total += float(np.float32(m) / np.float32(255.0))
    return total


def zonal_partials(px: np.ndarray) -> dict:
    """Per-image zonal partial aggregates (golden for the zonal operator)."""
    f = px.astype(np.float64)
    r, nir = f[:, :, 0], f[:, :, 2]
    denom = nir + r
    valid = denom > 0
    ndvi = np.where(valid, (nir - r) / np.where(valid, denom, 1.0), 0.0)
    classes = (px[:, :, 1].astype(np.int64) * N_CLASSES) // 256
    hist = np.bincount(classes.ravel(), minlength=N_CLASSES)
    return {
        "px_count": int(f.shape[0] * f.shape[1]),
        "sum_r": float(f[:, :, 0].sum()), "sum_g": float(f[:, :, 1].sum()),
        "sum_nir": float(f[:, :, 2].sum()),
        "sumsq_r": float((f[:, :, 0] ** 2).sum()),
        "sumsq_g": float((f[:, :, 1] ** 2).sum()),
        "sumsq_nir": float((f[:, :, 2] ** 2).sum()),
        "ndvi_sum": float(ndvi[valid].sum()), "ndvi_count": int(valid.sum()),
        "class_hist": [int(x) for x in hist],
    }


# ---------------------------------------------------------------------------
# polygon layers (driver-side numpy; small dictionaries)
# ---------------------------------------------------------------------------

def county_polygons(nx: int, ny: int) -> pd.DataFrame:
    """Counties tile the extent in an nx x ny grid; every 7th vertical
    boundary is a 3-step staircase, making both neighbors concave (PIP
    edge-case coverage per FIXTURES.md §2)."""
    x0, y0, x1, y1 = EXTENT
    wx, wy = (x1 - x0) / nx, (y1 - y0) / ny
    rows = []
    for j in range(ny):
        for i in range(nx):
            idx = j * nx + i
            ax, ay = x0 + i * wx, y0 + j * wy
            bx, by = ax + wx, ay + wy
            stair_right = (i % 7 == 3) and (i + 1 < nx)
            stair_left = ((i - 1) % 7 == 3) and (i - 1 >= 0)
            d = 0.18 * wx

            # shared staircase polyline between i and i+1, bottom->top —
            # BOTH neighbors use the identical vertex list so the tiling is
            # gapless and overlap-free
            def _stair_up(x):
                return [(x, ay), (x, ay + wy / 3), (x + d, ay + wy / 3),
                        (x + d, ay + 2 * wy / 3), (x, ay + 2 * wy / 3), (x, by)]

            right = _stair_up(bx) if stair_right else [(bx, ay), (bx, by)]
            left = (
                list(reversed(_stair_up(ax))) if stair_left else [(ax, by), (ax, ay)]
            )
            ring = right + left
            xs = np.array([p[0] for p in ring])
            ys = np.array([p[1] for p in ring])
            xs, ys = G.ensure_ccw(xs, ys)
            rows.append({
                "fips": f"{17000 + idx:05d}", "name": f"County_{idx}",
                "geom_wkt": G.polygon_wkt(xs, ys),
                "minx": xs.min(), "miny": ys.min(),
                "maxx": xs.max(), "maxy": ys.max(),
                "area_m2": G.approx_area_acres(xs, ys) * G.M2_PER_ACRE,
            })
    return pd.DataFrame(rows)


def parcel_polygons(counties: pd.DataFrame, n_parcels: int) -> pd.DataFrame:
    """Rectangular parcels: a sub-grid inside each county bbox (convex, so
    exact Sutherland–Hodgman clip areas are available for J1 goldens)."""
    per = max(1, n_parcels // len(counties))
    side = int(np.ceil(np.sqrt(per)))
    rows = []
    pid = 0
    for _, c in counties.iterrows():
        wx = (c.maxx - c.minx) / side
        wy = (c.maxy - c.miny) / side
        made = 0
        for j in range(side):
            for i in range(side):
                if made >= per:
                    break
                ax = c.minx + i * wx + 0.05 * wx
                ay = c.miny + j * wy + 0.05 * wy
                bx, by = ax + 0.9 * wx, ay + 0.9 * wy
                xs = np.array([ax, bx, bx, ax])
                ys = np.array([ay, ay, by, by])
                acres = G.approx_area_acres(xs, ys)
                rows.append({
                    "parcel_id": f"P{pid:07d}", "fips": c.fips,
                    "geom_wkt": G.polygon_wkt(xs, ys),
                    "minx": ax, "miny": ay, "maxx": bx, "maxy": by,
                    "acres": acres,
                })
                pid += 1
                made += 1
    return pd.DataFrame(rows)


def plot_points(n: int) -> pd.DataFrame:
    """FIA-plot analogue: 70% uniform + 30% clustered; deterministic attrs."""
    seq = np.arange(n, dtype=np.int64)
    useq = seq.astype(np.uint64)
    lon = EXTENT[0] + (EXTENT[2] - EXTENT[0]) * u01(useq + np.uint64(9001))
    lat = EXTENT[1] + (EXTENT[3] - EXTENT[1]) * u01(useq + np.uint64(9777))
    clustered = (seq % 10) < 3
    cx = EXTENT[0] + 1.3 + 0.4 * u01(useq + np.uint64(555))
    cy = EXTENT[1] + 2.1 + 0.4 * u01(useq + np.uint64(556))
    lon = np.where(clustered, cx, lon)
    lat = np.where(clustered, cy, lat)
    return pd.DataFrame({
        "plot_cn": seq + 1000000,
        "lon": lon, "lat": lat,
        "attr_1": 50.0 + 200.0 * u01(useq + np.uint64(31)),
        "attr_2": 10.0 + 40.0 * u01(useq + np.uint64(32)),
        "attr_3": u01(useq + np.uint64(33)),
    })


def class_polys(n: int) -> pd.DataFrame:
    """CDL-analogue rectangles with class codes (incl. urban codes)."""
    seq = np.arange(n, dtype=np.int64)
    useq = seq.astype(np.uint64)
    w = 0.05 + 0.25 * u01(useq + np.uint64(71))
    h = 0.05 + 0.25 * u01(useq + np.uint64(72))
    ax = EXTENT[0] + (EXTENT[2] - EXTENT[0] - 0.3) * u01(useq + np.uint64(73))
    ay = EXTENT[1] + (EXTENT[3] - EXTENT[1] - 0.3) * u01(useq + np.uint64(74))
    code = np.array(CROP_CODES)[(mix64(useq + np.uint64(75)) % np.uint64(len(CROP_CODES))).astype(np.int64)]
    rows = []
    for k in range(n):
        xs = np.array([ax[k], ax[k] + w[k], ax[k] + w[k], ax[k]])
        ys = np.array([ay[k], ay[k], ay[k] + h[k], ay[k] + h[k]])
        rows.append({
            "class_poly_id": int(k), "class_code": int(code[k]),
            "geom_wkt": G.polygon_wkt(xs, ys),
            "minx": float(xs.min()), "miny": float(ys.min()),
            "maxx": float(xs.max()), "maxy": float(ys.max()),
        })
    return pd.DataFrame(rows)


def tile_lattice(n_side: int) -> pd.DataFrame:
    """Regular G-deg tile lattice (WorldCover-tile analogue,
    reference tile-name math ``coordinate_utils_v3.py:327-358``)."""
    x0, y0, x1, y1 = EXTENT
    g = (x1 - x0) / n_side
    rows = []
    for j in range(n_side):
        for i in range(n_side):
            rows.append({
                "tile_code": f"G{i:02d}{j:02d}",
                "minx": x0 + i * g, "miny": y0 + j * g,
                "maxx": x0 + (i + 1) * g, "maxy": y0 + (j + 1) * g,
            })
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# golden computation (brute force, driver-side)
# ---------------------------------------------------------------------------

def assign_county_bruteforce(lon: np.ndarray, lat: np.ndarray,
                             counties: pd.DataFrame) -> np.ndarray:
    """Min-fips-among-matches PIP assignment (the documented tie rule)."""
    out = np.full(len(lon), "", dtype=object)
    for _, c in counties.sort_values("fips", ascending=False).iterrows():
        xs, ys = G.parse_wkt_polygon(c.geom_wkt)
        cand = (lon >= c.minx) & (lon <= c.maxx) & (lat >= c.miny) & (lat <= c.maxy)
        if cand.any():
            hit = G.points_in_polygon(lon[cand], lat[cand], xs, ys)
            idx = np.where(cand)[0][hit]
            out[idx] = c.fips  # descending order => min fips wins last
    return out


def assign_tile_closed_form(lon: np.ndarray, lat: np.ndarray, n_side: int) -> np.ndarray:
    x0, y0, x1, _ = EXTENT
    g = (x1 - x0) / n_side
    ti = np.clip(((lon - x0) / g).astype(np.int64), 0, n_side - 1)
    tj = np.clip(((lat - y0) / g).astype(np.int64), 0, n_side - 1)
    return np.array([f"G{i:02d}{j:02d}" for i, j in zip(ti, tj)], dtype=object)


def knn_bruteforce(lon: np.ndarray, lat: np.ndarray, image_ids: np.ndarray,
                   plots: pd.DataFrame, k: int = 50) -> pd.DataFrame:
    """Brute-force top-k by euclidean degree distance (reference
    ``ORDER BY distance_degrees LIMIT 50``), ties by plot_cn."""
    plon = plots["lon"].to_numpy()
    plat = plots["lat"].to_numpy()
    pcn = plots["plot_cn"].to_numpy()
    rows = []
    for i in range(len(lon)):
        d = np.hypot(plon - lon[i], plat - lat[i])
        order = np.lexsort((pcn, d))[:k]
        for r, oi in enumerate(order):
            rows.append((image_ids[i], int(pcn[oi]), float(d[oi]), r + 1))
    return pd.DataFrame(rows, columns=["image_id", "plot_cn", "distance", "rank"])


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

# bump whenever generated VALUES change (e.g. the M2_PER_ACRE derivation
# in round 2 changed parcels.area_m2; v4 added golden_image_features): a
# stale cache regenerates instead of silently serving old numbers
FIXTURE_VERSION = 4


def fixture_dir(tier: str) -> str:
    base = os.environ.get("BPP_FIXTURE_DIR", "/tmp/bpp_fixtures")
    return os.path.join(base, tier)


def ensure_fixtures(spark: SparkSession, tier: str = "sf0.001",
                    force: bool = False) -> str:
    """Generate (once) and return the fixture directory for a tier."""
    cfg = TIERS[tier]
    out = fixture_dir(tier)
    done = os.path.join(out, "_DONE")
    stamp = f"{tier}:v{FIXTURE_VERSION}"
    if os.path.exists(done) and not force:
        with open(done) as fh:
            if fh.read().strip() == stamp:
                return out
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    nx, ny = cfg["counties"]
    counties = county_polygons(nx, ny)
    parcels = parcel_polygons(counties, cfg["parcels"])
    plots = plot_points(cfg["plots"])
    cpolys = class_polys(cfg["class_polys"])
    tiles = tile_lattice(cfg["tiles"])

    n = cfg["images"]
    meta = image_meta_np(np.arange(n, dtype=np.int64))
    fips = assign_county_bruteforce(meta["lon"].to_numpy(), meta["lat"].to_numpy(), counties)
    n_unassigned = int((fips == "").sum())
    if n_unassigned:
        raise AssertionError(
            f"county tiling has gaps: {n_unassigned} images unassigned"
        )
    meta["fips"] = fips
    tile_codes = assign_tile_closed_form(
        meta["lon"].to_numpy(), meta["lat"].to_numpy(), cfg["tiles"])

    # goldens
    pd_to_parquet(meta[["image_id", "fips"]], os.path.join(out, "golden_image_county.parquet"))
    gt = meta[["image_id"]].copy()
    gt["tile_code"] = tile_codes
    pd_to_parquet(gt, os.path.join(out, "golden_image_tile.parquet"))
    if cfg["goldens"]:
        gk = knn_bruteforce(meta["lon"].to_numpy()[:200], meta["lat"].to_numpy()[:200],
                            meta["image_id"].to_numpy()[:200], plots)
        pd_to_parquet(gk, os.path.join(out, "golden_knn.parquet"))

    # distributed bytes generation
    meta_df = spark.createDataFrame(meta[["image_id", "seq", "band", "w", "h", "fmt", "fips"]])
    n_part = min(64, max(8, n // 2000))
    images = meta_df.repartition(n_part).mapInPandas(
        _gen_bytes_batches, schema=(
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long, feat_sum double, px_count long, "
            "sum_r double, sum_g double, "
            "sum_nir double, sumsq_r double, sumsq_g double, sumsq_nir double, "
            "ndvi_sum double, ndvi_count long, class_hist array<long>"),
    )
    images.cache()
    images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash") \
        .write.mode("overwrite").parquet(os.path.join(out, "images.parquet"))
    images.select("image_id", "px_count", "sum_r", "sum_g", "sum_nir", "sumsq_r",
                  "sumsq_g", "sumsq_nir", "ndvi_sum", "ndvi_count", "class_hist") \
        .write.mode("overwrite").parquet(os.path.join(out, "golden_zonal_image.parquet"))
    images.select("image_id", "feat_sum") \
        .write.mode("overwrite").parquet(os.path.join(out, "golden_image_features.parquet"))
    images.unpersist()

    pd_to_parquet(counties, os.path.join(out, "counties.parquet"))
    pd_to_parquet(parcels, os.path.join(out, "parcels.parquet"))
    pd_to_parquet(plots, os.path.join(out, "plots.parquet"))
    pd_to_parquet(cpolys, os.path.join(out, "class_polygons.parquet"))
    pd_to_parquet(tiles, os.path.join(out, "tiles.parquet"))

    with open(done, "w") as fh:
        fh.write(stamp)
    return out


def _gen_bytes_batches(batches):
    for pdf in batches:
        rows = []
        for t in pdf.itertuples(index=False):
            px = image_pixels(int(t.seq), int(t.w), int(t.h))
            blob = imaging.encode_image(px, t.fmt)
            decoded = imaging.decode_image(blob)  # hash what a reader sees
            zp = zonal_partials(decoded)
            rows.append({
                "image_id": t.image_id, "bytes": blob, "w": int(t.w), "h": int(t.h),
                "fmt": t.fmt,
                "caption": f"tile {t.image_id.split('_')[0]} band {t.band} over county {t.fips}",
                "phash": imaging.phash64(decoded),
                "feat_sum": grid_feat_sum(decoded), **zp,
            })
        yield pd.DataFrame(rows)


def pd_to_parquet(pdf: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def load_fixture(spark: SparkSession, tier: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(ensure_fixtures(spark, tier), f"{name}.parquet"))


SF_TO_TIER = {"sf0.001": "sf0.001", "sf0.01": "sf0.01", "sf0.1": "sf0.1",
              "sf1": "sf1"}


def tier_for_sf_dir(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return SF_TO_TIER.get(base, "sf0.001")
