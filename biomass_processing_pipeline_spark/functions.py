"""Scalar function inventory (SURVEY.md §2.7) as native Column expressions.

Everything here is JVM-side (whole-stage codegen) — no Python. Each
function cites the reference behavior it reproduces; formulas are kept
bit-identical for parity where the reference documents constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# unit conversions (crop_analyzer_v3.py:175; database_manager_v3.py:187;
# optimized_county_processor_v1.py:580) — shared with geometry.py so
# acres<->m2 are exact inverses everywhere
from biomass_processing_pipeline_spark.geometry import ACRES_PER_M2, M2_PER_ACRE

LB_PER_TON = 2000.0


def m2_to_acres(c: Column) -> Column:
    return c * F.lit(ACRES_PER_M2)


def acres_to_m2(c: Column) -> Column:
    return c * F.lit(M2_PER_ACRE)


def lb_to_tons(c: Column) -> Column:
    return c / F.lit(LB_PER_TON)


def utm_zone(lon: Column) -> Column:
    """coordinate_utils_v3.py:171-198: int((lon+180)//6)+1."""
    return (F.floor((lon + 180.0) / 6.0) + 1).cast("int")


def utm_epsg(lon: Column, lat: Column) -> Column:
    """EPSG 326xx north / 327xx south."""
    return F.when(lat >= 0, utm_zone(lon) + 32600).otherwise(utm_zone(lon) + 32700)


# WGS84 <-> UTM transform (reference coordinate_utils_v3.py:54-169 via
# pyproj; here the standard Transverse Mercator series, Snyder 1987 §8,
# as PURE native column math — whole-stage codegen, no Python). Accurate
# to sub-mm inside a zone; round-trip < 1e-9 deg (tested).
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E4 = _E2 * _E2
_E6 = _E2 * _E2 * _E2
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_M0 = 1.0 - _E2 / 4.0 - 3.0 * _E4 / 64.0 - 5.0 * _E6 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E4 / 32.0 + 45.0 * _E6 / 1024.0
_M4 = 15.0 * _E4 / 256.0 + 45.0 * _E6 / 1024.0
_M6 = 35.0 * _E6 / 3072.0


def utm_central_meridian(lon: Column) -> Column:
    return (utm_zone(lon).cast("double") - 1.0) * 6.0 - 180.0 + 3.0


def utm_forward(lon: Column, lat: Column,
                zone: Column | None = None) -> tuple[Column, Column]:
    """(lon, lat) degrees -> (easting, northing) meters in the point's own
    UTM zone (false easting 500 km; +10,000 km northing south). Pass
    ``zone`` to project into a specific zone's plane instead (the
    reference's single-transformer behavior for multi-corner shapes)."""
    phi = F.radians(lat)
    lam = F.radians(lon)
    if zone is None:
        lam0 = F.radians(utm_central_meridian(lon))
    else:
        lam0 = F.radians((zone.cast("double") - 1.0) * 6.0 - 180.0 + 3.0)
    s, c, t = F.sin(phi), F.cos(phi), F.tan(phi)
    n = _A / F.sqrt(1.0 - _E2 * s * s)
    big_t = t * t
    big_c = _EP2 * c * c
    a_ = c * (lam - lam0)
    m = _A * (_M0 * phi - _M2 * F.sin(2.0 * phi)
              + _M4 * F.sin(4.0 * phi) - _M6 * F.sin(6.0 * phi))
    a2 = a_ * a_
    a3 = a2 * a_
    easting = _K0 * n * (
        a_ + (1.0 - big_t + big_c) * a3 / 6.0
        + (5.0 - 18.0 * big_t + big_t * big_t + 72.0 * big_c - 58.0 * _EP2)
        * a3 * a2 / 120.0
    ) + 500000.0
    northing = _K0 * (
        m + n * t * (a2 / 2.0
                     + (5.0 - big_t + 9.0 * big_c + 4.0 * big_c * big_c)
                     * a2 * a2 / 24.0
                     + (61.0 - 58.0 * big_t + big_t * big_t + 600.0 * big_c
                        - 330.0 * _EP2) * a3 * a3 / 720.0)
    )
    northing = F.when(lat < 0, northing + 10000000.0).otherwise(northing)
    return easting, northing


# MGRS 100 km grid squares. mgrs_grid_square implements the STANDARD
# AA-scheme letters (public MGRS spec: 24-letter column cycle offset 8 per
# zone-in-set, 20-letter row cycle offset 5 on even zones);
# mgrs_square_utm_bounds reproduces the reference's zone/band lookup-table
# approximation (coordinate_utils_v3.py:391-472) for parity.
MGRS_COL_LETTERS = "ABCDEFGHJKLMNPQRSTUVWXYZ"
MGRS_ROW_LETTERS = "ABCDEFGHJKLMNPQRSTUV"
_MGRS_ZONE_EASTING_ORIGIN = {10: 300000, 11: 700000, 12: 100000,
                             13: 500000, 14: 900000, 15: 300000,
                             16: 700000, 17: 100000, 18: 500000, 19: 900000}
_MGRS_BAND_NORTHING_ORIGIN = {"R": 2000000, "S": 3100000,
                              "T": 4200000, "U": 5300000}


def mgrs_grid_square(lon: Column, lat: Column) -> Column:
    """(lon, lat) -> the two-letter MGRS 100 km grid-square id (standard
    scheme, northern-hemisphere rows), pure column math on utm_forward."""
    e, n = utm_forward(lon, lat)
    zone = utm_zone(lon)
    col_idx = (
        F.pmod(zone - 1, F.lit(3)) * 8 + F.floor(e / 100000.0) - 1
    ).cast("int")
    row_idx = F.pmod(
        F.floor(n / 100000.0)
        + F.when(zone % 2 == 0, F.lit(5)).otherwise(F.lit(0)),
        F.lit(20),
    ).cast("int")
    return F.concat(
        F.substr(F.lit(MGRS_COL_LETTERS), col_idx + 1, F.lit(1)),
        F.substr(F.lit(MGRS_ROW_LETTERS), row_idx + 1, F.lit(1)),
    )


def mgrs_square_utm_bounds(zone: Column, square: Column,
                           band: Column) -> Column:
    """Reference-parity (coordinate_utils_v3.py:391-472): 100 km square ->
    struct(min_easting, min_northing, max_easting, max_northing) via the
    reference's zone easting-origin and band northing-origin lookup tables
    (its own documented CONUS approximation, kept verbatim)."""
    col_map = F.create_map(*[
        x for ch, i in ((c, i) for i, c in enumerate(MGRS_COL_LETTERS))
        for x in (F.lit(ch), F.lit(i))
    ])
    row_map = F.create_map(*[
        x for ch, i in ((c, i) for i, c in enumerate(MGRS_ROW_LETTERS))
        for x in (F.lit(ch), F.lit(i))
    ])
    zone_map = F.create_map(*[
        F.lit(v) for kv in _MGRS_ZONE_EASTING_ORIGIN.items() for v in kv
    ])
    band_map = F.create_map(*[
        F.lit(v) for kv in _MGRS_BAND_NORTHING_ORIGIN.items() for v in kv
    ])
    e0 = (F.coalesce(zone_map[zone], F.lit(100000))
          + col_map[F.substring(square, 1, 1)] * 100000).cast("long")
    n0 = (F.coalesce(band_map[band], F.lit(4200000))
          + row_map[F.substring(square, 2, 1)] * 100000).cast("long")
    return F.struct(
        e0.alias("min_easting"), n0.alias("min_northing"),
        (e0 + 100000).alias("max_easting"),
        (n0 + 100000).alias("max_northing"),
    )


def reproject_bbox_to_utm(min_lon: Column, min_lat: Column,
                          max_lon: Column, max_lat: Column) -> Column:
    """WGS84 bbox -> UTM bbox: transform the 4 corners INTO THE BBOX
    CENTER'S ZONE (one projection plane, the reference's single-transformer
    behavior, coordinate_utils_v3.py:104-169) and take the envelope.
    Native column math throughout."""
    zone = utm_zone((min_lon + max_lon) / 2.0)
    es, ns = [], []
    for lo, la in ((min_lon, min_lat), (max_lon, min_lat),
                   (min_lon, max_lat), (max_lon, max_lat)):
        e, n = utm_forward(lo, la, zone=zone)
        es.append(e)
        ns.append(n)
    return F.struct(
        F.least(*es).alias("min_easting"), F.least(*ns).alias("min_northing"),
        F.greatest(*es).alias("max_easting"),
        F.greatest(*ns).alias("max_northing"),
    )


def tile_wgs84_bounds(zone: Column, square: Column, band: Column) -> Column:
    """MGRS 100 km square -> WGS84 lon/lat envelope: inverse-transform the
    UTM bounds corners and take min/max (the reference's tile-bounds flow,
    coordinate_utils_v3.py:355-389: grid UTM bounds -> pyproj inverse ->
    envelope). Northern hemisphere (the reference's CONUS bands)."""
    b = mgrs_square_utm_bounds(zone, square, band)
    corners = [
        (b["min_easting"], b["min_northing"]),
        (b["max_easting"], b["min_northing"]),
        (b["min_easting"], b["max_northing"]),
        (b["max_easting"], b["max_northing"]),
    ]
    lons, lats = [], []
    for e, n in corners:
        lo, la = utm_inverse(e.cast("double"), n.cast("double"), zone,
                             F.lit(True))
        lons.append(lo)
        lats.append(la)
    return F.struct(
        F.least(*lons).alias("min_lon"), F.least(*lats).alias("min_lat"),
        F.greatest(*lons).alias("max_lon"), F.greatest(*lats).alias("max_lat"),
    )


def utm_inverse(easting: Column, northing: Column, zone: Column,
                northern: Column) -> tuple[Column, Column]:
    """(easting, northing, zone, is-northern) -> (lon, lat) degrees
    (Snyder 1987 §8 inverse series)."""
    x = easting - 500000.0
    y = F.when(northern, northing).otherwise(northing - 10000000.0)
    lam0 = F.radians((zone.cast("double") - 1.0) * 6.0 - 180.0 + 3.0)
    e1 = (1.0 - (1.0 - _E2) ** 0.5) / (1.0 + (1.0 - _E2) ** 0.5)
    mu = y / _K0 / (_A * _M0)
    phi1 = (
        mu + (3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0) * F.sin(2.0 * mu)
        + (21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0) * F.sin(4.0 * mu)
        + (151.0 * e1**3 / 96.0) * F.sin(6.0 * mu)
        + (1097.0 * e1**4 / 512.0) * F.sin(8.0 * mu)
    )
    s1, c1, t1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    big_c1 = _EP2 * c1 * c1
    big_t1 = t1 * t1
    n1 = _A / F.sqrt(1.0 - _E2 * s1 * s1)
    r1 = _A * (1.0 - _E2) / F.pow(1.0 - _E2 * s1 * s1, 1.5)
    d = x / (n1 * _K0)
    d2 = d * d
    phi = phi1 - (n1 * t1 / r1) * (
        d2 / 2.0
        - (5.0 + 3.0 * big_t1 + 10.0 * big_c1 - 4.0 * big_c1 * big_c1
           - 9.0 * _EP2) * d2 * d2 / 24.0
        + (61.0 + 90.0 * big_t1 + 298.0 * big_c1 + 45.0 * big_t1 * big_t1
           - 252.0 * _EP2 - 3.0 * big_c1 * big_c1) * d2 * d2 * d2 / 720.0
    )
    lam = lam0 + (
        d - (1.0 + 2.0 * big_t1 + big_c1) * d2 * d / 6.0
        + (5.0 - 2.0 * big_c1 + 28.0 * big_t1 - 3.0 * big_c1 * big_c1
           + 8.0 * _EP2 + 24.0 * big_t1 * big_t1) * d2 * d2 * d / 120.0
    ) / c1
    return F.degrees(lam), F.degrees(phi)


def lat_band(lat: Column) -> Column:
    """Piecewise lat -> MGRS band letter (coordinate_utils_v3.py:272-289,
    bands Q..V over the CONUS-ish range; X fallback outside)."""
    return (
        F.when((lat >= 16) & (lat < 24), "Q")
        .when((lat >= 24) & (lat < 32), "R")
        .when((lat >= 32) & (lat < 40), "S")
        .when((lat >= 40) & (lat < 48), "T")
        .when((lat >= 48) & (lat < 56), "U")
        .when((lat >= 56) & (lat < 64), "V")
        .otherwise("X")
    )


def mgrs_like_tile_id(lon: Column, lat: Column) -> Column:
    """zone + band compose (MGRS-name shape '14T', parse regex
    coordinate_utils_v3.py:200-229)."""
    return F.concat(F.format_string("%02d", utm_zone(lon)), lat_band(lat))


def parse_tile_id(tile: Column) -> tuple[Column, Column]:
    """regex parse of '14TQQ'-shaped ids -> (zone:int, band:string)."""
    return (
        F.regexp_extract(tile, r"^(\d{2})([A-Z])", 1).cast("int"),
        F.regexp_extract(tile, r"^(\d{2})([A-Z])", 2),
    )


def worldcover_tile_name(lon: Column, lat: Column) -> Column:
    """coordinate_utils_v3.py:327-358: floor to 3-degree lattice, name
    N%02dW%03d (northern/western hemisphere naming as the reference)."""
    lat3 = (F.floor(lat / 3) * 3).cast("int")
    lon3 = (F.floor(lon / 3) * 3).cast("int")
    return F.concat(
        F.when(lat3 >= 0, F.format_string("N%02d", lat3))
        .otherwise(F.format_string("S%02d", -lat3)),
        F.when(lon3 < 0, F.format_string("W%03d", -lon3))
        .otherwise(F.format_string("E%03d", lon3)),
    )


def valid_lonlat(lon: Column, lat: Column) -> Column:
    """geometry_utils_v1.py:187-198 bounds check."""
    return (lon >= -180.0) & (lon <= 180.0) & (lat >= -90.0) & (lat <= 90.0)


def approx_area_acres_cols(deg2_area: Column, mean_lat: Column) -> Column:
    """geometry_utils_v1.py:55-83: deg^2 * 111320^2 * cos(lat) -> acres."""
    return (
        deg2_area * F.lit(111320.0 * 111320.0)
        * F.cos(F.radians(mean_lat)) * F.lit(ACRES_PER_M2)
    )


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km (native column math). The engine's
    primary distance is degree-euclidean for reference parity
    (ORDER BY distance_degrees); haversine is offered for metric-correct
    variants (the reference reaches for pyproj the same way,
    coordinate_utils_v3.py:54-102)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlon / 2), 2)
    )
    return 2.0 * 6371.0088 * F.asin(F.sqrt(a))


# vegetation indices (vegetation_analyzer_v3.py:112-157) with
# zero-denominator guards, as column math over band-mean columns
def ndvi(nir: Column, red: Column) -> Column:
    d = nir + red
    return F.when(d != 0, (nir - red) / d).otherwise(F.lit(0.0))


def evi(nir: Column, red: Column, blue: Column) -> Column:
    d = nir + 6.0 * red - 7.5 * blue + 1.0
    return F.when(d != 0, 2.5 * (nir - red) / d).otherwise(F.lit(0.0))


def savi(nir: Column, red: Column, soil_l: float = 0.5) -> Column:
    d = nir + red + soil_l
    return F.when(d != 0, (1.0 + soil_l) * (nir - red) / d).otherwise(F.lit(0.0))


def ndwi(green: Column, nir: Column) -> Column:
    d = green + nir
    return F.when(d != 0, (green - nir) / d).otherwise(F.lit(0.0))


# forest component math (forest_analyzer_v3.py:203-221)
def standing_biomass(ag: Column, bg: Column) -> Column:
    return ag + bg


def harvestable_biomass(bole: Column, sawlog: Column, stem: Column) -> Column:
    return bole + sawlog + 0.8 * stem


def residue_biomass(branch: Column, foliage: Column, stump: Column,
                    stem: Column) -> Column:
    return branch + foliage + stump + 0.2 * stem


def ndvi_biomass_multiplier(ndvi_col: Column) -> Column:
    """NDVI-bucketed regional fallback multiplier
    (forest_analyzer_v3.py:392-454): denser canopy -> more biomass."""
    return (
        F.when(ndvi_col >= 0.7, 1.3)
        .when(ndvi_col >= 0.5, 1.0)
        .when(ndvi_col >= 0.3, 0.7)
        .when(ndvi_col >= 0.1, 0.4)
        .otherwise(0.1)
    )


def confidence_score(
    n_sources: Column, coverage_pct: Column, ndvi_quality: Column,
) -> Column:
    """Piecewise bucketed confidence (pattern of
    forest_analyzer_v3.py:460-522 / crop_analyzer_v3.py:264-317 /
    vegetation_analyzer_v3.py:170-231): mean of 3 bucketed factors in
    [0, 1]."""
    f1 = (
        F.when(n_sources >= 3, 1.0).when(n_sources == 2, 0.8)
        .when(n_sources == 1, 0.5).otherwise(0.1)
    )
    f2 = (
        F.when(coverage_pct >= 95.0, 1.0).when(coverage_pct >= 80.0, 0.8)
        .when(coverage_pct >= 50.0, 0.6).otherwise(0.3)
    )
    f3 = (
        F.when(ndvi_quality >= 0.6, 1.0).when(ndvi_quality >= 0.3, 0.7)
        .otherwise(0.4)
    )
    return F.round((f1 + f2 + f3) / 3.0, 3)
