"""Raster <-> vector zonal aggregation (SURVEY.md J6 / A2-A4 / A10-A12).

Reference semantics: decode tile bytes -> numpy, mask pixels per polygon,
accumulate class histograms and vegetation-index stats per parcel
(``/root/reference/src/analyzers/landcover_analyzer_v3.py:370-427``,
``src/analyzers/vegetation_analyzer_v3.py:112-168``; decode
``src/core/blob_manager_v3.py:351-374``).

Spark-first shape — two stages so the Python boundary is crossed once:

1. **decode stage** (``mapInPandas``): per Arrow batch, decode ``bytes`` ->
   numpy, emit per-image *partial aggregates* (pixel count, per-band
   sum/sumsq, NDVI sum/count, class histogram array) plus a recomputed
   ``phash`` for the decode-integrity check. No pixel ever leaves Python —
   only O(1) partials per image, which is what makes this viable at
   10^12-image scale (the reference's per-tile accumulation then cross-tile
   merge, ``landcover_analyzer_v3.py:224-245``, is exactly a partial/final
   aggregate).
2. **merge stage** (relational): groupBy zone over the partials — JVM-side
   hash aggregate with map-side combine; histograms merge via
   ``posexplode`` -> groupBy sum (A2's explode design).

NDVI here = (NIR - R) / (NIR + R) with zero-denominator guard, channels
(R, G, NIR) = (0, 1, 2); classes = channel-1 value quantized to N_CLASSES
buckets, mirroring the reference's WorldCover class rasters.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import imaging
from biomass_processing_pipeline_spark.synth import N_CLASSES

DECODE_SCHEMA = (
    "image_id string, phash_ok boolean, px_count long, "
    "sum_r double, sum_g double, sum_nir double, "
    "sumsq_r double, sumsq_g double, sumsq_nir double, "
    "ndvi_sum double, ndvi_count long, class_hist array<long>"
)


def _row_partials(image_id, blob, phash) -> dict:
    """Single-row decode + partials — the original row-at-a-time path,
    kept (a) as the quarantine semantics reference and (b) as the exact
    fallback for images the batched kernel does not cover (c != 3 or
    sides < 8). Raises exactly where the original loop raised (stats
    indexing is outside the quarantine try, matching round-5 behavior)."""
    try:
        px = imaging.decode_image(blob)
        ok = bool(imaging.phash64(px) == phash)
    except Exception:
        return {
            "image_id": image_id, "phash_ok": False,
            "px_count": 0, "sum_r": 0.0, "sum_g": 0.0,
            "sum_nir": 0.0, "sumsq_r": 0.0, "sumsq_g": 0.0,
            "sumsq_nir": 0.0, "ndvi_sum": 0.0, "ndvi_count": 0,
            "class_hist": [0] * N_CLASSES,
        }
    f = px.astype(np.float64)
    r, nir = f[:, :, 0], f[:, :, 2]
    denom = nir + r
    valid = denom > 0
    ndvi = (nir - r)[valid] / denom[valid]
    classes = (px[:, :, 1].astype(np.int64) * N_CLASSES) // 256
    hist = np.bincount(classes.ravel(), minlength=N_CLASSES)
    return {
        "image_id": image_id,
        "phash_ok": ok,
        "px_count": px.shape[0] * px.shape[1],
        "sum_r": float(f[:, :, 0].sum()),
        "sum_g": float(f[:, :, 1].sum()),
        "sum_nir": float(f[:, :, 2].sum()),
        "sumsq_r": float((f[:, :, 0] ** 2).sum()),
        "sumsq_g": float((f[:, :, 1] ** 2).sum()),
        "sumsq_nir": float((f[:, :, 2] ** 2).sum()),
        "ndvi_sum": float(ndvi.sum()),
        "ndvi_count": int(valid.sum()),
        "class_hist": [int(x) for x in hist],
    }


_CHUNK = 128  # images per vectorized block. Two bounds: (a) memory —
# the int64 pixel tensor is chunk * h * w * c * 8 bytes; (b) allocator —
# keep every transient under glibc's 32 MB adaptive-mmap ceiling so the
# blocks are heap-recycled instead of fresh-mmap'd per chunk (this guest
# charges a large fault cost to NEW pages — the CLAUDE.md first-touch
# cliff; 512-image chunks allocated ~50 MB tensors that could never be
# reused). 128 x 64x64x3 int64 = 12.6 MB.


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Batched decode kernel (round 6, guide §4.2): the round-5 loop ran
    ~20 small numpy calls + a Python 64-bit phash pack PER IMAGE — ~60%
    of the warm zonal leg. Here every same-shape run of images in an
    Arrow batch is stacked into ONE (m, h, w, c) tensor and all partials
    come out of whole-batch numpy ops. Exactness vs the row path (the
    oracle goldens were generated with it):

    - band sums/sumsqs and the class histogram are integer-valued and far
      below 2^53, so float64 totals are EXACT regardless of summation
      order — batching cannot change them;
    - NDVI element values are identical (same int-difference / int-sum
      operands in float64), and each image's sum runs over its own
      contiguous row-major slice with the same np.sum pairwise algorithm
      as before — bit-identical (asserted against the row path for the
      full sf0.1 fixture + corrupt/edge rows in tests);
    - the phash block means reduce the same elements with the same numpy
      multi-axis pairwise reduce; the 64-bit pack is exact int math.

    Decode failures quarantine per row exactly as before (the zlib /
    header parse stays per row — it is C-speed and must fail per image);
    shapes the batch kernel does not cover (c != 3, sides < 8) take
    :func:`_row_partials` unchanged.
    """
    hdr = imaging._HDR
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        ids = pdf["image_id"].to_numpy()
        phash_in = pdf["phash"].to_numpy(np.int64)
        blobs = pdf["bytes"].to_numpy()
        bufs: list = [None] * n
        shapes = np.zeros((n, 3), dtype=np.int64)
        bad = np.zeros(n, dtype=bool)
        for i, blob in enumerate(blobs):
            try:
                magic, h, w, c = hdr.unpack_from(blob, 0)
                off = hdr.size
                if magic == b"RW01":
                    buf = np.frombuffer(blob, np.uint8, h * w * c, off)
                elif magic == b"PZ01":
                    buf = np.frombuffer(zlib.decompress(blob[off:]), np.uint8)
                elif magic == b"JQ01":
                    q = blob[off]
                    qz = np.frombuffer(zlib.decompress(blob[off + 1:]),
                                       np.uint8)
                    buf = np.minimum(
                        qz.astype(np.int32) * q + q // 2, 255
                    ).astype(np.uint8)
                else:
                    raise ValueError(f"bad image magic {magic!r}")
                if buf.size != h * w * c:
                    raise ValueError("pixel buffer size mismatch")
            except Exception:
                bad[i] = True
                continue
            bufs[i] = buf
            shapes[i] = (h, w, c)

        # output columns in input-row order
        phok = np.zeros(n, dtype=bool)
        px_count = np.zeros(n, dtype=np.int64)
        sums = np.zeros((n, 3), dtype=np.float64)
        sumsqs = np.zeros((n, 3), dtype=np.float64)
        ndvi_sum = np.zeros(n, dtype=np.float64)
        ndvi_count = np.zeros(n, dtype=np.int64)
        hists = np.zeros((n, N_CLASSES), dtype=np.int64)
        fallback_rows: dict[int, dict] = {}

        good = np.flatnonzero(~bad)
        if len(good):
            # group same-shape images; fixtures are uniform so this is
            # one group in practice
            key = (shapes[good, 0] << 40) + (shapes[good, 1] << 20) + \
                shapes[good, 2]
            for kv in np.unique(key):
                grp = good[key == kv]
                h, w, c = (int(x) for x in shapes[grp[0]])
                if c != 3 or h < 8 or w < 8:
                    for i in grp:
                        fallback_rows[int(i)] = _row_partials(
                            ids[i], blobs[i], phash_in[i])
                    continue
                for s in range(0, len(grp), _CHUNK):
                    gi = grp[s:s + _CHUNK]
                    m = len(gi)
                    X = np.concatenate([bufs[i] for i in gi]).reshape(
                        m, h * w, c)
                    # channel-major contiguous copy: the (m, hw, c)
                    # middle-axis reductions ran at ~6 ns/elem (strided);
                    # last-axis SIMD reduce is ~15x faster and integer
                    # sums are order-independent-exact anyway
                    Y = np.ascontiguousarray(X.transpose(0, 2, 1))
                    # int32 intermediates: every per-element value fits
                    # (pixel 255, square 65025, class key m*N_CLASSES);
                    # totals accumulate straight to int64 via the reduce
                    # dtype, so no wide tensor is ever materialized —
                    # transients stay small enough for the allocator to
                    # recycle (see _CHUNK note)
                    Yi = Y.astype(np.int32)               # (m, c, hw)
                    s3 = Yi.sum(axis=2, dtype=np.int64)   # (m, c) exact
                    ss3 = (Yi * Yi).sum(axis=2, dtype=np.int64)  # exact
                    R, NIR = Yi[:, 0, :], Yi[:, 2, :]
                    denom = NIR + R
                    valid = denom > 0
                    numer = NIR - R
                    # int32/int32 true-divide promotes to float64 with
                    # the identical quotient values the row path's
                    # float64(int)-operand division produces
                    nd = np.true_divide(numer[valid], denom[valid])
                    vcnt = valid.sum(axis=1)
                    bounds = np.zeros(m + 1, dtype=np.int64)
                    np.cumsum(vcnt, out=bounds[1:])
                    nds = np.zeros(m, dtype=np.float64)
                    for j in range(m):
                        # per-image contiguous slice: same pairwise
                        # np.sum as the row path (order-sensitive floats)
                        nds[j] = nd[bounds[j]:bounds[j + 1]].sum()
                    cls = (Yi[:, 1, :] * N_CLASSES) // 256
                    hmat = np.bincount(
                        (np.arange(m, dtype=np.int32)[:, None] * N_CLASSES
                         + cls).ravel(),
                        minlength=m * N_CLASSES,
                    ).reshape(m, N_CLASSES)
                    # phash: gray = exact int channel sum / 3.0 — the
                    # same ((r+g)+nir)/3 value px.mean(axis=2) produces
                    gray = ((Y[:, 0, :].astype(np.int16) + Y[:, 1, :]
                             + Y[:, 2, :]).astype(np.float64) / 3.0
                            ).reshape(m, h, w)
                    bh, bw = h // 8, w // 8
                    g8 = gray[:, : bh * 8, : bw * 8].reshape(
                        m, 8, bh, 8, bw).mean(axis=(2, 4))
                    gflat = g8.reshape(m, 64)
                    bits = gflat > gflat.mean(axis=1, keepdims=True)
                    ph = (bits.astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum(
                        axis=1, dtype=np.uint64).view(np.int64)
                    px_count[gi] = h * w
                    sums[gi] = s3.astype(np.float64)
                    sumsqs[gi] = ss3.astype(np.float64)
                    ndvi_sum[gi] = nds
                    ndvi_count[gi] = vcnt
                    hists[gi] = hmat
                    phok[gi] = ph == phash_in[gi]

        out = pd.DataFrame({
            "image_id": ids,
            "phash_ok": phok,
            "px_count": px_count,
            "sum_r": sums[:, 0], "sum_g": sums[:, 1], "sum_nir": sums[:, 2],
            "sumsq_r": sumsqs[:, 0], "sumsq_g": sumsqs[:, 1],
            "sumsq_nir": sumsqs[:, 2],
            "ndvi_sum": ndvi_sum,
            "ndvi_count": ndvi_count,
            "class_hist": hists.tolist(),
        })
        for i, row in fallback_rows.items():
            for k, v in row.items():
                out.at[out.index[i], k] = v
        yield out


def decode_partials(images: DataFrame) -> DataFrame:
    """Stage 1: (image_id, bytes, phash) -> per-image partial aggregates."""
    return images.select("image_id", "bytes", "phash").mapInPandas(
        _decode_batches, schema=DECODE_SCHEMA
    )


def zonal_band_stats(partials: DataFrame, zones: DataFrame,
                     zone_key: str = "fips") -> DataFrame:
    """Stage 2a: per-zone mean/std per band + NDVI mean (A11/A12)."""
    j = partials.join(zones, "image_id")
    g = j.groupBy(zone_key).agg(
        F.count("*").alias("n_images"),
        F.sum("px_count").alias("n_pixels"),
        F.sum("sum_r").alias("_sr"), F.sum("sumsq_r").alias("_ssr"),
        F.sum("sum_g").alias("_sg"), F.sum("sumsq_g").alias("_ssg"),
        F.sum("sum_nir").alias("_sn"), F.sum("sumsq_nir").alias("_ssn"),
        F.sum("ndvi_sum").alias("_nds"), F.sum("ndvi_count").alias("_ndc"),
        F.min(F.col("phash_ok").cast("int")).alias("_ok"),
    )
    def mean_std(s, ss, n):
        # try_divide: a zone holding only quarantined (undecodable) images
        # has n_pixels = 0 -> NULL stats + all_phash_ok=False, not an
        # ANSI DIVIDE_BY_ZERO job kill
        mean = F.try_divide(F.col(s), F.col(n))
        var = F.try_divide(F.col(ss), F.col(n)) - mean * mean
        # greatest() skips NULLs, so gate std on n > 0 explicitly or a
        # NULL-mean zone would report std = 0.0
        std = F.when(F.col(n) > 0, F.sqrt(F.greatest(var, F.lit(0.0))))
        return mean, std
    mr, sr = mean_std("_sr", "_ssr", "n_pixels")
    mg, sg = mean_std("_sg", "_ssg", "n_pixels")
    mn, sn = mean_std("_sn", "_ssn", "n_pixels")
    return g.select(
        zone_key, "n_images", "n_pixels",
        mr.alias("mean_r"), sr.alias("std_r"),
        mg.alias("mean_g"), sg.alias("std_g"),
        mn.alias("mean_nir"), sn.alias("std_nir"),
        # try_divide: a zone whose every pixel fails the valid-NDVI mask
        # (nir + red == 0, e.g. all-black imagery) has _ndc = 0 — NULL
        # mean, not the job-killing ANSI DIVIDE_BY_ZERO plain `/` raises
        F.try_divide(F.col("_nds"), F.col("_ndc")).alias("ndvi_mean"),
        (F.col("_ok") == 1).alias("all_phash_ok"),
    )


def zonal_class_histogram(partials: DataFrame, zones: DataFrame,
                          zone_key: str = "fips") -> DataFrame:
    """Stage 2b: per-zone class pixel histogram rows (A2) with percent (A3)."""
    j = partials.join(zones, "image_id")
    exploded = j.select(
        zone_key, F.posexplode("class_hist").alias("class_code", "px")
    )
    per_class = exploded.groupBy(zone_key, "class_code").agg(
        F.sum("px").alias("pixel_count")
    )
    w_total = per_class.groupBy(zone_key).agg(F.sum("pixel_count").alias("_tot"))
    return (
        per_class.join(w_total, zone_key)
        .select(
            zone_key, "class_code", "pixel_count",
            (F.col("pixel_count") * 100.0 / F.col("_tot")).alias("percent"),
        )
    )


def shannon_index(per_class: DataFrame, zone_key: str = "fips") -> DataFrame:
    """A10: fragmentation index -sum(p ln p) / ln(n_classes) per zone
    (reference ``landcover_analyzer_v3.py:401-427``)."""
    nz = per_class.where(F.col("pixel_count") > 0)
    tot = nz.groupBy(zone_key).agg(
        F.sum("pixel_count").alias("_tot"), F.count("*").alias("_ncls")
    )
    p = nz.join(tot, zone_key).withColumn(
        "_p", F.col("pixel_count") / F.col("_tot")
    )
    return p.groupBy(zone_key).agg(
        F.when(
            F.max("_ncls") > 1,
            (-F.sum(F.col("_p") * F.log(F.col("_p")))) / F.log(F.max("_ncls"))
        ).otherwise(F.lit(0.0)).alias("shannon_index")
    )
