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


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for t in pdf.itertuples(index=False):
            # quarantine, don't crash: one corrupt blob in a 10^12-image
            # scan must become a flagged zero-partial row (phash_ok=False,
            # px_count=0 -> NULL zone stats via try_divide downstream,
            # all_phash_ok=False), not a dead job. The bytes are
            # untrusted input; decode/phash failures of ANY kind count.
            try:
                px = imaging.decode_image(t.bytes)
                ok = bool(imaging.phash64(px) == t.phash)
            except Exception:
                rows.append({
                    "image_id": t.image_id, "phash_ok": False,
                    "px_count": 0, "sum_r": 0.0, "sum_g": 0.0,
                    "sum_nir": 0.0, "sumsq_r": 0.0, "sumsq_g": 0.0,
                    "sumsq_nir": 0.0, "ndvi_sum": 0.0, "ndvi_count": 0,
                    "class_hist": [0] * N_CLASSES,
                })
                continue
            f = px.astype(np.float64)
            r, nir = f[:, :, 0], f[:, :, 2]
            denom = nir + r
            valid = denom > 0
            ndvi = (nir - r)[valid] / denom[valid]
            classes = (px[:, :, 1].astype(np.int64) * N_CLASSES) // 256
            hist = np.bincount(classes.ravel(), minlength=N_CLASSES)
            rows.append({
                "image_id": t.image_id,
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
            })
        yield pd.DataFrame(rows)


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
