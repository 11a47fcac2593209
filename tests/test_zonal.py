import numpy as np
import pandas as pd

from biomass_processing_pipeline_spark.operators.zonal import (
    decode_partials,
    shannon_index,
    zonal_band_stats,
    zonal_class_histogram,
)
from biomass_processing_pipeline_spark.sources.images import load_images


def _zones(spark, smoke_dir):
    return spark.read.parquet(f"{smoke_dir}/golden_image_county.parquet")


def test_decode_partials_match_synthesis_golden(spark, smoke_dir):
    images = load_images(spark, smoke_dir)
    got = decode_partials(images.limit(300)).toPandas().set_index("image_id")
    gold = (
        pd.read_parquet(f"{smoke_dir}/golden_zonal_image.parquet")
        .set_index("image_id")
        .loc[got.index]
    )
    assert got["phash_ok"].all()  # decode-integrity oracle (input_hint)
    for c in ["px_count", "sum_r", "sum_nir", "sumsq_g", "ndvi_count"]:
        assert np.allclose(got[c], gold[c]), c
    assert np.allclose(np.vstack(got.class_hist), np.vstack(gold.class_hist))


def test_zonal_band_stats_vs_pandas_oracle(spark, smoke_dir):
    images = load_images(spark, smoke_dir)
    zones = _zones(spark, smoke_dir)
    got = (
        zonal_band_stats(decode_partials(images), zones)
        .toPandas()
        .set_index("fips")
        .sort_index()
    )
    gold = pd.read_parquet(f"{smoke_dir}/golden_zonal_image.parquet").merge(
        pd.read_parquet(f"{smoke_dir}/golden_image_county.parquet"), on="image_id"
    )
    g = gold.groupby("fips").agg(
        n_pixels=("px_count", "sum"), sum_r=("sum_r", "sum"),
        sumsq_r=("sumsq_r", "sum"), nds=("ndvi_sum", "sum"), ndc=("ndvi_count", "sum"),
    )
    assert got["all_phash_ok"].all()
    assert (got["n_pixels"] == g["n_pixels"]).all()
    assert np.allclose(got["mean_r"], g["sum_r"] / g["n_pixels"])
    mean = g["sum_r"] / g["n_pixels"]
    std = np.sqrt(g["sumsq_r"] / g["n_pixels"] - mean**2)
    assert np.allclose(got["std_r"], std)
    assert np.allclose(got["ndvi_mean"], g["nds"] / g["ndc"])


def test_class_histogram_and_shannon(spark, smoke_dir):
    images = load_images(spark, smoke_dir)
    zones = _zones(spark, smoke_dir)
    per_class = zonal_class_histogram(decode_partials(images), zones)
    pc = per_class.toPandas()
    # percents sum to ~100 per zone (reference plausibility check,
    # landcover_analyzer_v3.py:588-590)
    sums = pc.groupby("fips")["percent"].sum()
    assert np.allclose(sums, 100.0, atol=1e-6)
    sh = shannon_index(per_class).toPandas().set_index("fips")
    # oracle: recompute from the histogram rows in pandas
    for fips, grp in pc.groupby("fips"):
        p = grp.pixel_count / grp.pixel_count.sum()
        p = p[p > 0]
        expect = -(p * np.log(p)).sum() / np.log(len(p)) if len(p) > 1 else 0.0
        assert abs(sh.loc[fips, "shannon_index"] - expect) < 1e-9
    assert ((sh.shannon_index >= 0) & (sh.shannon_index <= 1.0 + 1e-9)).all()


def test_all_black_zone_yields_null_ndvi_not_crash(spark):
    """A zone whose every pixel fails the valid-NDVI mask (nir + red == 0:
    all-black imagery, a plausible real capture) must produce a NULL
    ndvi_mean — under Spark 4's default ANSI mode the former plain `/`
    raised DIVIDE_BY_ZERO and one such image killed the whole job."""
    import pandas as pd

    from biomass_processing_pipeline_spark import imaging

    black = np.zeros((8, 8, 3), dtype=np.uint8)
    normal = np.full((8, 8, 3), 40, dtype=np.uint8)
    rows = [
        ("img_black", imaging.encode_image(black, "raw"), 8, 8, "raw",
         "cap", imaging.phash64(black)),
        ("img_normal", imaging.encode_image(normal, "raw"), 8, 8, "raw",
         "cap", imaging.phash64(normal)),
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    zones = spark.createDataFrame(
        [("img_black", "00001"), ("img_normal", "00002")],
        "image_id string, fips string")
    got = (zonal_band_stats(decode_partials(images), zones)
           .toPandas().set_index("fips").sort_index())
    assert pd.isna(got.loc["00001", "ndvi_mean"])  # NULL, not a crash
    assert got.loc["00001", "mean_r"] == 0.0
    assert np.isfinite(got.loc["00002", "ndvi_mean"])


def test_corrupt_blob_quarantined_not_fatal(spark):
    """One corrupt blob in a 10^12-image scan must become a flagged
    zero-partial row (phash_ok=False, NULL zone stats), not a dead job."""
    import pandas as pd

    from biomass_processing_pipeline_spark import imaging

    good_px = np.full((8, 8, 3), 40, dtype=np.uint8)
    rows = [
        ("img_good", imaging.encode_image(good_px, "raw"), 8, 8, "raw",
         "cap", imaging.phash64(good_px)),
        ("img_bad", b"\x00garbage-not-a-codec-frame", 8, 8, "raw",
         "cap", 0),
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    got = decode_partials(images).toPandas().set_index("image_id")
    assert bool(got.loc["img_good", "phash_ok"])
    assert not bool(got.loc["img_bad", "phash_ok"])  # quarantined, flagged
    assert got.loc["img_bad", "px_count"] == 0
    assert sum(got.loc["img_bad", "class_hist"]) == 0

    zones = spark.createDataFrame(
        [("img_good", "00001"), ("img_bad", "00009")],
        "image_id string, fips string")
    stats = (zonal_band_stats(decode_partials(images), zones)
             .toPandas().set_index("fips"))
    assert pd.isna(stats.loc["00009", "mean_r"])      # NULL, not crash
    assert pd.isna(stats.loc["00009", "std_r"])       # not 0.0 either
    assert not stats.loc["00009", "all_phash_ok"]
    assert np.isfinite(stats.loc["00001", "mean_r"])
    assert stats.loc["00001", "all_phash_ok"]


def test_batched_decode_bitwise_matches_row_path():
    """The round-6 batched decode kernel must be BIT-identical to the
    row-at-a-time reference (_row_partials — the code the oracle goldens
    were generated with) on a mixed batch: all three codecs, several
    image shapes (grouped stacking), corrupt rows interleaved
    (quarantine), an undersized (<8px) image (per-row fallback), and a
    deliberately wrong stored phash."""
    from biomass_processing_pipeline_spark import imaging
    from biomass_processing_pipeline_spark.operators.zonal import (
        _decode_batches, _row_partials)

    rng = np.random.default_rng(11)
    rows = []
    for i, (h, w) in enumerate([(64, 64), (48, 32), (64, 64), (32, 48),
                                (48, 32), (64, 64), (16, 16), (4, 8)]):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 3 == 0:
            px[:, :, 0] = 0
            px[:, :, 2] = 0  # zero NDVI denominators in play
        fmt = ["raw", "png", "jpeg"][i % 3]
        blob = imaging.encode_image(px, fmt)
        ph = imaging.phash64(imaging.decode_image(blob))
        rows.append((f"img{i}", blob, ph if i != 5 else ph ^ 3))
    rows.insert(2, ("corrupt1", b"XX01junk", 0))
    rows.insert(5, ("corrupt2", imaging.encode_image(
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), "raw")[:50], 0))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "phash"])

    got = pd.concat(list(_decode_batches(iter([pdf]))), ignore_index=True)
    want = pd.DataFrame([
        _row_partials(t.image_id, t.bytes, t.phash)
        for t in pdf.itertuples(index=False)
    ])
    assert list(got.image_id) == list(want.image_id)  # row order kept
    for c in want.columns:
        if c == "class_hist":
            assert all(list(a) == list(b)
                       for a, b in zip(got[c], want[c])), c
        else:
            a = got[c].to_numpy()
            b = want[c].to_numpy()
            assert np.array_equal(a, b), (c, a, b)  # exact, incl. float bits
    assert not got.loc[got.image_id == "img5", "phash_ok"].iloc[0]
    assert not got.loc[got.image_id.str.startswith("corrupt"),
                       "phash_ok"].any()
