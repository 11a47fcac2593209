"""applyInPandasWithState tile tracker: state accumulates across
micro-batches AND across separate invocations (checkpoint resume), and
the final per-tile counters equal the batch ground truth."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.streaming.stateful import run_tile_tracker


def _ground_truth(spark, files):
    df = spark.read.parquet(*files).select(
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})_", 1).alias("date"),
        F.regexp_extract("image_id", r"_(B\d\d)_", 1).alias("band"),
    )
    return df.groupBy("tile_code").agg(
        F.count("*").alias("n_images"),
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"),
        F.countDistinct("band").alias("n_bands"),
    )


def test_stateful_tracker_accumulates_across_runs(spark, smoke_dir):
    src = tempfile.mkdtemp(prefix="bpp_state_src_")
    out = tempfile.mkdtemp(prefix="bpp_state_out_")
    try:
        files = sorted(glob.glob(f"{smoke_dir}/images.parquet/part-*.parquet"))
        assert len(files) >= 2
        shutil.copy(files[0], os.path.join(src, "a.parquet"))
        r1 = run_tile_tracker(spark, src, out).toPandas()
        g1 = _ground_truth(spark, [os.path.join(src, "a.parquet")]).toPandas()
        m1 = g1.merge(r1, on="tile_code", suffixes=("_g", "_e"))
        assert len(m1) == len(g1)
        assert (m1.n_images_g == m1.n_images_e).all()

        # second file lands: a NEW invocation resumes GroupState from the
        # checkpoint — counters must equal the two-file ground truth
        shutil.copy(files[1], os.path.join(src, "b.parquet"))
        r2 = run_tile_tracker(spark, src, out).toPandas()
        g2 = _ground_truth(
            spark, [os.path.join(src, f) for f in ("a.parquet", "b.parquet")]
        ).toPandas()
        m2 = g2.merge(r2, on="tile_code", suffixes=("_g", "_e"))
        assert len(m2) == len(g2)
        assert (m2.n_images_g == m2.n_images_e).all()
        assert (m2.first_date_g == m2.first_date_e).all()
        assert (m2.last_date_g == m2.last_date_e).all()
        assert (m2.n_bands_g == m2.n_bands_e).all()
        assert m2.n_images_g.sum() > m1.n_images_g.sum()  # really grew
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
