import glob
import os
import shutil
import tempfile

from biomass_processing_pipeline_spark.streaming.ingest import ingest_images


def test_incremental_ingest_resumes(spark, smoke_dir):
    src = tempfile.mkdtemp(prefix="bpp_stream_src_")
    out = tempfile.mkdtemp(prefix="bpp_stream_out_")
    try:
        files = sorted(glob.glob(f"{smoke_dir}/images.parquet/part-*.parquet"))
        assert len(files) >= 2
        # phase 1: one file
        shutil.copy(files[0], os.path.join(src, "a.parquet"))
        r1 = ingest_images(spark, src, out)
        assert r1["rows_total"] > 0
        # phase 2: second file lands; only the delta is processed, totals add up
        shutil.copy(files[1], os.path.join(src, "b.parquet"))
        r2 = ingest_images(spark, src, out)
        assert r2["rows_total"] > r1["rows_total"]
        # partials carry the decode schema + cell prefix partitioning
        part = spark.read.parquet(f"{out}/partials")
        assert "ndvi_sum" in part.columns and "cell_prefix" in part.columns
        assert part.count() == r2["rows_total"]
        # phase 3: nothing new -> no growth
        r3 = ingest_images(spark, src, out)
        assert r3["rows_total"] == r2["rows_total"]
        # lineage rows are batch-LOCAL (counted via observe on the write,
        # never a per-batch rescan of the destination): each row is a
        # strict delta and the deltas sum to the total
        lin = spark.read.parquet(f"{out}/_lineage").toPandas()
        assert (lin.rows_batch > 0).all()
        assert lin.rows_batch.sum() == r2["rows_total"]
        assert lin.rows_batch.max() < r2["rows_total"]  # no cumulative rows
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
