import glob
import os
import shutil
import tempfile

from biomass_processing_pipeline_spark.streaming.windows import (
    run_windowed_stream,
    windowed_counts_batch,
)


def test_windowed_stream_matches_batch(spark):
    src = tempfile.mkdtemp(prefix="bpp_ws_src_")
    out = tempfile.mkdtemp(prefix="bpp_ws_out_")
    try:
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        # split the table into two file batches to force incremental triggers
        events.where("event_id % 2 = 0").coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/a")
        events.where("event_id % 2 = 1").coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b")
        for i, f in enumerate(
            glob.glob(f"{src}/a/part-*.parquet") + glob.glob(f"{src}/b/part-*.parquet")
        ):
            shutil.copy(f, os.path.join(src, f"{i}.parquet"))

        got = run_windowed_stream(spark, src, out).toPandas()
        # append mode only emits windows sealed by the watermark; every
        # emitted window must match the batch twin exactly
        exp = windowed_counts_batch(events).toPandas()
        key = ["window_start", "event_type"]
        merged = got.merge(exp, on=key, suffixes=("_s", "_b"))
        assert len(merged) == len(got) and len(got) > 0
        assert (merged.n_events_s == merged.n_events_b).all()
        assert (merged.sum_value_s == merged.sum_value_b).all()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
