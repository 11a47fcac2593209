import glob
import os
import shutil
import tempfile

from biomass_processing_pipeline_spark.streaming.dedup import (
    dedup_batch_twin,
    doc_stream_fixture,
    run_dedup_stream,
)


def test_streaming_dedup_matches_batch_distinct(spark):
    """Exact dedup on arrival: the streamed output must contain every
    content key exactly ONCE (state held across incremental triggers),
    matching the batch distinct twin; a checkpointed re-run emits nothing."""
    src = tempfile.mkdtemp(prefix="bpp_sd_src_")
    out = tempfile.mkdtemp(prefix="bpp_sd_out_")
    try:
        docs = doc_stream_fixture(spark, "/root/testdata/sf0.001")
        # two file batches with overlapping hashes to force cross-trigger state
        docs.where("doc_id % 2 = 0").coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/a")
        docs.where("doc_id % 2 = 1").coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/b")
        for i, f in enumerate(
            glob.glob(f"{src}/a/part-*.parquet") + glob.glob(f"{src}/b/part-*.parquet")
        ):
            shutil.copy(f, os.path.join(src, f"{i}.parquet"))

        # watermark far wider than the fixture's ts span: no state expiry,
        # so the run is an exact global dedup
        got = run_dedup_stream(
            spark, src, out, watermark="100000 hours"
        ).toPandas()
        exp = dedup_batch_twin(docs).toPandas()
        assert sorted(got.content_hash) == sorted(exp.content_hash)
        assert got.content_hash.is_unique
        # resume: the checkpoint remembers seen keys -> nothing new
        again = run_dedup_stream(spark, src, out, watermark="100000 hours")
        assert again.count() == len(got)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
