import glob
import os
import shutil
import tempfile

from biomass_processing_pipeline_spark.streaming.dedup import (
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
        exp = docs.select("content_hash").distinct().toPandas()
        assert sorted(got.content_hash) == sorted(exp.content_hash)
        assert got.content_hash.is_unique
        # resume: the checkpoint remembers seen keys -> nothing new
        again = run_dedup_stream(spark, src, out, watermark="100000 hours")
        assert again.count() == len(got)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_streaming_dedup_keeps_first_arrival_rows_exactly(spark):
    """FULL-ROW parity, not just the key set: with one file per trigger
    and at most one row per key inside each file, first-arrival
    attribution is deterministic — the surviving row for every key must
    be the one from the earliest file that carries that key."""
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="bpp_sd_rows_src_")
    out = tempfile.mkdtemp(prefix="bpp_sd_rows_out_")
    try:
        base_ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
        file_keys = [
            range(0, 6),    # file 0 introduces keys 0-5
            range(3, 9),    # 3-5 are dups, 6-8 new
            range(6, 12),   # 6-8 dups, 9-11 new
            range(0, 12),   # all dups
        ]
        schema = pa.schema([
            ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("content_hash", pa.int64()), ("text", pa.string()),
        ])
        for i, keys in enumerate(file_keys):
            pdf = pd.DataFrame({
                "doc_id": [1000 * i + k for k in keys],
                "ts": [base_ts + datetime.timedelta(minutes=i)] * len(keys),
                "content_hash": list(keys),
                "text": [f"f{i}-k{k}" for k in keys],
            })
            p = os.path.join(src, f"{i}.parquet")
            pq.write_table(
                pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), p
            )
            # FileStreamSource orders by mtime: pin an increasing sequence
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        got = run_dedup_stream(
            spark, src, out, watermark="100000 hours",
            max_files_per_trigger=1,
        ).toPandas().sort_values("content_hash").reset_index(drop=True)

        first_file = {}
        for i, keys in enumerate(file_keys):
            for k in keys:
                first_file.setdefault(k, i)
        exp = pd.DataFrame({
            "doc_id": [1000 * first_file[k] + k for k in sorted(first_file)],
            "ts": [base_ts + datetime.timedelta(minutes=first_file[k])
                   for k in sorted(first_file)],
            "content_hash": sorted(first_file),
            "text": [f"f{first_file[k]}-k{k}" for k in sorted(first_file)],
        })
        pd.testing.assert_frame_equal(
            got[["doc_id", "ts", "content_hash", "text"]], exp,
            check_dtype=False,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_streaming_image_phash_dedup_matches_batch_groups(spark):
    """IMAGE-payload streaming dedup: re-delivered tile captures (same
    tile_code+phash, later ts, new delivery id) must be dropped on
    arrival; the surviving set must be exactly one row per batch
    exact-signature group (phash_dedup_groups at hamming 0), and — with
    the original-arrivals file triggered first — every survivor must be
    an original, never a re-delivery."""
    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )
    from biomass_processing_pipeline_spark.streaming.dedup import (
        image_stream_fixture,
        run_image_dedup_stream,
    )

    fdir = synth.ensure_fixtures(spark, "sf0.001")
    src = tempfile.mkdtemp(prefix="bpp_sid_src_")
    out = tempfile.mkdtemp(prefix="bpp_sid_out_")
    try:
        stream = image_stream_fixture(spark, fdir, redeliver_mod=3)
        originals = stream.where(~stream.image_id.endswith("_rd"))
        redelivered = stream.where(stream.image_id.endswith("_rd"))
        originals.coalesce(1).write.mode("overwrite").parquet(f"{src}/a")
        redelivered.coalesce(1).write.mode("overwrite").parquet(f"{src}/b")
        for i, f in enumerate(
            glob.glob(f"{src}/a/part-*.parquet")
            + glob.glob(f"{src}/b/part-*.parquet")
        ):
            p = os.path.join(src, f"{i}.parquet")
            shutil.copy(f, p)
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        got = run_image_dedup_stream(
            spark, src, out, watermark="100000 hours",
            max_files_per_trigger=1,
        ).toPandas()

        # one survivor per exact-signature group, none of them re-deliveries
        exp_keys = stream.select("tile_code", "phash").distinct().toPandas()
        assert len(got) == len(exp_keys)
        assert not got.image_id.str.endswith("_rd").any()
        assert sorted(map(tuple, got[["tile_code", "phash"]].values.tolist())) \
            == sorted(map(tuple, exp_keys.values.tolist()))

        # parity with the batch operator at hamming 0: group count matches
        # the streamed survivor count, and each group's size counts the
        # original + its re-deliveries
        groups = phash_dedup_groups(
            stream, "image_id", "phash", max_hamming=0, scope_col="tile_code"
        ).toPandas()
        assert groups.rep_id.nunique() == len(got)
        # per-group size == member count, and groups partition the stream
        per_rep = groups.groupby("rep_id").agg(
            n=("image_id", "size"), size=("group_size", "first")
        )
        assert (per_rep.n == per_rep["size"]).all()
        assert per_rep.n.sum() == len(groups) == stream.count()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
