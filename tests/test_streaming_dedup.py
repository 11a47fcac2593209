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


def test_drift_gate_core_greedy_and_eviction():
    """Pure-function contract of the streaming drift gate: greedy
    first-arrival keeps, chain semantics (a~b~c with a!~c keeps a and c),
    and horizon eviction bounds the kept-signature state."""
    import numpy as np

    from biomass_processing_pipeline_spark.streaming.dedup import (
        drift_gate_core,
    )

    # chain: b within 1 bit of a; c within 1 bit of b but 2 bits of a
    a, b, c = 0b0000, 0b0001, 0b0011
    keep, sigs, tss = drift_gate_core(
        np.array([a, b, c], dtype=np.int64), np.array([10, 20, 30]),
        [], [], max_hamming=1, horizon_s=1000,
    )
    # b drops (1 bit from kept a); c is 2 bits from the only KEPT sig a
    # (b never entered the state), so greedy keeps it
    assert list(keep) == [True, False, True]
    assert sigs == [a, c] and tss == [10, 30]
    keep2, _, _ = drift_gate_core(
        np.array([a, b, c], dtype=np.int64), np.array([10, 20, 30]),
        [], [], max_hamming=2, horizon_s=1000,
    )
    assert list(keep2) == [True, False, False]  # budget 2 reaches c via a

    # eviction: an old kept sig ages out, so a later duplicate re-enters
    keep3, sigs3, tss3 = drift_gate_core(
        np.array([a], dtype=np.int64), np.array([100]), [], [],
        max_hamming=1, horizon_s=50,
    )
    assert list(keep3) == [True]
    keep4, sigs4, tss4 = drift_gate_core(
        np.array([a], dtype=np.int64), np.array([1000]), sigs3, tss3,
        max_hamming=1, horizon_s=50,
    )
    assert list(keep4) == [True]          # old state evicted -> kept again
    assert sigs4 == [a] and tss4 == [1000]  # state bounded: one live entry


def test_streaming_image_drift_dedup_matches_greedy_reference(spark):
    """Drift gate end-to-end: re-encoded re-deliveries whose phash drifted
    1-2 bits must be dropped on arrival. The streamed survivor set must
    EQUAL a greedy batch reference (drift_gate_core over each tile's rows
    in event-time order), every dropped row must be within max_hamming of
    an earlier same-tile survivor (soundness), and — originals triggering
    first — drifted re-deliveries of surviving originals must all drop."""
    import numpy as np

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.streaming.dedup import (
        drift_gate_core,
        image_drift_stream_fixture,
        run_image_driftdedup_stream,
    )

    fdir = synth.ensure_fixtures(spark, "sf0.001")
    src = tempfile.mkdtemp(prefix="bpp_sdd_src_")
    out = tempfile.mkdtemp(prefix="bpp_sdd_out_")
    try:
        stream = image_drift_stream_fixture(spark, fdir, redeliver_mod=3)
        originals = stream.where(~stream.image_id.endswith("_re"))
        drifted = stream.where(stream.image_id.endswith("_re"))
        originals.coalesce(1).write.mode("overwrite").parquet(f"{src}/a")
        drifted.coalesce(1).write.mode("overwrite").parquet(f"{src}/b")
        for i, f in enumerate(
            glob.glob(f"{src}/a/part-*.parquet")
            + glob.glob(f"{src}/b/part-*.parquet")
        ):
            p = os.path.join(src, f"{i}.parquet")
            shutil.copy(f, p)
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        h = 2
        got = run_image_driftdedup_stream(
            spark, src, out, max_hamming=h, horizon_sec=10_000_000,
        ).toPandas()

        # greedy batch reference per tile, rows in event-time order
        all_rows = stream.toPandas().sort_values(
            ["tile_code", "ts", "image_id"], kind="stable"
        )
        exp_ids = []
        for tile, grp in all_rows.groupby("tile_code"):
            keep, _, _ = drift_gate_core(
                grp.phash.to_numpy(np.int64),
                (grp.ts.astype("int64") // 10**9).to_numpy(),
                [], [], max_hamming=h, horizon_s=10_000_000,
            )
            exp_ids.extend(grp.image_id.to_numpy()[keep])
        assert sorted(got.image_id) == sorted(exp_ids)

        # soundness: every dropped row is within h of an EARLIER survivor
        # of the same tile
        surv = got.set_index("image_id")
        dropped = all_rows[~all_rows.image_id.isin(surv.index)]
        assert len(dropped) > 0  # the fixture really exercises the gate
        for tile, grp in dropped.groupby("tile_code"):
            s = got[got.tile_code == tile]
            for r in grp.itertuples(index=False):
                earlier = s[s.ts <= r.ts]
                ham = np.array([
                    bin((int(p) ^ int(r.phash)) & ((1 << 64) - 1)).count("1")
                    for p in earlier.phash
                ])
                assert (ham <= h).any(), (tile, r.image_id)
        # every drifted re-delivery of a SURVIVING original must be gone
        re_of_surv = all_rows[
            all_rows.image_id.str.endswith("_re")
            & all_rows.image_id.str[:-3].isin(surv.index)
        ]
        assert not re_of_surv.image_id.isin(surv.index).any()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_streaming_drift_gate_group_spans_arrow_chunks(spark):
    """A tile group LARGER than one Arrow record batch must be gated in
    global event-time order. Regression: sorting each chunk of the
    applyInPandasWithState iterator independently let a LATER capture
    claim the kept slot when the earliest event sat in a later chunk
    (file order here is ts-DESCENDING, so the greedy winner is in the
    final chunk)."""
    import pandas as pd

    from biomass_processing_pipeline_spark.streaming.dedup import (
        run_image_driftdedup_stream,
    )

    src = tempfile.mkdtemp(prefix="bpp_sdc_src_")
    out = tempfile.mkdtemp(prefix="bpp_sdc_out_")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        n = 14  # 14 rows / chunks of 4 -> the min-ts row is in chunk 4
        rows = pd.DataFrame({
            "image_id": [f"c{i:02d}" for i in range(n)],
            # ts DESCENDING in file/arrival order; all same tile + phash
            "ts": pd.to_datetime(2_000_000 - 1000 * pd.RangeIndex(n),
                                 unit="s"),
            "tile_code": ["T01"] * n,
            "phash": [0x5A5A_5A5A] * n,
        })
        spark.createDataFrame(rows).coalesce(1).write.mode(
            "overwrite").parquet(f"{src}/a")
        for f in glob.glob(f"{src}/a/part-*.parquet"):
            shutil.copy(f, os.path.join(src, "0.parquet"))

        got = run_image_driftdedup_stream(
            spark, src, out, max_hamming=2, horizon_sec=10_000_000,
        ).toPandas()
        # identical sigs within the horizon: exactly one survivor, and it
        # must be the EARLIEST event (c13, the last row of the file)
        assert list(got.image_id) == [f"c{n - 1:02d}"]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# property fuzz: drift_gate_core vs a naive quadratic reference
# ---------------------------------------------------------------------------

def _naive_drift_gate(phash, ts_s, kept_sigs, kept_ts, max_hamming,
                      horizon_s):
    """Obviously-correct O(rows x kept) reference for drift_gate_core: the
    live set is recomputed per row by a FULL scan (no vectorized popcount,
    no ordering assumption on the kept state) and the final state is every
    kept entry inside the horizon of the event-time WATERMARK (max event
    time seen across state and batch — the monotone eviction bound)."""
    kept = list(zip(kept_sigs, kept_ts))
    keep = []
    for p, t in zip(phash, ts_s):
        cutoff = int(t) - horizon_s
        live = [s for s, kt in kept if kt >= cutoff]
        dup = any(
            bin((int(s) ^ int(p)) & ((1 << 64) - 1)).count("1") <= max_hamming
            for s in live
        )
        keep.append(not dup)
        if not dup:
            kept.append((int(p), int(t)))
    if not len(ts_s):
        live_kept = kept
    else:
        watermark = max([int(ts_s[-1])] + [kt for _, kt in kept])
        cutoff = watermark - horizon_s
        live_kept = [(s, kt) for s, kt in kept if kt >= cutoff]
    return keep, [s for s, _ in live_kept], [t for _, t in live_kept]


def test_drift_gate_core_fuzz_vs_naive_reference():
    """Hypothesis fuzz of the streaming drift gate's pure core against the
    naive reference: random CLUSTERED signatures (so Hamming hits actually
    occur), random horizons that force mid-batch eviction, and a random
    UNORDERED pre-seeded state (the cross-micro-batch case, including
    out-of-order file arrival where a batch predates state entries).
    Exercises the liveness mask, watermark eviction and the SWAR popcount
    together."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biomass_processing_pipeline_spark.streaming.dedup import (
        drift_gate_core,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def run(data):
        rng_seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(rng_seed)
        n_state = data.draw(st.integers(0, 6))
        n_rows = data.draw(st.integers(0, 24))
        max_hamming = data.draw(st.integers(0, 3))
        horizon = data.draw(st.integers(1, 50))
        # few base signatures + small bit flips -> dense near-dup space
        bases = rng.integers(-2**63, 2**63 - 1, size=3, dtype=np.int64)
        def sig():
            b = int(bases[rng.integers(0, len(bases))])
            flips = rng.integers(0, 64, size=rng.integers(0, 4))
            for f in flips:
                b ^= 1 << int(f)
            return np.int64(np.uint64(b & ((1 << 64) - 1)))
        # batch rows are ts-sorted (the gate sorts each micro-batch) but
        # the STATE carries no ordering guarantee: out-of-order file
        # arrival appends old event times after new ones, and a whole
        # batch may predate part of the state — generate both
        state_ts = [int(x) for x in rng.integers(0, 60, size=n_state)]
        row_ts = sorted(int(x) for x in rng.integers(0, 80, size=n_rows))
        state_sigs = [int(sig()) for _ in range(n_state)]
        phash = np.array([sig() for _ in range(n_rows)], dtype=np.int64)
        ts_arr = np.array(row_ts, dtype=np.int64)

        keep, sigs, tss = drift_gate_core(
            phash, ts_arr, list(state_sigs), list(state_ts),
            max_hamming, horizon,
        )
        ref_keep, ref_sigs, ref_ts = _naive_drift_gate(
            phash, ts_arr, state_sigs, state_ts, max_hamming, horizon,
        )
        assert list(keep) == ref_keep
        assert [int(s) for s in sigs] == [int(s) for s in ref_sigs]
        assert [int(t) for t in tss] == [int(t) for t in ref_ts]
        # state boundedness: every returned entry is inside the horizon of
        # the event-time watermark (when any rows were processed)
        if n_rows:
            watermark = max([row_ts[-1]] + state_ts)
            assert all(t >= watermark - horizon for t in tss)

    run()


def test_drift_gate_out_of_order_batches_evict_and_gate_correctly():
    """Cross-micro-batch out-of-order arrival: batch 2 carries OLDER event
    times than batch 1 (a late-arriving file). The old prefix-eviction
    pointer stalled on batch 1's large timestamps and never evicted the
    late entries behind them (state leak), and gated late rows against a
    wrong window. The mask/watermark core must (a) gate batch-2 rows
    against ALL live kept entries including future-event-time ones
    (greedy arrival order), (b) keep state bounded by the watermark."""
    import numpy as np

    from biomass_processing_pipeline_spark.streaming.dedup import (
        drift_gate_core,
    )

    horizon = 200
    # batch 1: two kept captures at t=1000, 1090 (Hamming 2 apart > 1)
    keep1, sigs1, tss1 = drift_gate_core(
        np.array([1 << 20, 1 << 40], dtype=np.int64),
        np.array([1000, 1090], dtype=np.int64), [], [], 1, horizon,
    )
    assert list(keep1) == [True, True]
    # batch 2 arrives LATE: t=940 is a novel sig (kept, appended AFTER the
    # larger timestamps -> state goes out of event-time order); t=950 is
    # Hamming-1 from the t=1000 keep, which sits in its event-time FUTURE
    # but is an earlier ARRIVAL -> dropped greedily
    keep2, sigs2, tss2 = drift_gate_core(
        np.array([1 << 60, (1 << 20) ^ 1], dtype=np.int64),
        np.array([940, 950], dtype=np.int64), sigs1, tss1, 1, horizon,
    )
    assert list(keep2) == [True, False]
    assert set(tss2) == {1000, 1090, 940}  # state now out of order
    # batch 3 at t=1200: watermark 1200, cutoff 1000 -> the late t=940
    # entry (and nothing else) must evict even though it sits BEHIND
    # larger timestamps in the state list, and its sig must no longer
    # gate. The old prefix pointer stalled at tss[0]=1000: it kept the
    # dead 940 entry forever (leak) AND dropped this row against it.
    keep3, sigs3, tss3 = drift_gate_core(
        np.array([(1 << 60) ^ 1], dtype=np.int64),
        np.array([1200], dtype=np.int64), sigs2, tss2, 1, horizon,
    )
    assert list(keep3) == [True]
    assert set(tss3) == {1000, 1090, 1200}
    assert 940 not in tss3 and (1 << 60) not in sigs3


def test_popcount64_fuzz_vs_python_bincount():
    """SWAR popcount == Python's bit_count over the full int64 range,
    including the sign bit and both extremes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biomass_processing_pipeline_spark.streaming.dedup import _popcount64

    @settings(max_examples=300, deadline=None)
    @given(st.lists(
        st.integers(-2**63, 2**63 - 1), min_size=1, max_size=64,
    ))
    def run(vals):
        arr = np.array(vals, dtype=np.int64)
        got = _popcount64(arr)
        exp = [bin(v & ((1 << 64) - 1)).count("1") for v in vals]
        assert list(got) == exp

    run()


def test_streaming_null_keys_bypass_dedup_and_drift_gates(spark):
    """Rows with NULL dedup keys must PASS THROUGH both streaming gates:
    dropDuplicates treats NULLs as equal (a firehose of quarantined
    NULL-hash docs would collapse to the first arrival), and the drift
    gate's int64 cast of a NULL phash would produce garbage bits. An
    unknown key can be a duplicate of nothing — the batch layer's
    unknown-is-unique rule applies on arrival too."""
    import datetime

    import pandas as pd

    from biomass_processing_pipeline_spark.streaming.dedup import (
        run_dedup_stream, run_image_driftdedup_stream, IMAGES_SCHEMA,
    )

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    # exact gate: one real dup pair + three NULL-hash docs
    src = tempfile.mkdtemp(prefix="bpp_sdnull_src_")
    out = tempfile.mkdtemp(prefix="bpp_sdnull_out_")
    src2 = tempfile.mkdtemp(prefix="bpp_drnull_src_")
    out2 = tempfile.mkdtemp(prefix="bpp_drnull_out_")
    try:
        docs = spark.createDataFrame(
            [(1, ts(0), 10, "x"), (2, ts(1), 10, "x"),
             (3, ts(0), None, "q1"), (4, ts(1), None, "q2"),
             (5, ts(2), None, "q3")],
            "doc_id long, ts timestamp, content_hash long, text string")
        docs.coalesce(1).write.parquet(f"{src}/a")
        for i, f in enumerate(glob.glob(f"{src}/a/part-*.parquet")):
            shutil.copy(f, os.path.join(src, f"{i}.parquet"))
        got = run_dedup_stream(
            spark, src, out, watermark="100000 hours"
        ).toPandas()
        assert (got.content_hash == 10).sum() == 1  # real dups still gate
        assert sorted(got[got.content_hash.isna()].doc_id) == [3, 4, 5]

        # drift gate: an exact redelivery gates; NULL phash / NULL tile
        # rows all survive
        imgs = spark.createDataFrame(
            [("a1", ts(0), "T01", 5), ("a2", ts(1), "T01", 5),
             ("n1", ts(0), "T01", None), ("n2", ts(1), "T01", None),
             ("m1", ts(0), None, 7), ("m2", ts(1), None, 7)],
            IMAGES_SCHEMA)
        imgs.coalesce(1).write.parquet(f"{src2}/a")
        for i, f in enumerate(glob.glob(f"{src2}/a/part-*.parquet")):
            shutil.copy(f, os.path.join(src2, f"{i}.parquet"))
        got2 = run_image_driftdedup_stream(
            spark, src2, out2, max_hamming=2, horizon_sec=10**9
        ).toPandas()
        assert set(got2.image_id) == {"a1", "n1", "n2", "m1", "m2"}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(src2, ignore_errors=True)
        shutil.rmtree(out2, ignore_errors=True)
