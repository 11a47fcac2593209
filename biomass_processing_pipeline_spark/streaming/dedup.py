"""Streaming exact deduplication (engine extension, SURVEY.md §2.8 x the
LLM-data-pipeline dedup family): a training-data ingest stream must drop
re-crawled / re-delivered duplicate documents ON ARRIVAL, not in a nightly
batch pass.

``dropDuplicatesWithinWatermark`` keeps the first row per content key and
holds per-key state only until the event-time watermark passes it — the
bounded-state streaming twin of ``dedup.exact_dedup``. At 10^12-document
scale the state store is hash-partitioned by the dedup key across
executors, exactly like the batch hash-partition shuffle.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, ts timestamp, content_hash long, text string"
IMAGES_SCHEMA = "image_id string, ts timestamp, tile_code string, phash long"


def run_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    key_cols: list[str] | None = None,
    watermark: str = "24 hours",
    timeout_sec: int = 300,
    max_files_per_trigger: int = 2,
    schema: str = DOCS_SCHEMA,
) -> DataFrame:
    """Incremental exact dedup: readStream over a document directory ->
    event-time watermark -> ``dropDuplicatesWithinWatermark`` on the
    content key -> append-mode parquet sink. availableNow trigger so the
    same code runs reproducibly over a static directory in tests and
    incrementally on a live feed in production; the checkpoint carries the
    dedup state across restarts (a re-run emits nothing new).

    Rows with a NULL dedup key BYPASS the gate: ``dropDuplicates`` treats
    NULLs as equal, so a firehose of quarantined (NULL-hash) documents
    would otherwise collapse to the single first arrival. An unknown key
    can be a duplicate of nothing — those rows pass through to the batch
    layer, whose exact/phash passes apply the same unknown-is-unique rule.
    """
    key_cols = key_cols or ["content_hash"]
    chk = os.path.join(out_dir, "_chk")
    dst = os.path.join(out_dir, "deduped")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    key_ok = reduce(
        lambda a, b: a & b, [F.col(k).isNotNull() for k in key_cols]
    )
    wm = stream.withWatermark("ts", watermark)
    deduped = (
        wm.where(key_ok)
        .dropDuplicatesWithinWatermark(key_cols)
        .unionByName(wm.where(~key_ok))
    )
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", dst)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        # the availableNow query may still be writing — reading the sink
        # now would silently return partial dedup output
        q.stop()
        raise TimeoutError(
            f"dedup stream did not finish within {timeout_sec}s"
        )
    return spark.read.parquet(dst)


def doc_stream_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document-arrival stream derived from the events
    table: content_hash = event_id % 500 plants heavy cross-batch
    duplication (every hash arrives many times)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").alias("doc_id"),
        F.col("ts"),
        F.pmod(F.col("event_id"), F.lit(500)).alias("content_hash"),
        F.concat(F.lit("doc body "), F.col("event_id")).alias("text"),
    )


def image_stream_fixture(spark: SparkSession, fixture_dir: str,
                         redeliver_mod: int = 3) -> DataFrame:
    """Deterministic image-arrival stream from the image fixture: every
    image arrives once (ts = epoch + seq seconds), and every
    ``redeliver_mod``-th image is RE-DELIVERED an hour later under a new
    delivery id (a re-crawled tile upload: same tile, same pixels, so the
    same phash — the content key). Key = (tile_code, phash): the
    streaming twin of the batch ``phash_dedup_groups`` exact-signature
    collapse."""
    imgs = spark.read.parquet(f"{fixture_dir}/images.parquet").select(
        "image_id", "phash",
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})$", 1).cast("long").alias("_seq"),
    )
    base = imgs.select(
        "image_id",
        (F.timestamp_seconds(F.lit(1_700_000_000) + F.col("_seq"))).alias("ts"),
        "tile_code", "phash",
    )
    redelivered = imgs.where(F.col("_seq") % redeliver_mod == 0).select(
        F.concat(F.col("image_id"), F.lit("_rd")).alias("image_id"),
        (F.timestamp_seconds(
            F.lit(1_700_000_000 + 3600) + F.col("_seq"))).alias("ts"),
        "tile_code", "phash",
    )
    return base.unionByName(redelivered)


def _popcount64(x):
    """Vectorized 64-bit popcount (SWAR) over an int64/uint64 array —
    works on any numpy version (np.bitwise_count needs >= 2.0)."""
    import numpy as np

    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h1 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return ((x * h1) >> np.uint64(56)).astype(np.int64)


def drift_gate_core(
    phash, ts_s, kept_sigs, kept_ts, max_hamming: int, horizon_s: int,
):
    """Pure greedy arrival-order near-dup gate for ONE tile's batch
    (rows pre-sorted by event time): an arrival is dropped iff it is
    within ``max_hamming`` of an earlier KEPT capture of the same tile
    whose event time is inside the row's ``horizon_s`` window. Returns
    (keep_mask, new_sigs, new_ts) with entries older than
    ``event-time watermark - horizon_s`` evicted — the bounded-state rule.

    The kept STATE makes no ordering assumption: a later micro-batch can
    carry OLDER event times than an earlier one (out-of-order file
    arrival), so kept entries append out of event-time order across
    batches. Liveness is therefore a per-row ``ts >= cutoff`` MASK, not a
    sorted-prefix pointer (a prefix scan would stall on one large entry,
    never evict the smaller ones behind it — unbounded state — and gate
    rows against a wrong window), and eviction uses the monotone
    watermark ``max(event time seen)``, which an out-of-order batch
    cannot move backwards.

    The row loop is inherently sequential (each kept row changes the
    verdict for later rows); the Hamming + liveness check per row is
    vectorized against the tile's kept set, packed ONCE per batch into
    int64 arrays (state) plus a preallocated append buffer — no per-row
    list repacking. Greedy first-arrival semantics: a drift CHAIN
    (a~b~c with a!~c) keeps a and possibly c — the batch
    ``phash_dedup_groups`` CC pass is the transitive-closure authority,
    this gate only thins the firehose on arrival.
    """
    import numpy as np

    n = len(phash)
    if n == 0:
        return np.zeros(0, dtype=bool), list(kept_sigs), list(kept_ts)
    st_sigs = np.asarray(kept_sigs, dtype=np.int64)
    st_tss = np.asarray(kept_ts, dtype=np.int64)
    app_sigs = np.empty(n, dtype=np.int64)
    app_tss = np.empty(n, dtype=np.int64)
    n_app = 0
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        t = int(ts_s[i])
        cutoff = t - horizon_s
        p = np.int64(phash[i])
        dup = False
        if st_sigs.size:
            ham = _popcount64(st_sigs ^ p)
            dup = bool(((ham <= max_hamming) & (st_tss >= cutoff)).any())
        if not dup and n_app:
            ham = _popcount64(app_sigs[:n_app] ^ p)
            dup = bool(
                ((ham <= max_hamming) & (app_tss[:n_app] >= cutoff)).any()
            )
        if not dup:
            app_sigs[n_app] = p
            app_tss[n_app] = t
            n_app += 1
            keep[i] = True
    watermark = int(ts_s[-1])  # batch rows pre-sorted by event time
    if st_tss.size:
        watermark = max(watermark, int(st_tss.max()))
    cutoff = watermark - horizon_s
    live_st = st_tss >= cutoff
    live_app = app_tss[:n_app] >= cutoff
    new_sigs = (
        [int(s) for s in st_sigs[live_st]]
        + [int(s) for s in app_sigs[:n_app][live_app]]
    )
    new_tss = (
        [int(t) for t in st_tss[live_st]]
        + [int(t) for t in app_tss[:n_app][live_app]]
    )
    return keep, new_sigs, new_tss


def run_image_driftdedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    max_hamming: int = 2,
    horizon_sec: int = 86_400,
    timeout_sec: int = 300,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming image NEAR-dup gate: where ``run_image_dedup_stream``
    only drops exact (tile, phash) re-deliveries, this drops re-ENCODED
    captures whose phash drifted by up to ``max_hamming`` bits (a
    re-compressed upload of the same tile scene). Per-tile GroupState
    holds the kept signatures of the active ``horizon_sec`` window —
    state is bounded by each tile's distinct kept sigs in the window,
    exactly the batch pipeline's distinct-(tile, sig) vertex set, and the
    greedy arrival-order semantics are ``drift_gate_core`` (unit-tested
    against a batch reference). availableNow + checkpoint as in
    ``run_dedup_stream``.

    Rows with a NULL tile_code, phash or ts BYPASS the gate: an
    unhashed capture can be compared to nothing (and int64-casting a
    NULL phash inside the kernel would produce garbage bits), and an
    un-attributable (NULL-tile) capture must not gate against other
    unknown-location captures that merely look alike. They pass through
    to the batch layer, where ``phash_dedup_groups`` applies the same
    NULL-sig-is-singleton rule."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    chk = os.path.join(out_dir, "_chk")
    dst = os.path.join(out_dir, "deduped")

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        sigs, tss = state.get if state.exists else ([], [])
        sigs, tss = list(sigs), list(tss)
        # one tile's micro-batch can arrive as SEVERAL Arrow chunks
        # (arrow.maxRecordsPerBatch); sorting each chunk independently
        # would gate WITHIN the micro-batch out of event-time order
        # (drift_gate_core's greedy pass wants batch rows time-sorted;
        # across batches it assumes nothing — out-of-order arrival is
        # handled by its liveness mask + watermark eviction). Materialize
        # the group — bounded by one tile x one micro-batch — and sort
        # ONCE.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            pdf = pdf.sort_values("ts", kind="stable")
            ph = pdf["phash"].to_numpy(np.int64)
            t_s = (pdf["ts"].astype("int64") // 10**9).to_numpy()
            keep, sigs, tss = drift_gate_core(
                ph, t_s, sigs, tss, max_hamming, horizon_sec
            )
            out = pdf[keep]
            if len(out):
                yield out
        state.update((sigs, tss))

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    ok = (
        F.col("tile_code").isNotNull() & F.col("phash").isNotNull()
        & F.col("ts").isNotNull()
    )
    gated = stream.where(ok).groupBy("tile_code").applyInPandasWithState(
        gate,
        outputStructType=IMAGES_SCHEMA,
        stateStructType="sigs array<long>, tss array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).unionByName(stream.where(~ok))
    q = (
        gated.writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", dst)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"drift dedup stream did not finish within {timeout_sec}s"
        )
    return spark.read.parquet(dst)


def image_drift_stream_fixture(spark, fixture_dir: str,
                               redeliver_mod: int = 3) -> DataFrame:
    """Drift variant of ``image_stream_fixture``: every
    ``redeliver_mod``-th image is re-delivered much later as a RE-ENCODED
    capture — same scene, but the perceptual hash drifted by 1 bit (2 for
    even seqs), under a new delivery id. The re-delivery offset (1e6 s)
    exceeds any seq, so event-time order equals file order and a greedy
    batch reference is well-defined."""
    imgs = spark.read.parquet(f"{fixture_dir}/images.parquet").select(
        "image_id", "phash",
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})$", 1).cast("long").alias("_seq"),
    )
    base = imgs.select(
        "image_id",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("_seq")).alias("ts"),
        "tile_code", "phash",
    )
    flip1 = F.expr("shiftleft(1L, cast(_seq % 60 as int))")
    flip2 = F.expr("shiftleft(1L, cast((_seq * 7 + 13) % 60 as int))")
    drifted = imgs.where(F.col("_seq") % redeliver_mod == 0).select(
        F.concat(F.col("image_id"), F.lit("_re")).alias("image_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000 + 1_000_000) + F.col("_seq")
        ).alias("ts"),
        "tile_code",
        F.when(
            F.col("_seq") % 2 == 0,
            F.col("phash").bitwiseXOR(flip1).bitwiseXOR(flip2),
        ).otherwise(F.col("phash").bitwiseXOR(flip1)).alias("phash"),
    )
    return base.unionByName(drifted)


def run_image_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    watermark: str = "24 hours",
    timeout_sec: int = 300,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Streaming image near-dup ingest gate: drop re-delivered captures of
    a tile ON ARRIVAL, keyed by (tile_code, phash) — the exact-signature
    level of the batch ``phash_dedup_groups`` (its banding/CC near-dup
    stage then runs over the already-thinned stream output). State is
    hash-partitioned by the key and bounded by the watermark, so a
    10^12-image firehose holds only the active window's distinct
    (tile, sig) pairs."""
    return run_dedup_stream(
        spark, src_dir, out_dir,
        key_cols=["tile_code", "phash"],
        watermark=watermark,
        timeout_sec=timeout_sec,
        max_files_per_trigger=max_files_per_trigger,
        schema=IMAGES_SCHEMA,
    )
