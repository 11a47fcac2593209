"""Benchmark harness (driver contract + BASELINE scaling protocol).

Default: run the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

``--workflow``: run the flagship end-to-end resumable workflow once and
print one JSON line (the number BENCH/COMPARISON.md cites).

``--scaling``: run the identical spatial-join + tile-assign job at
local[8] and local[32] (N and 4N cores standing in for N and 4N executors,
per BASELINE.md) in fresh subprocesses and write BENCH/SCALING_RUN.md with
throughput at both plus scaling efficiency.

``--sf1``: the 10x-the-driver-tier leg — fixture-based headline queries,
minhash dedup over a 10x sharded corpus, and the full workflow at sf1
(2M images); reports per-query seconds + the JVM's peak RSS.

Headline queries:

- ``pip_tile``   : the north_rule job — footprint decode -> Morton cell ->
                   broadcast-cover PIP refine -> lattice tile assign (the
                   throughput metric counts images/sec through this)
- ``knn_wagg``   : FUSED ring-expansion kNN (k=50) + distance-weighted agg
- ``zonal``      : binary decode partials -> per-county band stats + hist
- ``intersect``  : parcel x class-polygon exact intersection join
- ``pricing``/``topk``/``wmean``: relational headliners on driver parquet
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _inline_calibration(seconds: float = 2.0) -> float:
    """Single-process busy-loop rate (fixed LCG arithmetic, iterations/sec)
    run in THIS process — the per-round host-speed denominator that lets
    cross-round suite comparisons be ceiling-normalized instead of argued
    from a proxy query (this VM's CPU speed varies ~2x with host
    contention). Deliberately NOT multiprocessing: a spawn pool driven
    from a heredoc re-imports __main__ and recursively re-runs the script
    (documented incident); one pinned-width sample is enough because the
    number is only ever used as a RATIO between rounds."""
    t0 = time.time()
    x, iters = 1, 0
    while True:
        for _ in range(20_000):
            x = (x * 1103515245 + 12345) % 2147483648
        iters += 20_000
        dt = time.time() - t0
        if dt >= seconds:
            return round(iters / dt)


def _emb_x10(spark, sf_dir: str):
    """Deterministic 10x embedding corpus: ten shards of the sf-tier
    vectors, shard i's vectors rotated by i positions. Rotation preserves
    norms and every intra-shard dot product exactly (the shard keeps the
    tier's similarity structure), while cross-shard pairs decorrelate —
    a 10x corpus with the same per-shard neighborhood profile."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").head()[0])
    # shard id offset derived from the ACTUAL id range — a hardcoded 1e6
    # stride would silently collide vec_ids across shards on any tier with
    # >1M vectors, corrupting the top-k ground truth
    stride = int(emb.agg(F.max("vec_id")).head()[0]) + 1
    shards = []
    for i in range(10):
        rolled = F.expr(
            f"concat(slice(embedding, {i + 1}, {dim - i}), "
            f"slice(embedding, 1, {i}))"
        ) if i else F.col("embedding")
        shards.append(emb.select(
            (F.col("vec_id") + F.lit(i * stride)).alias("vec_id"),
            rolled.alias("embedding"),
        ))
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s)
    return out


def run_suite(sf_dir: str, cpus: int) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.intersect import (
        crop_coeff_df, crop_rollup, intersection_join, parcel_crop_summary,
    )
    from biomass_processing_pipeline_spark.operators.knn import (
        knn_weighted_agg_fused,
    )
    from biomass_processing_pipeline_spark.operators.pip import (
        assign_points_to_polygons,
    )
    from biomass_processing_pipeline_spark.operators.tile_assign import (
        assign_images_to_tiles,
    )
    from biomass_processing_pipeline_spark.operators.zonal import (
        decode_partials, zonal_band_stats,
    )
    from biomass_processing_pipeline_spark.queries import (
        q_pricing_summary, q_topk_per_group, q_weighted_mean,
    )
    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )

    cal_start = _inline_calibration()
    tier = synth.tier_for_sf_dir(sf_dir)
    spark = get_spark(
        app_name=f"bpp_bench_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    fdir = synth.ensure_fixtures(spark, tier)  # cached; not timed
    counties = pd.read_parquet(f"{fdir}/counties.parquet")
    tiles = pd.read_parquet(f"{fdir}/tiles.parquet")
    images = load_images(spark, fdir)
    n_images = images.count()

    timings: dict[str, float] = {}
    timings_raw: dict[str, list[float]] = {}

    def timed(name: str, fn, repeats: int = 1):
        best, out = None, None
        raw = []
        for _ in range(repeats):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            raw.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        timings_raw[name] = raw
        return out

    # headline: spatial-join + tile-assign (north_rule throughput metric).
    # BPP_BENCH_MULT virtually scales the id set M-fold (ids are a pure
    # function of seq, so the M-fold input is identical across legs) so the
    # scaling measurement is compute-bound rather than overhead-bound.
    mult = int(os.environ.get("BPP_BENCH_MULT", "1"))
    n_virtual = n_images * mult

    def _ids():
        if mult == 1:
            return images.select("image_id")
        import pandas as _pd

        def _gen(batches):
            for pdf in batches:
                yield _pd.DataFrame(
                    {"image_id": synth.image_meta_np(pdf["id"].to_numpy())["image_id"]}
                )

        return (
            spark.range(n_virtual).repartition(cpus * 2)
            .mapInPandas(_gen, "image_id string")
        )

    from biomass_processing_pipeline_spark.operators.pipeline import (
        build_dictionaries, county_tile_assign,
    )

    dicts = build_dictionaries(spark, counties)

    def _pip_tile():
        fp = with_footprint(_ids())
        return county_tile_assign(
            spark, fp, counties, tiles, point_key="seq", dicts=dicts
        ).count()

    # one untimed warm-up run amortizes JVM codegen + Python-worker spin-up
    # (steady-state throughput is the metric; a real cluster job runs this
    # operator thousands of times per executor lifetime)
    _pip_tile()
    # min-of-2 for the HEADLINE metric too: this host has multi-second
    # steal stalls that can poison any single measurement
    n_assigned = timed("pip_tile", _pip_tile, repeats=2)

    if os.environ.get("BPP_BENCH_ONLY") == "pip_tile":
        spark.stop()
        return {
            "metric": "headline_suite_seconds",
            "value": timings["pip_tile"], "unit": "sec", "queries": timings,
            "calibration": {"start_iters_per_sec": cal_start,
                            "end_iters_per_sec": _inline_calibration()},
            "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
            "cpus": cpus, "n_images": n_virtual, "n_assigned": n_assigned,
            "images_per_sec_pip_tile": round(n_virtual / timings["pip_tile"], 1),
        }

    def _knn():
        # shuffle/sort key = compact long seq, not the 25-char string id;
        # fused operator: agg happens inside the top-k pass, no points x k
        # intermediate is ever materialized or checkpointed
        fp = with_footprint(images.select("image_id")).drop("image_id")
        plots = spark.read.parquet(f"{fdir}/plots.parquet")
        return knn_weighted_agg_fused(
            fp, plots, ["attr_1", "attr_2"], k=50, point_key="seq"
        ).count()

    timed("knn_wagg", _knn, repeats=3)

    def _zonal():
        zones = spark.read.parquet(f"{fdir}/golden_image_county.parquet")
        return zonal_band_stats(decode_partials(images), zones).count()

    # untimed first-touch pass for the only blob-heavy leg (duration
    # disclosed below): a fresh JVM's first multi-GB binary Arrow transfer
    # pays one-time page-fault/allocation cost in this VM — measured
    # 226/35/15/8/9 s across reps of an UNCHANGED plan on an idle host
    # (round-5 probe), i.e. up to 28x the ~8 s steady state. Steady-state
    # throughput is the metric (a real executor runs decode thousands of
    # times per lifetime); hiding the cold rep without disclosure would
    # overstate the window, hence blob_first_touch_s in the output.
    _t_cold = time.time()
    _zonal()
    blob_first_touch = round(time.time() - _t_cold, 3)
    # min-of-3: the first-touch cliff decays over ~3-4 passes (measured
    # 226/35/15/8/9), so two timed reps after one warm pass can still sit
    # 2-3x above steady state
    timed("zonal", _zonal, repeats=3)

    def _intersect():
        # parcel side as a Spark DataFrame: the distributed fact-side path
        # (cover + simplicity gate in mapInPandas over the scan)
        parcels = spark.read.parquet(f"{fdir}/parcels.parquet").select(
            "parcel_id", "fips", "acres", "geom_wkt"
        )
        cpolys = pd.read_parquet(f"{fdir}/class_polygons.parquet")
        inter = intersection_join(spark, parcels, cpolys)
        return parcel_crop_summary(crop_rollup(inter, crop_coeff_df(spark))).count()

    timed("intersect", _intersect, repeats=2)

    timed("pricing", lambda: q_pricing_summary(spark, sf_dir).count())
    timed("topk", lambda: q_topk_per_group(spark, sf_dir).count())
    timed("wmean", lambda: q_weighted_mean(spark, sf_dir).count())

    def _dedup():
        from biomass_processing_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3).count()

    timed("minhash_dedup", _dedup, repeats=2)

    def _sim():
        from biomass_processing_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return brute_force_topk(emb, emb.where(F.col("vec_id") % 10 == 0), k=5).count()

    timed("sim_topk", _sim, repeats=2)

    spark.stop()
    cal_end = _inline_calibration()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        # host-speed denominator for cross-round normalization (ratio of
        # two rounds' rates ~= their hardware-window speed ratio)
        "calibration": {"start_iters_per_sec": cal_start,
                        "end_iters_per_sec": cal_end},
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "cpus": cpus,
        "n_images": n_virtual,
        "n_assigned": n_assigned,
        "images_per_sec_pip_tile": round(n_virtual / timings["pip_tile"], 1),
        # raw per-repeat times: this host's steal stalls can multiply any
        # single measurement ~3x (CLAUDE.md), so the min alone hides how
        # noisy the window was — the spread lets a reader judge it
        "queries_raw": timings_raw,
        # cold-JVM first blob pass (untimed in queries.zonal; see comment
        # at the warm-up site)
        "blob_first_touch_s": blob_first_touch,
    }


def run_degrade(sf_dir: str, cpus: int) -> dict:
    """Degrade-path leg (VERDICT r2 #6): execute BOTH guard fallbacks at
    bench scale and PROVE they engaged by inspecting the executed plan.

    - kNN shuffle-window fallback: ``broadcast_threshold=0`` forces the
      OOM-guard path (the exact plan an organically oversized ring table
      takes at 100x) — full sf-tier images x plots.
    - MinHash hot-bucket chunking: ``hot_bucket_threshold`` lowered to the
      corpus's REAL band-bucket skew (the driver documents' duplicate
      clusters), so the census trips and the chunked self-join runs.

    Prints one JSON line {"metric": "degrade_suite_seconds", ...}.
    """
    import pandas as pd

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from biomass_processing_pipeline_spark.operators.knn import (
        knn_weighted_agg_fused,
    )
    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )

    spark = get_spark(
        app_name=f"bpp_degrade_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    fdir = synth.ensure_fixtures(spark, synth.tier_for_sf_dir(sf_dir))
    images = load_images(spark, fdir)
    plots = spark.read.parquet(f"{fdir}/plots.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timings: dict[str, float] = {}

    fp = with_footprint(images.select("image_id")).drop("image_id")
    knn_df = knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=50, point_key="seq",
        broadcast_threshold=0, local_index_threshold=0,
    )
    plan = knn_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan or "Window" in plan, \
        "shuffle-window fallback did not engage"
    ts = []
    for _ in range(2):
        t0 = time.time()
        n = knn_df.count()
        ts.append(time.time() - t0)
    timings["knn_wagg_shuffle_fb"] = round(min(ts), 3)

    # find the corpus's real largest band bucket, set the threshold below
    # it so the chunked path handles genuine (not synthetic) skew. The
    # chunked branch exists in every plan (static union) — engagement is
    # proven by the census: at this threshold, hot buckets exist
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark.operators.dedup import (
        _minhash_band_udf, with_shingles,
    )

    hot_threshold = 50
    banded = with_shingles(
        docs.select("doc_id", "text"), "text", 5
    ).select(
        F.posexplode(
            _minhash_band_udf(64, 16)(F.col("shingles"))
        ).alias("band_idx", "band_hash"),
    )
    n_hot = (
        banded.groupBy("band_idx", "band_hash").count()
        .where(F.col("count") > hot_threshold).count()
    )
    assert n_hot > 0, \
        f"no band bucket exceeds {hot_threshold} — raise the tier or lower it"
    # refine_broadcast_elems=0 forces the at-scale ARRAY-JOIN refine too,
    # so the degrade leg exercises every fallback plan together (chunked
    # hot buckets + join refine), exactly what an over-ceiling corpus runs
    mm_df = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3,
                              hot_bucket_threshold=hot_threshold,
                              refine_broadcast_elems=0)
    plan2 = mm_df._jdf.queryExecution().executedPlan().toString()
    assert "chunk" in plan2 and "explode" in plan2.lower(), \
        "hot-bucket chunked self-join missing from the plan"
    assert "array_intersect" in plan2, \
        "degrade leg must run the array-join refine, not the broadcast"
    ts = []
    for _ in range(2):
        t0 = time.time()
        n_pairs = mm_df.count()
        ts.append(time.time() - t0)
    timings["minhash_hot_chunked"] = round(min(ts), 3)

    spark.stop()
    return {
        "metric": "degrade_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec", "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "cpus": cpus, "knn_rows": n, "minhash_pairs": n_pairs,
        "hot_buckets": n_hot, "guards_engaged": True,
    }


def _jvm_peak_rss_gb() -> float | None:
    """VmHWM of the session's JVM (the java child of this driver): the
    peak-memory number the sf1 headroom note reports."""
    import glob as _glob

    me = os.getpid()
    for stat in _glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(stat).read().split()
            if parts[1] == "(java)" and int(parts[3]) == me:
                for line in open(stat.replace("/stat", "/status")):
                    if line.startswith("VmHWM"):
                        return round(int(line.split()[1]) / 1024 / 1024, 2)
        except (OSError, IndexError, ValueError):
            continue
    return None


def _docs_x10(spark, sf_dir: str):
    """Deterministic 10x document corpus: ten shards of the sf0.1 corpus,
    each Caesar-translated by its shard index. translate() is a bijection
    on the alphabet, so WITHIN a shard every shingle-set relation (and so
    every Jaccard value and the bucket skew profile) is preserved
    exactly, while shards share essentially no shingles — the corpus is
    10x the docs with the same per-shard duplicate structure, which is
    what a 10x crawl looks like (new content, same dup rate)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shards = []
    for i in range(10):
        rot = alpha[i:] + alpha[:i]
        shards.append(docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.translate(F.lower("text"), alpha, rot).alias("text"),
        ))
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s)
    return out


def run_sf1(cpus: int) -> dict:
    """10x-the-driver-tier leg (VERDICT r3 #4): the fixture-based headline
    queries + the minhash dedup + the FULL workflow at sf1 (2M images,
    100k plots, 200k parcels, 50k docs) — the best local proxy for the
    100x memory-headroom / spill question. Fixture generation is timed
    separately and excluded from the metric. Reports the JVM's peak RSS.
    """
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from biomass_processing_pipeline_spark.operators.intersect import (
        crop_coeff_df, crop_rollup, intersection_join, parcel_crop_summary,
    )
    from biomass_processing_pipeline_spark.operators.knn import (
        knn_weighted_agg_fused,
    )
    from biomass_processing_pipeline_spark.operators.pipeline import (
        build_dictionaries, county_tile_assign,
    )
    from biomass_processing_pipeline_spark.operators.zonal import (
        decode_partials, zonal_band_stats,
    )
    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )
    from biomass_processing_pipeline_spark.workflow import run_county_workflow

    cal_start = _inline_calibration()
    spark = get_spark(
        app_name="bpp_bench_sf1", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 64),  # 2x task headroom at 10x rows
    )
    t0 = time.time()
    fdir = synth.ensure_fixtures(spark, "sf1")
    gen_sec = round(time.time() - t0, 1)

    counties = pd.read_parquet(f"{fdir}/counties.parquet")
    tiles = pd.read_parquet(f"{fdir}/tiles.parquet")
    images = load_images(spark, fdir)
    n_images = images.count()
    timings: dict[str, float] = {}

    def timed(name: str, fn, repeats: int = 1):
        best, out = None, None
        for _ in range(repeats):
            t1 = time.time()
            out = fn()
            dt = time.time() - t1
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    dicts = build_dictionaries(spark, counties)

    def _pip_tile():
        fp = with_footprint(images.select("image_id"))
        return county_tile_assign(
            spark, fp, counties, tiles, point_key="seq", dicts=dicts
        ).count()

    _pip_tile()  # warm-up (codegen + python workers), as in run_suite
    n_assigned = timed("pip_tile", _pip_tile, repeats=2)

    def _knn():
        fp = with_footprint(images.select("image_id")).drop("image_id")
        plots = spark.read.parquet(f"{fdir}/plots.parquet")
        return knn_weighted_agg_fused(
            fp, plots, ["attr_1", "attr_2"], k=50, point_key="seq"
        ).count()

    timed("knn_wagg", _knn)

    def _zonal():
        zones = spark.read.parquet(f"{fdir}/golden_image_county.parquet")
        return zonal_band_stats(decode_partials(images), zones).count()

    # same blob first-touch discipline as run_suite: one untimed warm pass
    # (disclosed) then min-of-2 — at this tier the 12 GB blob scan can also
    # be DISK-bound when the fixture predates the JVM (the guest's page
    # cache does not reliably retain multi-GB files), which the single cold
    # rep in earlier runs reported as the leg time (599 s vs 23-51 s warm,
    # BENCH/SF1.json run4 note)
    _t_cold = time.time()
    _zonal()
    blob_first_touch = round(time.time() - _t_cold, 3)
    timed("zonal", _zonal, repeats=2)

    def _intersect():
        parcels = spark.read.parquet(f"{fdir}/parcels.parquet").select(
            "parcel_id", "fips", "acres", "geom_wkt"
        )
        cpolys = pd.read_parquet(f"{fdir}/class_polygons.parquet")
        inter = intersection_join(spark, parcels, cpolys)
        return parcel_crop_summary(
            crop_rollup(inter, crop_coeff_df(spark))
        ).count()

    timed("intersect", _intersect)

    sf01 = "/root/testdata/sf0.1"
    docs10 = _docs_x10(spark, sf01)

    def _dedup():
        return minhash_lsh_pairs(docs10, "text", "doc_id",
                                 threshold=0.3).count()

    n_pairs = timed("minhash_dedup_x10", _dedup)

    # remaining headline operators at 10x (VERDICT r4 #5: every headline
    # operator gets a 10x-scale datum, not just the heavy spatial legs)
    def _simhash():
        from biomass_processing_pipeline_spark.operators.dedup import (
            simhash_pairs,
        )

        return simhash_pairs(docs10, "text", "doc_id", max_hamming=3).count()

    timed("simhash_x10", _simhash)

    def _phash():
        from biomass_processing_pipeline_spark.operators.dedup import (
            phash_dedup_groups,
        )

        imgs = images.select(
            "image_id", "phash",
            F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        )
        return phash_dedup_groups(
            imgs, "image_id", "phash", max_hamming=2, scope_col="tile_code"
        ).count()

    timed("phash_dedup", _phash)

    emb10 = _emb_x10(spark, sf01).localCheckpoint(eager=True)
    q10 = emb10.where(F.col("vec_id") % 100 == 0)

    def _sim_bf():
        from biomass_processing_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        return brute_force_topk(emb10, q10, k=5).count()

    timed("sim_topk_x10", _sim_bf)

    def _sim_lsh():
        from biomass_processing_pipeline_spark.operators.similarity import (
            cosine_refine_topk, lsh_candidates,
        )

        return cosine_refine_topk(
            lsh_candidates(emb10, q10), emb10, q10, k=5
        ).count()

    timed("sim_lsh_x10", _sim_lsh)

    def _sim_ivf():
        from biomass_processing_pipeline_spark.operators.similarity import (
            cosine_refine_topk, ivf_candidates, train_centroids,
        )

        cents = train_centroids(emb10, n_centroids=16)
        return cosine_refine_topk(
            ivf_candidates(emb10, q10, cents, n_probe=4), emb10, q10, k=5
        ).count()

    timed("sim_ivf_x10", _sim_ivf)

    wf_out = tempfile.mkdtemp(prefix="bpp_sf1_wf_")
    try:
        n_wf = timed(
            "workflow", lambda: run_county_workflow(spark, "sf1", wf_out)
        )["buckets"]
        wf_rows = spark.read.parquet(f"{wf_out}/data").count()
    finally:
        shutil.rmtree(wf_out, ignore_errors=True)

    peak = _jvm_peak_rss_gb()
    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "sf1_suite_seconds", "value": total, "unit": "sec",
        "calibration": {"start_iters_per_sec": cal_start,
                        "end_iters_per_sec": _inline_calibration()},
        "queries": timings, "sf": 1.0, "cpus": cpus,
        "n_images": n_images, "n_assigned": n_assigned,
        "minhash_pairs": n_pairs, "workflow_rows": wf_rows,
        "workflow_buckets": n_wf, "fixture_gen_sec": gen_sec,
        "blob_first_touch_s": blob_first_touch,
        "jvm_peak_rss_gb": peak,
        "images_per_sec_pip_tile": round(n_images / timings["pip_tile"], 1),
    }


def _calibration_burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.5:
        x += 1
    return x


def _cpu_calibration() -> float:
    """Hardware ceiling: pure-CPU busy loops in separate processes, 8 vs
    32 procs. On this VM full-width load clocks down, capping even ideal
    strong scaling below 1.0 — report it so the Spark numbers have a
    denominator."""
    import multiprocessing as mp

    rates = {}
    for n in (8, 32):
        with mp.get_context("spawn").Pool(n) as p:
            rates[n] = sum(p.map(_calibration_burn, range(n)))
    return round((rates[32] / rates[8]) / 4.0, 3)


def _scaling_leg(sf_dir: str, cpus: int, rows: int) -> float:
    """Median-of-3 wall seconds of the e2e spatial-join + tile-assign job
    (id synth -> footprint UDF -> map-only county+tile assign -> count)
    over ``rows`` virtual images, in a fresh subprocess."""
    import statistics

    code = f"""
import time, statistics, pandas as pd, sys
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from biomass_processing_pipeline_spark.session import get_spark
from biomass_processing_pipeline_spark import synth
from biomass_processing_pipeline_spark.sources.images import with_footprint
from biomass_processing_pipeline_spark.operators.pipeline import (
    county_tile_assign, build_dictionaries)
spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
d = synth.ensure_fixtures(spark, synth.tier_for_sf_dir({sf_dir!r}))
counties = pd.read_parquet(f"{{d}}/counties.parquet")
tiles = pd.read_parquet(f"{{d}}/tiles.parquet")
dicts = build_dictionaries(spark, counties)
def _gen(batches):
    for pdf in batches:
        yield pd.DataFrame({{"image_id":
            synth.image_meta_np(pdf["id"].to_numpy())["image_id"]}})
def job():
    ids = spark.range({rows}).repartition({cpus} * 4).mapInPandas(
        _gen, "image_id string")
    fp = with_footprint(ids)
    return county_tile_assign(spark, fp, counties, tiles,
                              point_key="seq", dicts=dicts).count()
job()
ts = []
for _ in range(3):
    t0 = time.time(); job(); ts.append(time.time() - t0)
print("LEGRESULT", statistics.median(ts))
spark.stop()
"""
    # PIN the leg to exactly `cpus` CPUs: local[N] only caps task slots —
    # Python workers, GC and shuffle threads otherwise spill onto all 32
    # vCPUs and the "8-core" leg silently uses far more than 8, poisoning
    # the scaling ratio (this is what separate cluster hosts give for free)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"no result in leg output: {out.stdout[-500:]}")


def run_scaling(sf_dir: str) -> None:
    ceiling = _cpu_calibration()
    n_strong = int(os.environ.get("BPP_SCALE_ROWS", "20000000"))
    strong8 = _scaling_leg(sf_dir, 8, n_strong)
    strong32 = _scaling_leg(sf_dir, 32, n_strong)
    weak8 = _scaling_leg(sf_dir, 8, n_strong // 4)
    # weak-scaling 32-leg reuses strong32 (same rows at 4x cores)
    strong_eff = round((n_strong / strong32) / (n_strong / strong8) / 4.0, 3)
    weak_eff = round(weak8 / strong32, 3)
    tput8 = round(n_strong / 4 / weak8, 1)
    tput32 = round(n_strong / strong32, 1)
    os.makedirs("BENCH", exist_ok=True)
    # write the auto-generated report to its OWN file: BENCH/BASELINE.md is
    # hand-curated (multi-window variance history + clamped-median summary)
    # and must survive re-runs — fold new windows into it manually
    with open("BENCH/SCALING_RUN.md", "w") as fh:
        fh.write(f"""# BENCH/SCALING_RUN — latest two-parallelism protocol run

Job: the north_rule spatial-join + tile-assign pipeline, end-to-end
(deterministic id synthesis -> footprint derivation [Arrow UDF] -> Morton
cell index [native columns] -> broadcast county-cover join + rectilinear
piece refine -> lattice tile assign -> count), run at local[8] and
local[32] (N and 4N cores standing in for N and 4N executors, BASELINE.md).
Median of 3 warm runs per leg; fresh JVM per leg. **Each leg is
CPU-PINNED** (`taskset -c 0-(N-1)`): `local[N]` only caps task slots —
Python workers, GC and shuffle threads otherwise spill onto all 32 vCPUs
and the "8-core" leg silently uses far more than 8 (round-2 methodology
fix; separate cluster hosts give this isolation for free).

## Hardware calibration (this VM)

Pure-CPU busy loops in separate processes scale 8 -> 32 procs at
**{ceiling}** efficiency — full-width load downclocks this vCPU set, so
{ceiling} is the ceiling ANY job can show here; cluster executors
(separate hosts) don't share this cap.

## Strong scaling (same input, {n_strong:,} images)

| cores | seconds | images/sec |
|---|---|---|
| 8 | {strong8:.2f} | {n_strong / strong8:,.0f} |
| 32 | {strong32:.2f} | {tput32:,.0f} |

strong-scaling efficiency = {strong_eff} raw; {round(strong_eff / ceiling, 3)}
normalized to the hardware ceiling.

## Weak scaling ({n_strong // 4:,} images @ 8 cores vs {n_strong:,} @ 32)

Constant work per core — the operative regime for a partition-parallel
engine growing from N to 4N executors WITH 4x the data (the 10^12-image
scenario).

| cores | images | seconds | images/sec |
|---|---|---|---|
| 8 | {n_strong // 4:,} | {weak8:.2f} | {tput8:,.0f} |
| 32 | {n_strong:,} | {strong32:.2f} | {tput32:,.0f} |

weak-scaling efficiency (t_8 / t_32) = **{weak_eff}** raw; super-linear
values are CLAMPED at 1.0 for the criterion (startup-amortization
favoring the big leg is an artifact, not engine scaling):
**{min(weak_eff, 1.0)}** (criterion >= 0.8:
{"PASS" if min(weak_eff, 1.0) >= 0.8 else "measured " + str(weak_eff) + ", see ceiling"})

## Why the map-only plan scales

The assignment job has ZERO shuffles: broadcast cover join + half-open
rectilinear-piece ownership makes each point match exactly one county
piece, so no dedup groupBy is needed (pipeline.py). Remaining
serial cost is per-JOB (driver dispatch + count collect), not
per-executor — at cluster scale it is amortized to nothing.
""")
    print(json.dumps({
        "ceiling": ceiling, "strong_eff": strong_eff, "weak_eff": weak_eff,
        "t8_strong": strong8, "t32": strong32, "t8_weak": weak8,
    }))


def run_workflow(sf_dir: str, cpus: int) -> dict:
    """Flagship END-TO-END leg: the full resumable county workflow
    (decode + zonal + fused kNN/mode + biomass + validation gate + JSON
    blobs + salted sorted lineage writes) against a fresh output dir.
    One JSON line, same shape as the headline suite."""
    import shutil
    import tempfile

    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.workflow import run_county_workflow

    tier = os.path.basename(sf_dir.rstrip("/"))
    spark = get_spark(app_name="bpp_bench_wf", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="bpp_bench_wf_")
    try:
        t0 = time.time()
        run_county_workflow(spark, tier, out)
        dur = time.time() - t0
        n = spark.read.parquet(f"{out}/data").count()
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    return {"metric": "workflow_end_to_end_seconds", "value": round(dur, 3),
            "unit": "sec", "sf": tier, "cpus": cpus, "rows": n,
            "rows_per_sec": round(n / dur, 1)}


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
    elif "--workflow" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_workflow(sf_dir, cpus)))
    elif "--degrade" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_degrade(sf_dir, cpus)))
    elif "--sf1" in sys.argv:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_sf1(cpus)))
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_suite(sf_dir, cpus)))
