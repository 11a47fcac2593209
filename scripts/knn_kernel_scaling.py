"""Pure-kernel scaling bound for the fused-kNN local-index leg.

The two pinned protocol windows of ``scripts/knn_scaling.py`` agree the
fused-kNN leg tops out around 0.43-0.46 raw weak efficiency on this host
while the pip protocol's map-only leg medians 0.97 — this script decides
whether that is Spark-plan serialization or the numpy kernel itself by
running the IDENTICAL per-batch work (``_grid_topk_pairs`` + the
``_local_fused`` bincount aggregation) with NO Spark at all:

- N pinned worker processes (the whole leg runs under ``taskset``, one
  fresh subprocess per leg, same as the protocol),
- each worker loads its OWN copy of the packed index (unpickle, like a
  Spark python worker receiving the broadcast) and its OWN slice of the
  point table (fresh allocation, like Arrow batches arriving),
- batches of 10k points (Spark's Arrow maxRecordsPerBatch default),
- barrier-timed: one untimed warm pass then 3 timed passes over reused
  workers (Spark reuses python workers after warm-up), median of 3,
- weak: 500k points over 8 procs vs 2M over 32 (constant work/proc);
  strong: 2M at both widths.

If the kernel alone reproduces the ~0.45 weak ratio, the leg's number is
a single-host memory artifact (the kernel's ring gather + lexsort top-k
streams large temporaries; the documented 32 MB-copy bandwidth burn
bounds this host at ~0.75 and guest alloc/page-fault cost compounds it)
and NOT plan serialization — on a real 4N-executor cluster each executor
adds its own memory system, which is exactly what this single box cannot.

Writes BENCH/KNN_KERNEL_SCALING.md and prints one JSON line.
NOTE: must only run as a script (``__main__`` guard — CLAUDE.md).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import pickle
import statistics
import subprocess
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/bpp_knn_kernel"
BATCH = 10_000  # spark.sql.execution.arrow.maxRecordsPerBatch default


def _prep(sf_dir: str, rows: int) -> None:
    """One-time fixture prep (untimed): dump the EXACT point stream the
    scaling leg feeds the kernel (synth virtual-id footprints) plus the
    packed target index, so legs need no Spark."""
    os.makedirs(WORK, exist_ok=True)
    # marker is keyed by BOTH tier and row count: a tier switch via
    # SPARK_GRAFT_SF_DIR must regenerate the dumped index/point files
    # (they share names), not silently reuse the previous tier's
    tag = sf_dir.strip("/").replace("/", "_")
    done = os.path.join(WORK, f"_DONE_{tag}_{rows}")
    if os.path.exists(done):
        return
    for stale in os.listdir(WORK):
        if stale.startswith("_DONE_"):
            os.remove(os.path.join(WORK, stale))
    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.sources.images import with_footprint
    from biomass_processing_pipeline_spark.operators.knn import (
        _auto_level, _pack_target_index)

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    d = synth.ensure_fixtures(spark, synth.tier_for_sf_dir(sf_dir))

    def _gen(batches):
        for pdf in batches:
            yield pd.DataFrame({"image_id": synth.image_meta_np(
                pdf["id"].to_numpy())["image_id"]})

    ids = spark.range(rows).repartition(64).mapInPandas(
        _gen, "image_id string")
    fp = with_footprint(ids).drop("image_id")
    pts = fp.select("seq", "lon", "lat").toPandas()
    np.save(os.path.join(WORK, "pts_lon.npy"),
            pts["lon"].to_numpy(np.float64))
    np.save(os.path.join(WORK, "pts_lat.npy"),
            pts["lat"].to_numpy(np.float64))

    plots = spark.read.parquet(f"{d}/plots.parquet").toPandas()
    spark.stop()
    n_targets = len(plots)
    area = max((plots["lon"].max() - plots["lon"].min())
               * (plots["lat"].max() - plots["lat"].min()), 1e-9)
    density = max(n_targets / area, 1e-9)
    r_needed = float(np.sqrt(1.5 * 50 / (np.pi * density)))
    t_sel = plots.rename(columns={"lon": "t_lon", "lat": "t_lat"})
    idx = _pack_target_index(
        t_sel, "plot_cn", _auto_level(r_needed), ["attr_1", "attr_2"])
    r0 = max(1, int(np.ceil(r_needed / idx["cell_w"])))
    with open(os.path.join(WORK, "index.pkl"), "wb") as fh:
        pickle.dump({"idx": idx, "r0": r0}, fh)
    with open(done, "w") as fh:
        fh.write("ok")


def _worker(wid: int, lo: int, hi: int, barrier, k: int, eps: float) -> None:
    """One python-worker stand-in: own index copy, own point slice,
    batched fused kernel passes separated by barriers (1 warm + 3 timed)."""
    from biomass_processing_pipeline_spark.operators.knn import (
        _grid_topk_pairs)

    with open(os.path.join(WORK, "index.pkl"), "rb") as fh:
        blob = pickle.load(fh)
    t, r0 = blob["idx"], blob["r0"]
    lon = np.load(os.path.join(WORK, "pts_lon.npy"), mmap_mode="r")
    lat = np.load(os.path.join(WORK, "pts_lat.npy"), mmap_mode="r")
    plon = np.array(lon[lo:hi], dtype=np.float64)  # fresh allocation
    plat = np.array(lat[lo:hi], dtype=np.float64)
    attrs = list(t["attrs"])
    for _rep in range(4):
        barrier.wait()
        for s in range(0, len(plon), BATCH):
            bl, bb = plon[s:s + BATCH], plat[s:s + BATCH]
            m = len(bl)
            pt, tg, d, _ = _grid_topk_pairs(bl, bb, t, k, r0)
            wgt = 1.0 / (d + eps)
            sum_w = np.bincount(pt, weights=wgt, minlength=m)
            cols = {"sum_w": sum_w,
                    "n_neighbors": np.bincount(pt, minlength=m)}
            for a in attrs:
                cols[f"w_{a}"] = np.bincount(
                    pt, weights=wgt * t["attrs"][a][tg], minlength=m
                ) / sum_w
            pd.DataFrame(cols)
        barrier.wait()


def _leg_inproc(procs: int, rows: int) -> float:
    """Run one leg in THIS process (caller pins via taskset): spawn the
    worker pool, barrier-time 1 warm + 3 timed passes, return median."""
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(procs + 1)
    per = rows // procs
    # last worker takes the remainder so every row is processed — the
    # points/sec figures divide by the FULL nominal row count
    ps = [ctx.Process(target=_worker,
                      args=(i, i * per,
                            rows if i == procs - 1 else (i + 1) * per,
                            barrier, 50, 0.01))
          for i in range(procs)]
    for p in ps:
        p.start()
    ts = []
    for rep in range(4):
        barrier.wait()           # release the pass
        t0 = time.time()
        barrier.wait()           # all workers done
        if rep > 0:
            ts.append(time.time() - t0)
    for p in ps:
        p.join()
    return statistics.median(ts)


def _leg(procs: int, rows: int) -> float:
    out = subprocess.run(
        ["taskset", "-c", f"0-{procs - 1}", sys.executable,
         os.path.abspath(__file__), "--leg", str(procs), str(rows)],
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"no result: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print("LEGRESULT", _leg_inproc(int(sys.argv[2]), int(sys.argv[3])))
        return
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = int(os.environ.get("BPP_KNN_SCALE_ROWS", "2000000"))
    _prep(sf_dir, rows)
    ceiling = bench._cpu_calibration()
    strong8 = _leg(8, rows)
    strong32 = _leg(32, rows)
    weak8 = _leg(8, rows // 4)
    result = {
        "metric": "knn_kernel_scaling_no_spark",
        "rows_strong": rows,
        "ceiling": ceiling,
        "strong8_s": round(strong8, 2),
        "strong32_s": round(strong32, 2),
        "weak8_s": round(weak8, 2),
        "strong_eff_raw": round(strong8 / strong32 / 4.0, 3),
        "weak_eff_raw": round(weak8 / strong32, 3),
        "points_per_sec_32": round(rows / strong32, 1),
    }
    with open(os.path.join(REPO, "BENCH", "KNN_KERNEL_SCALING.md"), "w") as fh:
        fh.write(f"""# BENCH/KNN_KERNEL_SCALING — no-Spark kernel bound

Identical per-batch work to the fused-kNN leg (`_grid_topk_pairs` +
bincount agg), pinned worker processes, fresh per-worker index copy and
point slice, batches of {BATCH:,}, barrier-timed median of 3 after one
warm pass. No JVM, no Arrow, no scheduler — the kernel and this host's
memory system only.

| leg | procs | rows | seconds | points/sec |
|---|---|---|---|---|
| strong 8 | 8 | {rows:,} | {strong8:.2f} | {rows / strong8:,.0f} |
| strong 32 | 32 | {rows:,} | {strong32:.2f} | {rows / strong32:,.0f} |
| weak 8 | 8 | {rows // 4:,} | {weak8:.2f} | {rows // 4 / weak8:,.0f} |

hardware ceiling this window: {ceiling}
strong raw: {result['strong_eff_raw']}; weak raw: {result['weak_eff_raw']}

Compare with BENCH/KNN_SCALING_RUN.md (full Spark leg, same protocol).
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
