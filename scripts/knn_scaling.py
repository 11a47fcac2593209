"""Two-parallelism scaling protocol for the round-5 kNN local-index plan.

Same methodology as ``bench.py --scaling`` (BENCH/BASELINE.md) but the job
under test is the FUSED kNN(k=50) + distance-weighted aggregation on its
default map-only broadcast local-grid-index plan — the round-5 dominant-leg
fix — instead of the pip/tile-assign pipeline:

- each leg runs in a fresh subprocess CPU-PINNED with ``taskset -c 0-(N-1)``
  (local[N] only caps task slots; workers/GC otherwise spill onto all 32
  vCPUs and poison the ratio),
- weak scaling: rows/4 points at 8 cores vs rows points at 32 cores
  (constant work per core — the N -> 4N-executors-with-4N-data regime of
  the north rule); strong scaling: same rows at both widths,
- the TARGET side (plots) is the fixture dimension table at both widths —
  on a real cluster it is the same broadcast on every executor,
- median of 3 timed reps after one untimed warm-up per leg,
- hardware ceiling from the same busy-loop calibration bench.py uses
  (NOTE: this file must only run as a script with the __main__ guard —
  driving the calibration from a ``python -`` heredoc re-imports __main__
  in every spawned worker and forks calibations recursively; CLAUDE.md).

Writes BENCH/KNN_SCALING_RUN.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _leg(sf_dir: str, cpus: int, rows: int) -> float:
    code = f"""
import time, statistics, sys
sys.path.insert(0, {REPO!r})
import pandas as pd
from biomass_processing_pipeline_spark.session import get_spark
from biomass_processing_pipeline_spark import synth
from biomass_processing_pipeline_spark.sources.images import with_footprint
from biomass_processing_pipeline_spark.operators.knn import (
    knn_weighted_agg_fused)
spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
d = synth.ensure_fixtures(spark, synth.tier_for_sf_dir({sf_dir!r}))
plots = spark.read.parquet(f"{{d}}/plots.parquet")
def _gen(batches):
    for pdf in batches:
        yield pd.DataFrame({{"image_id":
            synth.image_meta_np(pdf["id"].to_numpy())["image_id"]}})
def job():
    ids = spark.range({rows}).repartition({cpus} * 4).mapInPandas(
        _gen, "image_id string")
    fp = with_footprint(ids).drop("image_id")
    return knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=50, point_key="seq").count()
job()  # untimed warm-up: codegen + python worker spin-up + index build
ts = []
for _ in range(3):
    t0 = time.time(); job(); ts.append(time.time() - t0)
print("LEGRESULT", statistics.median(ts))
spark.stop()
"""
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"no result in leg output: {out.stdout[-500:]}")


def main() -> None:
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = int(os.environ.get("BPP_KNN_SCALE_ROWS", "2000000"))
    ceiling = bench._cpu_calibration()
    strong8 = _leg(sf_dir, 8, rows)
    strong32 = _leg(sf_dir, 32, rows)
    weak8 = _leg(sf_dir, 8, rows // 4)
    strong_eff = round(strong8 / strong32 / 4.0, 3)
    weak_eff = round(weak8 / strong32, 3)
    result = {
        "metric": "knn_local_index_scaling",
        "rows_strong": rows,
        "ceiling": ceiling,
        "strong8_s": round(strong8, 2),
        "strong32_s": round(strong32, 2),
        "weak8_s": round(weak8, 2),
        "strong_eff_raw": strong_eff,
        "weak_eff_raw": weak_eff,
        "points_per_sec_32": round(rows / strong32, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "KNN_SCALING_RUN.md"), "w") as fh:
        fh.write(f"""# BENCH/KNN_SCALING_RUN — latest kNN-leg protocol run

Job: fused kNN(k=50) + distance-weighted agg on the DEFAULT map-only
broadcast local-grid-index plan (round 5), points = virtual-id synthetic
footprints, targets = the {sf_dir} plots dimension table. Pinned legs,
median-of-3 warm, fresh subprocess per leg (methodology of
BENCH/BASELINE.md).

| leg | cores | rows | seconds | points/sec |
|---|---|---|---|---|
| strong 8 | 8 | {rows:,} | {strong8:.2f} | {rows / strong8:,.0f} |
| strong 32 | 32 | {rows:,} | {strong32:.2f} | {rows / strong32:,.0f} |
| weak 8 | 8 | {rows // 4:,} | {weak8:.2f} | {rows // 4 / weak8:,.0f} |

hardware ceiling this window: {ceiling}
strong-scaling efficiency raw: {strong_eff} (/= ceiling:
{round(strong_eff / ceiling, 3)})
weak-scaling efficiency raw (t8_weak / t32): {weak_eff}

Fold the window into the variance table in BENCH/BASELINE.md manually.
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
