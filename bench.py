"""Benchmark harness (driver contract + BASELINE scaling protocol).

Default: run the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

``--scaling``: run the identical spatial-join + tile-assign job at
local[8] and local[32] (N and 4N cores standing in for N and 4N executors,
per BASELINE.md) in fresh subprocesses and write BENCH/BASELINE.md with
throughput at both plus scaling efficiency.

Headline queries:

- ``pip_tile``   : the north_rule job — footprint decode -> Morton cell ->
                   broadcast-cover PIP refine -> lattice tile assign (the
                   throughput metric counts images/sec through this)
- ``knn_wagg``   : ring-expansion kNN (k=50) + distance-weighted agg
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


def run_suite(sf_dir: str, cpus: int) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.intersect import (
        crop_coeff_df, crop_rollup, intersection_join, parcel_crop_summary,
    )
    from biomass_processing_pipeline_spark.operators.knn import (
        distance_weighted_agg, knn_join,
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

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # headline: spatial-join + tile-assign (north_rule throughput metric)
    def _pip_tile():
        fp = with_footprint(images.select("image_id"))
        assigned = assign_points_to_polygons(spark, fp, counties, "fips")
        tiled = assign_images_to_tiles(spark, fp, tiles)
        return assigned.join(tiled, "image_id").count()

    n_assigned = timed("pip_tile", _pip_tile)

    def _knn():
        fp = with_footprint(images.select("image_id"))
        plots = spark.read.parquet(f"{fdir}/plots.parquet")
        knn = knn_join(fp, plots, k=50)
        return distance_weighted_agg(knn, plots, ["attr_1", "attr_2"]).count()

    timed("knn_wagg", _knn)

    def _zonal():
        zones = spark.read.parquet(f"{fdir}/golden_image_county.parquet")
        return zonal_band_stats(decode_partials(images), zones).count()

    timed("zonal", _zonal)

    def _intersect():
        parcels = pd.read_parquet(f"{fdir}/parcels.parquet")
        cpolys = pd.read_parquet(f"{fdir}/class_polygons.parquet")
        inter = intersection_join(spark, parcels, cpolys)
        return parcel_crop_summary(crop_rollup(inter, crop_coeff_df(spark))).count()

    timed("intersect", _intersect)

    timed("pricing", lambda: q_pricing_summary(spark, sf_dir).count())
    timed("topk", lambda: q_topk_per_group(spark, sf_dir).count())
    timed("wmean", lambda: q_weighted_mean(spark, sf_dir).count())

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "cpus": cpus,
        "n_images": n_images,
        "n_assigned": n_assigned,
        "images_per_sec_pip_tile": round(n_images / timings["pip_tile"], 1),
    }


def run_scaling(sf_dir: str) -> None:
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results[8]["images_per_sec_pip_tile"]
    t32 = results[32]["images_per_sec_pip_tile"]
    eff = round((t32 / t8) / 4.0, 3)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH/BASELINE — two-parallelism scaling protocol\n\n"
            "Same job (spatial-join + tile-assign over the synthetic image\n"
            "table), same input, two parallelism levels (local[8] vs local[32]\n"
            "standing in for N vs 4N executors per BASELINE.md).\n\n"
            f"input: {sf_dir} tier fixture, {results[8]['n_images']} images\n\n"
            "| cores | pip_tile sec | images/sec | full suite sec |\n"
            "|---|---|---|---|\n"
            f"| 8 | {results[8]['queries']['pip_tile']} | {t8} | {results[8]['value']} |\n"
            f"| 32 | {results[32]['queries']['pip_tile']} | {t32} | {results[32]['value']} |\n\n"
            f"**scaling efficiency (throughput_32 / throughput_8) / 4 = {eff}**"
            " (criterion >= 0.8)\n\n"
            "Per-query seconds at 32 cores: "
            f"{json.dumps(results[32]['queries'])}\n"
        )
    print(json.dumps({"scaling_efficiency": eff, "t8": t8, "t32": t32}))


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        print(json.dumps(run_suite(sf_dir, cpus)))
