"""Capture .explain("formatted") for every declared query (sf0.01) and
the bench-leg operator DataFrames (sf0.1 fixtures) into plans/r06/.

Usage: python tools/gen_plans_r06.py <suffix> [outdir]
  suffix: "before" (run from the round-start tree) or "after" (HEAD).
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r06"
    os.makedirs(outdir, exist_ok=True)

    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"plans_{suffix}", master="local[8]",
                      shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    for name, fn in entrymod.queries().items():
        try:
            text = fmt_plan(fn(spark, sf))
        except Exception:
            text = "PLAN BUILD FAILED\n" + traceback.format_exc()
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as fh:
            fh.write(text)

    # bench-leg operator plans at the sf0.1 fixture shapes
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
    from biomass_processing_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )
    from biomass_processing_pipeline_spark.operators.zonal import (
        decode_partials, zonal_band_stats,
    )
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )

    fdir = synth.ensure_fixtures(spark, "sf0.1")
    counties = pd.read_parquet(f"{fdir}/counties.parquet")
    tiles = pd.read_parquet(f"{fdir}/tiles.parquet")
    images = load_images(spark, fdir)
    plots = spark.read.parquet(f"{fdir}/plots.parquet")
    sf1dir = "/root/testdata/sf0.1"
    docs = spark.read.parquet(f"{sf1dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf1dir}/embeddings.parquet")
    dicts = build_dictionaries(spark, counties)

    legs = {
        "bench_pip_tile": lambda: county_tile_assign(
            spark, with_footprint(images.select("image_id")), counties,
            tiles, point_key="seq", dicts=dicts),
        "bench_knn_wagg": lambda: knn_weighted_agg_fused(
            with_footprint(images.select("image_id")).drop("image_id"),
            plots, ["attr_1", "attr_2"], k=50, point_key="seq"),
        "bench_zonal": lambda: zonal_band_stats(
            decode_partials(images),
            spark.read.parquet(f"{fdir}/golden_image_county.parquet")),
        "bench_intersect": lambda: parcel_crop_summary(crop_rollup(
            intersection_join(
                spark,
                spark.read.parquet(f"{fdir}/parcels.parquet").select(
                    "parcel_id", "fips", "acres", "geom_wkt"),
                pd.read_parquet(f"{fdir}/class_polygons.parquet")),
            crop_coeff_df(spark))),
        "bench_minhash": lambda: minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.3),
        "bench_sim_topk": lambda: brute_force_topk(
            emb, emb.where(F.col("vec_id") % 10 == 0), k=5),
    }
    for name, build in legs.items():
        try:
            text = fmt_plan(build())
        except Exception:
            text = "PLAN BUILD FAILED\n" + traceback.format_exc()
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as fh:
            fh.write(text)
    print("wrote plans to", outdir)
    spark.stop()


if __name__ == "__main__":
    main()
