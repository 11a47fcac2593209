"""Per-operator isolation bench (guide §1.4): times individual legs and
internal phases with the noop sink so computation is measured, not the
count()-pruned subtree or the sink. Used for OPTIMIZATION_r06.md evidence;
the driver-contract bench.py is untouched.

Usage: python tools/bench_extra.py <leg> [reps]
Legs: zonal, minhash, knn, pip, intersect, sim
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BPP_GC (A/B GC flags).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, reps, out):
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out[name] = ts
    print(name, ts, flush=True)


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "zonal"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )

    spark = get_spark(app_name=f"bpp_extra_{leg}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    fdir = synth.ensure_fixtures(spark, synth.tier_for_sf_dir(sf_dir))
    out: dict[str, list[float]] = {}

    if leg == "zonal":
        from biomass_processing_pipeline_spark.operators.zonal import (
            decode_partials, zonal_band_stats,
        )

        images = load_images(spark, fdir)
        zones = spark.read.parquet(f"{fdir}/golden_image_county.parquet")
        # raw scan floor: read the blob column only, no Python
        timed(spark, "scan_bytes_only",
              lambda: noop(images.select("image_id", "bytes", "phash")), reps,
              out)
        timed(spark, "decode_noop",
              lambda: noop(decode_partials(images)), reps, out)
        timed(spark, "zonal_full",
              lambda: zonal_band_stats(decode_partials(images), zones).count(),
              reps, out)
    elif leg == "minhash":
        from biomass_processing_pipeline_spark.operators.dedup import (
            _minhash_band_udf, minhash_lsh_pairs, with_shingles,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = with_shingles(docs.select("doc_id", "text"), "text", 5).select(
            "doc_id", "shingles", F.size("shingles").alias("n_sh")
        )
        timed(spark, "shingles_noop", lambda: noop(sh), reps, out)
        banded = sh.select(
            "doc_id",
            F.posexplode(_minhash_band_udf(64, 16)(F.col("shingles"))
                         ).alias("band_idx", "band_hash"),
        )
        timed(spark, "banded_noop", lambda: noop(banded), reps, out)
        timed(spark, "minhash_full",
              lambda: minhash_lsh_pairs(docs, "text", "doc_id",
                                        threshold=0.3).count(), reps, out)
        timed(spark, "minhash_joinrefine",
              lambda: minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3,
                                        refine_broadcast_elems=0).count(),
              reps, out)
    elif leg == "knn":
        from biomass_processing_pipeline_spark.operators.knn import (
            knn_weighted_agg_fused,
        )

        images = load_images(spark, fdir)
        plots = spark.read.parquet(f"{fdir}/plots.parquet")

        def _knn():
            fp = with_footprint(images.select("image_id")).drop("image_id")
            return knn_weighted_agg_fused(
                fp, plots, ["attr_1", "attr_2"], k=50, point_key="seq"
            ).count()

        timed(spark, "knn_wagg", _knn, reps, out)
        # footprint-only floor: the Arrow offset UDF + id parse without kNN
        def _fp():
            fp = with_footprint(images.select("image_id")).drop("image_id")
            noop(fp)

        timed(spark, "footprint_noop", _fp, reps, out)
    elif leg == "pip":
        from biomass_processing_pipeline_spark.operators.pipeline import (
            build_dictionaries, county_tile_assign,
        )

        images = load_images(spark, fdir)
        counties = pd.read_parquet(f"{fdir}/counties.parquet")
        tiles = pd.read_parquet(f"{fdir}/tiles.parquet")
        dicts = build_dictionaries(spark, counties)

        def _pt():
            fp = with_footprint(images.select("image_id"))
            return county_tile_assign(spark, fp, counties, tiles,
                                      point_key="seq", dicts=dicts).count()

        timed(spark, "pip_tile", _pt, reps, out)
    elif leg == "intersect":
        from biomass_processing_pipeline_spark.operators.intersect import (
            crop_coeff_df, crop_rollup, intersection_join, parcel_crop_summary,
        )

        cpolys = pd.read_parquet(f"{fdir}/class_polygons.parquet")

        def _int():
            parcels = spark.read.parquet(f"{fdir}/parcels.parquet").select(
                "parcel_id", "fips", "acres", "geom_wkt"
            )
            inter = intersection_join(spark, parcels, cpolys)
            return parcel_crop_summary(
                crop_rollup(inter, crop_coeff_df(spark))).count()

        timed(spark, "intersect", _int, reps, out)
    elif leg == "sim":
        from biomass_processing_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        timed(spark, "sim_topk", lambda: brute_force_topk(
            emb, emb.where(F.col("vec_id") % 10 == 0), k=5).count(), reps, out)

    print(json.dumps({"leg": leg, "cpus": cpus, "sf_dir": sf_dir,
                      "gc": os.environ.get("BPP_GC", "-XX:+UseZGC"),
                      "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
