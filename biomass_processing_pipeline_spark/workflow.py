"""The full county-workflow DAG (SURVEY.md §3.1) composed from the
operator library — the engine's flagship end-to-end run.

Reference lifecycle (``optimized_county_processor_v3`` +
``comprehensive_biomass_processor_v3``): setup (county polygons, CDL/FIA
indices) -> per-parcel landcover zonal agg -> vegetation indices -> forest
kNN + distance-weighted biomass -> crop intersection + allocation math ->
result row assembly -> checkpointed batched writes.

Spark shape: ONE lazy DataFrame DAG per stage family; the "setup phase"
is broadcast exchange; the batch loop is partitioning; checkpoints are the
lineage layer. Output: a per-image result table mirroring the reference's
``parcel_biomass_analysis`` (~26 cols, database_manager_v3.py:664-712)
shrunk to the image data model, written partitioned by cell prefix with
per-partition lineage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import functions as BF
from biomass_processing_pipeline_spark import synth
from biomass_processing_pipeline_spark.operators.knn import (
    knn_weighted_agg_fused,
)
from biomass_processing_pipeline_spark.operators.pipeline import (
    build_dictionaries, county_tile_assign,
)
from biomass_processing_pipeline_spark.operators.validation import (
    vegetation_validation,
)
from biomass_processing_pipeline_spark.operators.zonal import (
    decode_partials, shannon_index, zonal_band_stats, zonal_class_histogram,
)
from biomass_processing_pipeline_spark.plans.lineage import run_resumable
from biomass_processing_pipeline_spark.plans.partitioning import with_cell_prefix
from biomass_processing_pipeline_spark.sources.images import (
    load_images, with_footprint,
)


def biomass_result_table(spark: SparkSession, fixture_dir: str,
                         k_neighbors: int = 50,
                         fp: DataFrame | None = None) -> DataFrame:
    """-> per-image result rows: county + tile assignment, band stats,
    NDVI, distance-weighted plot attributes, confidence — the engine's
    analogue of the reference's comprehensive result dict
    (comprehensive_biomass_processor_v3.py:399-430).

    ``fp``: pre-built footprint frame (with_footprint over image_id) —
    pass it when the caller also needs footprints so the Arrow footprint
    pass is declared once in the DAG instead of twice."""
    counties = pd.read_parquet(f"{fixture_dir}/counties.parquet")
    tiles = pd.read_parquet(f"{fixture_dir}/tiles.parquet")
    plots = spark.read.parquet(f"{fixture_dir}/plots.parquet")
    images = load_images(spark, fixture_dir)

    if fp is None:
        fp = with_footprint(images.select("image_id"))
    dicts = build_dictionaries(spark, counties)
    # every 2M-row join below is keyed on the compact long `seq` (globally
    # unique: image_id embeds it), not the 25-char image_id string — long
    # keys pay ~3x less in every exchange + sort-merge sort, and the fused
    # kNN output needs no join-back at all. image_id rides along on the
    # decode branch (derived natively, no extra pass) and is restored as
    # the leading output column so the result schema is unchanged.
    assigned = county_tile_assign(spark, fp, counties, tiles, dicts=dicts,
                                  point_key="seq")

    partials = decode_partials(images)
    per_image = partials.select(
        # try_cast: a malformed image_id quarantines to NULL seq (falls
        # out of the seq-keyed joins, like its NULL footprint does) rather
        # than raising ANSI CAST_INVALID_INPUT mid-scan
        F.element_at(F.split("image_id", "_"), -1).try_cast("long")
        .alias("seq"),
        "image_id", "phash_ok", "px_count",
        # try_divide: a quarantined (undecodable) image has px_count = 0
        # -> NULL band means + phash_ok=False, not an ANSI job kill
        F.try_divide(F.col("sum_r"), F.col("px_count")).alias("mean_r"),
        F.try_divide(F.col("sum_g"), F.col("px_count")).alias("mean_g"),
        F.try_divide(F.col("sum_nir"), F.col("px_count")).alias("mean_nir"),
        # try_divide: an image with zero valid-NDVI pixels (nir + red == 0
        # everywhere) must yield NULL — the downstream when(isNotNull)
        # chain already expects it; plain `/` raises under ANSI instead
        F.try_divide(F.col("ndvi_sum"), F.col("ndvi_count")).alias("ndvi_mean"),
    )

    # fused kNN + weighted agg: the points x k intermediate never
    # materializes — the aggregation happens inside the top-k pandas pass.
    # Plot-level forest attributes (reference FIA columns) derive
    # deterministically from the fixture plots: stand age in years, a
    # 4-way forest type code, and attr_3 as the per-plot harvest
    # probability. stand_age rides the SAME fused pass as a 4th weighted
    # attr; forest type rides it as the mode_attr (A6 weighted mode).
    plots_f = plots.withColumn(
        "stand_age_yrs", (20 + F.pmod(F.col("plot_cn"), F.lit(80))).cast("double")
    ).withColumn("forest_type", F.pmod(F.col("plot_cn"), F.lit(4)).cast("int"))
    # kNN shuffle/sort key = `seq` (measured ~2-3x on the kNN stage at
    # sf0.1 — string keys pay in every exchange, sort and pandas groupby);
    # the one-row-per-point output joins the rest of the DAG on seq
    # directly, so the former image_id join-back is gone entirely.
    wagg = knn_weighted_agg_fused(
        fp.drop("image_id"), plots_f,
        ["attr_1", "attr_2", "attr_3", "stand_age_yrs"],
        k=k_neighbors, point_key="seq", mode_attr="forest_type",
    )

    veg = per_image.select(
        "seq", "image_id", "phash_ok", "px_count", "ndvi_mean",
        F.round(BF.evi(F.col("mean_nir"), F.col("mean_r"),
                       F.col("mean_g")), 6).alias("evi"),
        F.round(BF.savi(F.col("mean_nir"), F.col("mean_r")), 6).alias("savi"),
        F.round(BF.ndwi(F.col("mean_g"), F.col("mean_nir")), 6).alias("ndwi"),
        "mean_r", "mean_g", "mean_nir",
    )

    out = (
        assigned.join(veg, "seq")
        .join(wagg, "seq")
        .withColumn("biomass_mult", BF.ndvi_biomass_multiplier(F.col("ndvi_mean")))
        .withColumn(
            "standing_biomass_tons",
            F.round(F.col("w_attr_1") * F.col("biomass_mult"), 4),
        )
        .withColumn(
            "harvestable_tons",
            F.round(F.col("w_attr_2") * F.col("biomass_mult") * 0.8, 4),
        )
        .withColumn(
            "confidence_score",
            BF.confidence_score(
                F.lit(3), F.lit(100.0) * F.col("phash_ok").cast("double"),
                F.col("ndvi_mean"),
            ),
        )
        # reference forest A6 columns (forest_analyzer_v3.py:625-726):
        # weighted stand age, weighted-mode forest type, capped weighted
        # harvest probability (+0.1 ownership bonus, 0.95 cap)
        .withColumn("stand_age", F.round(F.col("w_stand_age_yrs"), 6))
        .withColumn("dominant_forest_type", F.col("mode_forest_type"))
        .withColumn(
            "harvest_prob",
            F.round(F.least(F.lit(0.95), F.col("w_attr_3") + F.lit(0.1)), 6),
        )
        # plausibility gate before persisting (the reference validates
        # every record pre-write, vegetation_analyzer_v3.py:233-273) —
        # native column expressions, no UDF
        .withColumn(
            "_vv",
            vegetation_validation(F.col("ndvi_mean"), F.col("px_count")),
        )
        .withColumn("valid", F.col("_vv.valid"))
        .withColumn(
            "validation_warnings", F.concat_ws("|", F.col("_vv.warnings"))
        )
        .drop("_vv")
        # reference result-row parity (database_manager_v3.py:664-712):
        # data_sources TEXT[] + three JSON detail blobs. Sources mirror
        # _get_data_sources_used (comprehensive_biomass_processor_v3.py:499):
        # imagery always, FIA when the kNN stage found neighbors, CDL when
        # vegetation indices resolved.
        .withColumn(
            "data_sources",
            F.filter(
                F.array(
                    F.lit("NAIP"),
                    F.when(F.col("n_neighbors") > 0, F.lit("FIA")),
                    F.when(F.col("ndvi_mean").isNotNull(), F.lit("CDL")),
                ),
                lambda x: x.isNotNull(),
            ),
        )
        .withColumn(
            "forest_analysis",
            F.to_json(F.struct(
                F.round("w_attr_1", 4).alias("biomass_tpa"),
                F.round("w_attr_2", 4).alias("harvestable_tpa"),
                F.col("n_neighbors"),
                F.round("sum_w", 6).alias("sum_w"),
                F.col("stand_age"),
                F.col("dominant_forest_type").alias("forest_type"),
                F.col("harvest_prob"),
            )),
        )
        .withColumn(
            "landcover_analysis",
            F.to_json(F.struct(
                F.col("ndvi_mean"), F.col("evi"), F.col("savi"),
                F.col("ndwi"), F.col("px_count"),
            )),
        )
        .withColumn(
            "crop_analysis",
            F.to_json(F.struct(
                F.col("biomass_mult").alias("multiplier"),
                F.col("standing_biomass_tons"),
                F.col("harvestable_tons"),
            )),
        )
    )
    # restore the public schema: image_id leads, the internal seq key is
    # dropped — column order is byte-identical to the pre-seq-key version.
    return out.select(
        "image_id", *[c for c in out.columns if c not in ("image_id", "seq")]
    )


def run_county_workflow(spark: SparkSession, tier: str, out_dir: str,
                        prefix_level: int = 8,
                        target_rows_per_task: int = 10_000,
                        reference_decimals: bool = False) -> dict:
    """End-to-end resumable run: results partitioned by cell prefix +
    lineage; re-invocation after a crash processes only missing buckets.

    ``reference_decimals=True`` writes the reference's NUMERIC(p,s)
    column types (sinks.cast_reference_decimals) instead of doubles.

    Skew handling (north_rule): a sampled census finds hot cell prefixes
    (the dense "urban" cells carry ~20% of all images); their rows get a
    ``salt = pmod(hash(image_id), S)`` and the pre-write repartition is on
    (bucket, salt), splitting each hot bucket across S tasks.
    """
    from biomass_processing_pipeline_spark.plans.partitioning import (
        repartition_salted, skew_census, with_salt,
    )

    d = synth.ensure_fixtures(spark, tier)
    fp = with_footprint(
        load_images(spark, d).select("image_id")
    )
    result = biomass_result_table(spark, d, fp=fp)
    # bucket key: recompute cell_id from image_id map-side (with_footprint
    # is a deterministic derivation — regex + one Arrow pass) instead of
    # shuffle-joining the 2M-row footprint frame back in; zero exchanges.
    bucketed = (
        with_footprint(result)
        .transform(lambda df: with_cell_prefix(df, prefix_level=prefix_level))
        .withColumnRenamed("cell_prefix", "bucket")
        .drop("tx", "ty", "band", "seq", "lon", "lat", "cell_id")
    )
    census = skew_census(
        fp.transform(lambda df: with_cell_prefix(df, prefix_level=prefix_level))
        .withColumnRenamed("cell_prefix", "bucket"),
        key_col="bucket", target_rows_per_task=target_rows_per_task,
    )
    salted = with_salt(bucketed, census, key_col="bucket", id_col="image_id")
    # sorted-within-partition output (SURVEY §4: cell-prefix partitioning
    # + in-file ordering replaces the reference's GiST index): image_id
    # embeds the tile code, so sorting clusters same-tile rows per file —
    # parquet min/max row-group pruning serves point lookups. In-task
    # sort only, no extra shuffle.
    balanced = (
        repartition_salted(salted, key_col="bucket").drop("salt")
        .sortWithinPartitions("bucket", "image_id")
    )
    if reference_decimals:
        from biomass_processing_pipeline_spark.sources.sinks import (
            cast_reference_decimals,
        )

        balanced = cast_reference_decimals(balanced)
    return run_resumable(balanced, out_dir)


def county_summary(spark: SparkSession, out_dir: str) -> DataFrame:
    """A13 run summary over the written result table."""
    res = spark.read.parquet(f"{out_dir}/data")
    return res.groupBy("fips").agg(
        F.count("*").alias("n_images"),
        F.round(F.sum("standing_biomass_tons"), 3).alias("total_standing_tons"),
        F.round(F.avg("confidence_score"), 3).alias("avg_confidence"),
        F.round(F.avg("ndvi_mean"), 6).alias("avg_ndvi"),
        F.min(F.col("phash_ok").cast("int")).alias("all_decodes_ok"),
    )
