"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full county workflow DAG on the deterministic sf0.001
    image+caption fixture (BASELINE.json input_hint shape) — footprint
    decode -> Morton cell index (native columns) -> fused county+tile
    assignment (broadcast cover join, rectilinear-piece refine) -> binary
    decode partials (Arrow) -> kNN distance-weighted plot attributes ->
    vegetation indices + biomass math -> per-county summary.
    """
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.workflow import biomass_result_table

    d = synth.ensure_fixtures(spark, "sf0.001")
    res = biomass_result_table(spark, d, k_neighbors=10)
    return (
        res.groupBy("fips")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.sum("standing_biomass_tons"), 3).alias("total_standing_tons"),
            F.round(F.avg("confidence_score"), 3).alias("avg_confidence"),
            F.round(F.avg("ndvi_mean"), 6).alias("avg_ndvi"),
            F.min(F.col("phash_ok").cast("int")).alias("all_decodes_ok"),
        )
        .orderBy("fips")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from biomass_processing_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    from biomass_processing_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
