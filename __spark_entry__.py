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
    """Flagship query: point-in-polygon county assignment of image centroids
    over the deterministic sf0.001 image+caption fixture (BASELINE.json
    input_hint shape), returning per-county image counts + phash distincts.

    cell-index (native Morton columns) -> broadcast cover join -> Arrow-UDF
    ray-cast refine -> groupBy.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark import synth
    from biomass_processing_pipeline_spark.operators.pip import (
        assign_points_to_polygons,
    )
    from biomass_processing_pipeline_spark.sources.images import (
        load_images,
        with_footprint,
    )

    d = synth.ensure_fixtures(spark, "sf0.001")
    images = load_images(spark, d)
    fp = with_footprint(images.select("image_id"))
    counties = pd.read_parquet(f"{d}/counties.parquet")
    assigned = assign_points_to_polygons(spark, fp, counties, "fips")
    return (
        assigned.join(images, "image_id")
        .groupBy("fips")
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("phash").alias("n_distinct_phash"),
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
