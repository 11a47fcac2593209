"""Table catalog abstraction: Iceberg when available, parquet otherwise.

The north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jars, so the engine probes at session build time (SURVEY.md §7.0 point 1:
"check at session build time; do not hard-require Iceberg") and falls back
to a parquet layout with the SAME partition columns. Every writer/reader
in the engine goes through these helpers, so flipping to Iceberg on a real
cluster is a config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg SQL extensions are loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 - ClassNotFound surfaces as Py4J error
        return False


def write_table(
    df: DataFrame, name_or_path: str, partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a table via Iceberg (``writeTo``) when available, else parquet
    with identical partition columns. Returns the backend used."""
    spark = df.sparkSession
    if iceberg_available(spark) and not name_or_path.startswith("/"):
        writer = df.writeTo(name_or_path)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(name_or_path)
    return "parquet"


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    if iceberg_available(spark) and not name_or_path.startswith("/"):
        return spark.read.table(name_or_path)
    return spark.read.parquet(name_or_path)


def merge_upsert_sql(target: str, source_view: str,
                     key_cols: list[str]) -> str:
    """The Iceberg ``MERGE INTO`` an upsert runs on a real cluster — the
    exact analogue of the reference's ``INSERT ... ON CONFLICT (keys) DO
    UPDATE`` (database_manager_v3.py:727-732). Spark's parser accepts
    this syntax without Iceberg, so tests validate it structurally even
    in this jar-less sandbox."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def merge_upsert(spark: SparkSession, new: DataFrame, target: str,
                 key_cols: list[str], fallback_path: str) -> str:
    """Keep-latest upsert through the catalog: Iceberg MERGE INTO when the
    runtime has it, else the single-pass parquet emulation with identical
    semantics. Returns the backend used."""
    if iceberg_available(spark):
        new.createOrReplaceTempView("_merge_src")
        spark.sql(merge_upsert_sql(target, "_merge_src", key_cols))
        return "iceberg-merge"
    from biomass_processing_pipeline_spark.sources.sinks import upsert_parquet

    upsert_parquet(spark, new, fallback_path, key_cols)
    return "parquet-upsert"
