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
