"""Cell-prefix partitioning + explicit skew salting (north_rule).

The fixture (like the real world) concentrates ~20% of images in 2 dense
"urban" cells. A groupBy/join keyed on cell prefix would put those in 2
giant tasks. Remedies, composable:

- :func:`skew_census` — sampled per-prefix counts (one cheap pass on a
  fixed-seed sample; SURVEY.md §7.1 point 4) -> salt factor per hot prefix.
- :func:`with_salt` — ``salt = pmod(hash(id), S_prefix)`` via a broadcast
  salt map; cold prefixes get S=1 so their layout is unchanged.
- :func:`repartition_salted` — repartition by (prefix, salt): hot cells
  split across S tasks, AQE skew-join handles the residual.

The reference's analogue is static state->VM assignment with no skew
handling at all (``multi_vm_coordinator.py:28-39``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import cells


def with_cell_prefix(
    df: DataFrame, level: int = cells.DEFAULT_LEVEL, prefix_level: int = 6,
    cell_col: str = "cell_id",
) -> DataFrame:
    return df.withColumn(
        "cell_prefix", cells.cell_prefix_col(F.col(cell_col), level, prefix_level)
    )


def skew_census(
    df: DataFrame, key_col: str = "cell_prefix",
    sample_frac: float = 0.05, target_rows_per_task: int = 50_000,
    seed: int = 42,
) -> dict[int, int]:
    """-> {prefix: salt_factor} for prefixes whose estimated row count
    exceeds the per-task target. Sampled with a fixed seed (deterministic);
    full-scan-free."""
    est = (
        df.sample(fraction=sample_frac, seed=seed)
        .groupBy(key_col)
        .agg((F.count("*") / sample_frac).alias("est"))
        .where(F.col("est") > target_rows_per_task)
        .collect()
    )
    return {
        int(r[key_col]): max(2, int(r["est"] // target_rows_per_task) + 1)
        for r in est
    }


def with_salt(
    df: DataFrame, salt_map: dict[int, int],
    key_col: str = "cell_prefix", id_col: str = "image_id",
) -> DataFrame:
    """salt in [0, S_prefix): hash-spread rows of hot prefixes; S=1 (salt 0)
    elsewhere. The salt map is tiny -> broadcast join."""
    if not salt_map:
        return df.withColumn("salt", F.lit(0))
    spark = df.sparkSession
    sm = spark.createDataFrame(
        [(k, v) for k, v in sorted(salt_map.items())], f"{key_col} long, _s int"
    )
    return (
        df.join(F.broadcast(sm), key_col, "left")
        .withColumn(
            "salt",
            F.when(F.col("_s").isNull(), F.lit(0)).otherwise(
                F.pmod(F.hash(F.col(id_col)), F.col("_s"))
            ),
        )
        .drop("_s")
    )


def repartition_salted(
    df: DataFrame, n_partitions: int | None = None,
    key_col: str = "cell_prefix",
) -> DataFrame:
    cols = [F.col(key_col), F.col("salt")]
    if n_partitions:
        return df.repartition(n_partitions, *cols)
    return df.repartition(*cols)
