"""Forest-style weighted aggregates (SURVEY.md A5/A6) over kNN output.

Reference semantics (``/root/reference/src/analyzers/forest_analyzer_v3.py``):

- distance-weighted biomass means, weight = 1/(dist+0.01)  (``:185-248``)
- weighted average stand age                               (``:625-642``)
- weighted MODE of forest type (argmax of summed weights)  (``:644-680``)
- capped weighted harvest probability with bonuses         (``:682-726``)

All expressed as relational aggregations + one ranking window — map-side
partial aggregation and AQE handle the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.knn import nan_attrs_as_null


def forest_threshold_filter(
    df: DataFrame,
    acres_col: str = "forest_acres",
    pct_col: str = "forest_pct",
    min_acres: float = 0.1,
    min_pct: float = 5.0,
) -> DataFrame:
    """F5: drop rows with minimal forest coverage — the reference skips a
    parcel when ``forest_area_acres < 0.1 or forest_percentage < 5.0``
    (forest_analyzer_v3.py:74-77). Native filter; Catalyst pushes it to
    the scan when the columns are stored."""
    return df.where(
        (F.col(acres_col) >= min_acres) & (F.col(pct_col) >= min_pct)
    )


def weighted_mode(
    knn: DataFrame, targets: DataFrame, type_col: str,
    point_key: str = "image_id", target_key: str = "plot_cn",
    eps: float = 0.01,
) -> DataFrame:
    """A6 weighted mode: per point, the target category with the largest
    summed weight; ties by smaller category value (deterministic). NULL
    categories are excluded from the vote (a neighbor with an unknown type
    cannot nominate a winner) — and a stored NaN in a float category is
    the same unknown (``nan_attrs_as_null``); a point whose neighbors are
    ALL NULL-typed yields no row — the fused caller left-joins so such
    points keep a NULL mode."""
    j = knn.join(
        targets.select(target_key, *nan_attrs_as_null(targets, [type_col])),
        target_key,
    ).where(F.col(type_col).isNotNull())
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    per_type = j.groupBy(point_key, type_col).agg(F.sum(wcol).alias("w"))
    w = Window.partitionBy(point_key).orderBy(F.desc("w"), F.asc(type_col))
    return (
        per_type.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(point_key, F.col(type_col).alias("dominant_type"),
                F.round("w", 6).alias("type_weight"))
    )


def weighted_stand_age(
    knn: DataFrame, targets: DataFrame, age_col: str,
    point_key: str = "image_id", target_key: str = "plot_cn",
    eps: float = 0.01,
) -> DataFrame:
    """A6 weighted average age: sum(w*age)/sum(w), rounded. Stored-NaN
    ages quarantine to NULL (drop from the numerator, never poison)."""
    j = knn.join(
        targets.select(target_key, *nan_attrs_as_null(targets, [age_col])),
        target_key,
    )
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    return j.groupBy(point_key).agg(
        F.round(F.sum(wcol * F.col(age_col)) / F.sum(wcol), 6).alias("stand_age")
    )


def harvest_probability(
    knn: DataFrame, targets: DataFrame, prob_col: str,
    point_key: str = "image_id", target_key: str = "plot_cn",
    eps: float = 0.01, ownership_bonus: float = 0.1, cap: float = 0.95,
) -> DataFrame:
    """A6 capped weighted probability: weighted mean of a per-plot
    probability plus a flat bonus, capped (forest_analyzer_v3.py:682-726).
    Stored-NaN probabilities quarantine to NULL (never poison the mean)."""
    j = knn.join(
        targets.select(target_key, *nan_attrs_as_null(targets, [prob_col])),
        target_key,
    )
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    base = F.sum(wcol * F.col(prob_col)) / F.sum(wcol)
    return j.groupBy(point_key).agg(
        F.round(
            F.least(F.lit(cap), base + F.lit(ownership_bonus)), 6
        ).alias("harvest_prob")
    )
