"""kNN nearest-plot lookup with cell-neighbor ring expansion (SURVEY.md
J2/W1/A5-A6).

Reference semantics: ``ST_DWithin(centroid, point, radius) ORDER BY
distance LIMIT 50`` per parcel (``/root/reference/src/config/
database_config_v3.py:104-114``) followed by distance-weighted aggregation
(``src/analyzers/forest_analyzer_v3.py:185-248``: weight = 1/(dist+0.01)).

Spark-first shape:

1. targets get a ``cell_id`` (native Morton columns);
2. each query point explodes to its k-ring of cells (Arrow UDF producing
   an array column -> ``explode``) — the reference's zone/band candidate
   ring (``coordinate_utils_v3.py:264-318``);
3. **sort-merge/shuffle equi-join** on ``cell_id`` (both sides large at
   10^12 scale — this is the north_rule's "sort-merge for cell-cell
   matching"); distance is plain column math (degree euclidean, exactly
   the reference's ``distance_degrees``);
4. window ``row_number() <= k`` per query point;
5. points that found < k candidates retry with a doubled ring radius
   (driver-side bounded loop + anti-join — same filter-refine escalation
   the reference applies when a tile ring misses).

Correctness guarantee: a point with >= k candidates inside ring radius r
has its true top-k complete iff the k-th distance <= r * cell_width (the
ring covers that disc). We check that bound and escalate when violated,
so results match brute force exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells


def distance_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Euclidean degree distance (reference ``distance_degrees``)."""
    return F.sqrt(F.pow(lon1 - lon2, 2) + F.pow(lat1 - lat2, 2))


def _ring_udf(level: int, k: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def ring(cell: pd.Series) -> pd.Series:
        arr = cells.neighbors_np(cell.to_numpy(), level, k)
        # unique per row to drop clamped duplicates at grid edges
        return pd.Series([np.unique(row).tolist() for row in arr])

    return ring


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    k: int = 50,
    level: int = cells.DEFAULT_LEVEL,
    point_key: str = "image_id",
    target_key: str = "plot_cn",
    init_ring: int | None = None,
    max_rounds: int = 4,
) -> DataFrame:
    """points(point_key, lon, lat, cell_id) x targets(target_key, lon, lat)
    -> (point_key, target_key, distance, rank), rank 1..k.

    Deterministic: ties broken by target_key ascending.
    """
    targets = targets.select(
        F.col(target_key),
        F.col("lon").alias("t_lon"),
        F.col("lat").alias("t_lat"),
        cells.cell_id_col(F.col("lon"), F.col("lat"), level).alias("t_cell"),
    )
    # coverage guarantee must use the SMALLER cell dimension: the grid is
    # 2^L x 2^L over a 360x180 extent, so cells are 2:1 rectangles and a
    # ring of Chebyshev radius r only guarantees the disc of radius
    # r * min(width, height) degrees.
    cell_w_deg = min(
        (cells.LON_MAX - cells.LON_MIN) / (1 << level),
        (cells.LAT_MAX - cells.LAT_MIN) / (1 << level),
    )

    if init_ring is None:
        # density-based sizing: pick the ring whose disc is expected to hold
        # ~1.5k targets, so round 1 usually completes (the reference sizes
        # its search radius the same way — a fixed 0.1 degree default tuned
        # to FIA plot density, processing_config_v3.py:23).
        stats_row = targets.agg(
            F.count("*").alias("n"),
            F.min("t_lon").alias("x0"), F.max("t_lon").alias("x1"),
            F.min("t_lat").alias("y0"), F.max("t_lat").alias("y1"),
        ).collect()[0]
        area = max((stats_row.x1 - stats_row.x0) * (stats_row.y1 - stats_row.y0), 1e-9)
        density = max(stats_row.n / area, 1e-9)
        r_needed = float(np.sqrt(1.5 * k / (np.pi * density)))
        cell_h = min(
            (cells.LON_MAX - cells.LON_MIN) / (1 << level),
            (cells.LAT_MAX - cells.LAT_MIN) / (1 << level),
        )
        init_ring = max(1, int(np.ceil(r_needed / cell_h)))

    remaining = points.select(point_key, "lon", "lat", "cell_id")
    results = []
    ring_k = init_ring
    for rnd in range(max_rounds):
        ring = _ring_udf(level, ring_k)
        cand = (
            remaining.withColumn("ring_cell", F.explode(ring(F.col("cell_id"))))
            .join(targets, F.col("ring_cell") == F.col("t_cell"))
            .withColumn(
                "distance",
                distance_deg(F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")),
            )
        )
        w = Window.partitionBy(point_key).orderBy("distance", target_key)
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(point_key, target_key, "distance", "rank", "lon", "lat", "cell_id")
        )
        # complete iff k found AND the k-th distance fits inside the ring disc
        # (ring of radius r guarantees coverage of distance <= r*cell_width)
        guard = ring_k * cell_w_deg
        stats = topk.groupBy(point_key).agg(
            F.count("*").alias("_n"), F.max("distance").alias("_dmax")
        )
        complete_keys = stats.where(
            (F.col("_n") >= k) & (F.col("_dmax") <= guard)
        ).select(point_key)
        done = topk.join(F.broadcast(complete_keys), point_key, "left_semi")
        results.append(done.select(point_key, target_key, "distance", "rank"))
        remaining = remaining.join(
            F.broadcast(complete_keys), point_key, "left_anti"
        ).persist()
        ring_k *= 2
        if remaining.isEmpty():
            break

    if not remaining.isEmpty():
        # exact fallback for stragglers (sparse neighborhoods): brute-force
        # window over a cross join — ``remaining`` is small by now.
        cand = remaining.crossJoin(targets).withColumn(
            "distance",
            distance_deg(F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")),
        )
        w = Window.partitionBy(point_key).orderBy("distance", target_key)
        results.append(
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(point_key, target_key, "distance", "rank")
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def distance_weighted_agg(
    knn: DataFrame,
    targets: DataFrame,
    attrs: list[str],
    point_key: str = "image_id",
    target_key: str = "plot_cn",
    eps: float = 0.01,
) -> DataFrame:
    """A5: per point, weighted mean of target attrs, weight 1/(dist+eps)
    (reference ``forest_analyzer_v3.py:185-248``). Plain relational aggs —
    partial/final map-side combine for free."""
    j = knn.join(targets.select(target_key, *attrs), target_key)
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    aggs = [F.sum(wcol).alias("sum_w"), F.count("*").alias("n_neighbors")]
    for a in attrs:
        aggs.append((F.sum(wcol * F.col(a)) / F.sum(wcol)).alias(f"w_{a}"))
    return j.groupBy(point_key).agg(*aggs)
