"""Driver-contract query registry: one entry per SQL-expressible operator
from SURVEY.md §2, each with a DuckDB-checkable ANSI-SQL twin.

Conventions (driver compare = row-count + schema + order-insensitive
value-hash over name-sorted columns):

- every computed column is aliased IDENTICALLY in Spark and SQL;
- float aggregates are ``round(x, N)`` BOTH sides (and the SQL side is
  cast back to DOUBLE — DuckDB's round() yields DECIMAL);
- rankings order by the ROUNDED value plus a unique tiebreaker so both
  engines rank identically;
- LIMIT queries always carry a total order.

Geospatial-semantics operators (cell index, lattice tile-assign, kNN) are
oracled here over *derived points*: deterministic lon/lat columns computed
from ``events.event_id`` with closed-form arithmetic that both engines
express exactly. The real image-table variants (binary decode, ray-cast
PIP) are oracled against the fixture's independent brute-force goldens,
and the ANN variants against frozen candidate sets — every registry entry
carries a hash-exact DuckDB twin.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark.synth import URBAN_CODES

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic derived points from events (see module docstring)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.lit(-92.0) + (F.col("event_id") % 4000) * 0.001).alias("lon"),
        (F.lit(38.0) + (F.floor(F.col("event_id") / 7) % 4000) * 0.001).alias("lat"),
    )


_POINTS_SQL = """
  SELECT event_id,
         -92.0 + (event_id % 4000) * 0.001 AS lon,
         38.0 + ((event_id // 7) % 4000) * 0.001 AS lat
  FROM events
"""


def _morton_sql(ix: str, iy: str) -> str:
    """DuckDB SQL for the same magic-number Morton interleave as
    cells.cell_id_col (parity proof of the native-column implementation)."""
    def spread(v: str) -> str:
        out = f"CAST({v} AS BIGINT)"
        for shift, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                            (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                            (1, 0x5555555555555555)):
            out = f"(({out}) | (({out}) << {shift})) & {mask}"
        return out

    return f"({spread(ix)}) | (({spread(iy)}) << 1)"


# ---------------------------------------------------------------------------
# relational operator queries (SURVEY.md §2 refs in each docstring)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """A13 county/run summary aggregate (groupBy + multi-agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_PRICING = """
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(SUM(l_quantity), 4) AS DOUBLE) AS sum_qty,
         CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue,
         COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_urban_filter(spark, sf_dir):
    """F1 urban-code NOT IN filter (database_config_v3.py:91,175)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.where(~F.col("p_size").isin([1, 2, 3, 7, 11]))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
    )


SQL_URBAN = """
  SELECT p_brand, COUNT(*) AS n_parts,
         CAST(ROUND(AVG(p_retailprice), 4) AS DOUBLE) AS avg_price
  FROM part WHERE p_size NOT IN (1, 2, 3, 7, 11) GROUP BY p_brand
"""


def q_minarea_filter(spark, sf_dir):
    """F2 min-area threshold filter (database_manager_v3.py:186-187)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 45.0)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_big"),
             F.round(F.sum("l_extendedprice"), 4).alias("sum_price"))
    )


SQL_MINAREA = """
  SELECT l_returnflag, COUNT(*) AS n_big,
         CAST(ROUND(SUM(l_extendedprice), 4) AS DOUBLE) AS sum_price
  FROM lineitem WHERE l_quantity > 45.0 GROUP BY l_returnflag
"""


def q_null_guard(spark, sf_dir):
    """F6 null/zero guards (database_manager_v3.py:330-343)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull() & (F.col("value") > 0))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_pos"),
             F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_NULL_GUARD = """
  SELECT event_type, COUNT(*) AS n_pos,
         CAST(ROUND(SUM(value), 4) AS DOUBLE) AS sum_value
  FROM events WHERE value IS NOT NULL AND value > 0 GROUP BY event_type
"""


def q_topk_per_group(spark, sf_dir):
    """W1 top-k per group (ORDER BY distance LIMIT 50 analogue)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 4).alias("price"), "rank")
    )


SQL_TOPK = """
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS price,
         CAST(rank AS INT) AS rank FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders) WHERE rank <= 5
"""


def q_dominant_argmax(spark, sf_dir):
    """A8 dominant-crop argmax per parcel (crop_analyzer_v3.py:391)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey",
                F.col("o_orderkey").alias("dominant_order"),
                F.round("o_totalprice", 4).alias("dominant_price"))
    )


SQL_DOMINANT = """
  SELECT o_custkey, o_orderkey AS dominant_order,
         CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS dominant_price FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders) WHERE rn = 1
"""


def q_weighted_mean(spark, sf_dir):
    """A5 distance-weighted mean (forest_analyzer_v3.py:185-248):
    sum(w*x)/sum(w) per group, here w=quantity, x=extendedprice."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_quantity") * F.col("l_extendedprice"))
            / F.sum("l_quantity"), 4
        ).alias("w_price"),
        F.count("*").alias("n_items"),
    )


SQL_WEIGHTED = """
  SELECT l_suppkey,
         CAST(ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 4)
              AS DOUBLE) AS w_price,
         COUNT(*) AS n_items
  FROM lineitem GROUP BY l_suppkey
"""


def q_shannon_entropy(spark, sf_dir):
    """A10 Shannon fragmentation index (landcover_analyzer_v3.py:401-427)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_tot"), F.count("*").alias("n_types")
    )
    p = counts.crossJoin(tot).withColumn("_p", F.col("n") / F.col("_tot"))
    return p.groupBy("n_types").agg(
        F.round(
            (-F.sum(F.col("_p") * F.log("_p"))) / F.log(F.max("n_types")), 6
        ).alias("shannon_index")
    )


SQL_SHANNON = """
  WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
       t AS (SELECT SUM(n) AS tot, COUNT(*) AS n_types FROM c)
  SELECT n_types,
         CAST(ROUND((-SUM((n/tot) * LN(n/tot))) / LN(n_types), 6) AS DOUBLE)
           AS shannon_index
  FROM c, t GROUP BY n_types
"""


def q_bounds_agg(spark, sf_dir):
    """A1 bounds aggregate (ST_Extent analogue)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.count("*").alias("n_orders"),
    )


SQL_BOUNDS = """
  SELECT o_orderpriority,
         CAST(ROUND(MIN(o_totalprice), 4) AS DOUBLE) AS min_price,
         CAST(ROUND(MAX(o_totalprice), 4) AS DOUBLE) AS max_price,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_orderpriority
"""


def q_semi_join(spark, sf_dir):
    """J3 semi join (plt_cn = ANY(...) trees prefetch)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000.0)
    return (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


SQL_SEMI = """
  SELECT l_returnflag, COUNT(*) AS n_items,
         CAST(ROUND(SUM(l_quantity), 4) AS DOUBLE) AS sum_qty
  FROM lineitem WHERE l_orderkey IN
    (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
  GROUP BY l_returnflag
"""


def q_dim_join(spark, sf_dir):
    """J3/dict-lookup: broadcast dimension chain customer->nation->region
    (the broadcast polygon/code dictionary pattern)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"),
             F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


SQL_DIM_JOIN = """
  SELECT r_name, COUNT(*) AS n_customers,
         CAST(ROUND(AVG(c_acctbal), 4) AS DOUBLE) AS avg_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
"""


_BANDS = [(0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
          (150000.0, 300000.0, "high"), (300000.0, 1e12, "whale")]


def q_range_join(spark, sf_dir):
    """J4 bbox interval join: non-equi BETWEEN join against a tiny
    interval dimension (broadcast nested-loop in Spark)."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        o.join(F.broadcast(bands),
               (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("sum_price"))
    )


SQL_RANGE_JOIN = """
  SELECT band, COUNT(*) AS n_orders,
         CAST(ROUND(SUM(o_totalprice), 4) AS DOUBLE) AS sum_price
  FROM orders JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
                           (150000.0, 300000.0, 'high'),
                           (300000.0, 1000000000000.0, 'whale')) b(lo, hi, band)
    ON o_totalprice >= lo AND o_totalprice < hi
  GROUP BY band
"""


def q_distinct_sort_limit(spark, sf_dir):
    """§2.6 distinct + global sort + limit."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id").distinct()
        .orderBy(F.asc("event_type"), F.asc("user_id"))
        .limit(500)
    )


SQL_DISTINCT = """
  SELECT DISTINCT event_type, user_id FROM events
  ORDER BY event_type, user_id LIMIT 500
"""


def q_histogram_pct(spark, sf_dir):
    """A2/A3 class histogram -> percent-of-total rollup."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("pixel_count"))
    tot = counts.agg(F.sum("pixel_count").alias("_tot"))
    return counts.crossJoin(tot).select(
        "event_type", "pixel_count",
        F.round(F.col("pixel_count") * 100.0 / F.col("_tot"), 6).alias("percent"),
    )


SQL_HISTOGRAM = """
  WITH c AS (SELECT event_type, COUNT(*) AS pixel_count FROM events GROUP BY 1)
  SELECT event_type, pixel_count,
         CAST(ROUND(pixel_count * 100.0 / (SELECT SUM(pixel_count) FROM c), 6)
              AS DOUBLE) AS percent
  FROM c
"""


# ---------------------------------------------------------------------------
# geospatial-semantics queries over derived points (SQL-oracled)
# ---------------------------------------------------------------------------

def q_cell_index(spark, sf_dir):
    """§2.7 hierarchical cell-id encode — native Morton columns vs the same
    interleave spelled out in SQL (parity proof for cells.cell_id_col)."""
    pts = _points(spark, sf_dir)
    return pts.select(
        "event_id",
        cells.cell_id_col(F.col("lon"), F.col("lat"), 10).alias("cell_id"),
        cells.cell_prefix_col(
            cells.cell_id_col(F.col("lon"), F.col("lat"), 10), 10, 5
        ).alias("cell_prefix"),
    )


def _sql_cell_index() -> str:
    ix = "LEAST(1023, GREATEST(0, CAST(FLOOR((lon + 180.0) / 360.0 * 1024) AS BIGINT)))"
    iy = "LEAST(1023, GREATEST(0, CAST(FLOOR((lat + 90.0) / 180.0 * 1024) AS BIGINT)))"
    morton = _morton_sql(ix, iy)
    return f"""
      WITH pts AS ({_POINTS_SQL})
      SELECT event_id, ({morton}) AS cell_id, (({morton}) >> 10) AS cell_prefix
      FROM pts
    """


def q_tile_assign_lattice(spark, sf_dir):
    """J4/J5 closed-form lattice tile assignment (tile-name math,
    coordinate_utils_v3.py:327-358)."""
    pts = _points(spark, sf_dir)
    g = 0.25
    tx = F.floor((F.col("lon") - F.lit(-92.0)) / F.lit(g)).cast("long")
    ty = F.floor((F.col("lat") - F.lit(38.0)) / F.lit(g)).cast("long")
    return (
        pts.select(F.format_string("G%02d%02d", tx, ty).alias("tile_code"))
        .groupBy("tile_code")
        .agg(F.count("*").alias("n_points"))
    )


SQL_TILE_ASSIGN = f"""
  WITH pts AS ({_POINTS_SQL})
  SELECT printf('G%02d%02d',
                CAST(FLOOR((lon - (-92.0)) / 0.25) AS BIGINT),
                CAST(FLOOR((lat - 38.0) / 0.25) AS BIGINT)) AS tile_code,
         COUNT(*) AS n_points
  FROM pts GROUP BY 1
"""


def q_knn_lattice(spark, sf_dir):
    """J2/W1 kNN top-3 by euclidean degree distance against an 8x8 lattice
    of targets, rank ties broken by target id — relational oracle for the
    ring-expansion kNN operator's semantics."""
    pts = _points(spark, sf_dir).where(F.col("event_id") % 50 == 0)
    t = (
        spark.range(64)
        .select(
            F.col("id").alias("target_id"),
            (F.lit(-92.0) + ((F.col("id") % 8) + 0.5) * 0.5).alias("t_lon"),
            (F.lit(38.0) + (F.floor(F.col("id") / 8) + 0.5) * 0.5).alias("t_lat"),
        )
    )
    j = pts.crossJoin(F.broadcast(t)).withColumn(
        "distance",
        F.round(F.sqrt(F.pow(F.col("lon") - F.col("t_lon"), 2)
                       + F.pow(F.col("lat") - F.col("t_lat"), 2)), 9),
    )
    w = Window.partitionBy("event_id").orderBy("distance", "target_id")
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("event_id", "target_id", "distance", "rank")
    )


SQL_KNN = f"""
  WITH pts AS ({_POINTS_SQL}),
  q AS (SELECT * FROM pts WHERE event_id % 50 = 0),
  t AS (SELECT i + j * 8 AS target_id,
               -92.0 + (i + 0.5) * 0.5 AS t_lon,
               38.0 + (j + 0.5) * 0.5 AS t_lat
        FROM generate_series(0, 7) s1(i), generate_series(0, 7) s2(j)),
  d AS (SELECT event_id, target_id,
               CAST(ROUND(SQRT((lon - t_lon) * (lon - t_lon)
                               + (lat - t_lat) * (lat - t_lat)), 9) AS DOUBLE)
                 AS distance
        FROM q, t)
  SELECT event_id, target_id, distance,
         CAST(rnk AS INT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                 ORDER BY distance, target_id) AS rnk
    FROM d) WHERE rnk <= 3
"""


def q_weighted_knn_agg(spark, sf_dir):
    """A5 applied to the kNN output: per point, 1/(d+0.01)-weighted mean of
    a target attribute (attr = target_id as a stand-in measurement)."""
    knn = q_knn_lattice(spark, sf_dir)
    wcol = 1.0 / (F.col("distance") + F.lit(0.01))
    return knn.groupBy("event_id").agg(
        F.round(F.sum(wcol * F.col("target_id")) / F.sum(wcol), 6).alias("w_attr"),
        F.count("*").alias("n_neighbors"),
    )


SQL_WEIGHTED_KNN = f"""
  WITH knn AS ({SQL_KNN})
  SELECT event_id,
         CAST(ROUND(SUM(target_id / (distance + 0.01))
                    / SUM(1.0 / (distance + 0.01)), 6) AS DOUBLE) AS w_attr,
         COUNT(*) AS n_neighbors
  FROM knn GROUP BY event_id
"""


def _county_pieces():
    """Deterministic 8x4 county tiling (the sf0.01 fixture dictionary) as
    rectilinear pieces — pure function, shared by the Spark query and the
    SQL oracle."""
    from biomass_processing_pipeline_spark import geometry as G
    from biomass_processing_pipeline_spark.synth import county_polygons

    counties = county_polygons(8, 4)
    pieces = []
    for t in counties.itertuples(index=False):
        xs, ys = G.parse_wkt_polygon(t.geom_wkt)
        for minx, miny, maxx, maxy in G.decompose_rectilinear(xs, ys):
            pieces.append((t.fips, minx, miny, maxx, maxy))
    return counties, pieces


def q_pip_points(spark, sf_dir):
    """J7 point-in-polygon THROUGH THE REAL OPERATOR (cell cover join +
    piece/ray-cast refine + min-fips tie rule) over derived points against
    the county tiling, oracled by an independent SQL piece-containment
    join — the flagship operator's own DuckDB oracle."""
    from biomass_processing_pipeline_spark.operators.pip import (
        assign_points_to_polygons,
    )

    counties, _ = _county_pieces()
    pts = _points(spark, sf_dir).withColumn(
        "cell_id", cells.cell_id_col(F.col("lon"), F.col("lat"), 10)
    )
    return assign_points_to_polygons(
        spark, pts, counties, "fips", point_key="event_id"
    )


def _sql_pip_points() -> str:
    _, pieces = _county_pieces()
    values = ",\n    ".join(
        f"('{f}', {a!r}, {b!r}, {c!r}, {d!r})" for f, a, b, c, d in pieces
    )
    return f"""
      WITH pts AS ({_POINTS_SQL}),
      pieces(fips, minx, miny, maxx, maxy) AS (VALUES
        {values})
      SELECT event_id, MIN(fips) AS fips
      FROM pts JOIN pieces
        ON lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy
      GROUP BY event_id
    """


def q_weighted_mode(spark, sf_dir):
    """A6 weighted mode (dominant forest type, forest_analyzer_v3.py:644-680):
    per kNN point, the target category with max summed 1/(d+0.01) weight."""
    knn = q_knn_lattice(spark, sf_dir)
    typed = knn.withColumn("cat", (F.col("target_id") % 4).cast("int"))
    wcol = 1.0 / (F.col("distance") + F.lit(0.01))
    per = typed.groupBy("event_id", "cat").agg(F.round(F.sum(wcol), 6).alias("w"))
    w = Window.partitionBy("event_id").orderBy(F.desc("w"), F.asc("cat"))
    return (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", F.col("cat").alias("dominant_type"),
                F.col("w").alias("type_weight"))
    )


SQL_WEIGHTED_MODE = f"""
  WITH knn AS ({SQL_KNN}),
  per AS (SELECT event_id, CAST(target_id % 4 AS INT) AS cat,
                 CAST(ROUND(SUM(1.0 / (distance + 0.01)), 6) AS DOUBLE) AS w
          FROM knn GROUP BY 1, 2)
  SELECT event_id, cat AS dominant_type, w AS type_weight FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                 ORDER BY w DESC, cat) AS rn
    FROM per) WHERE rn = 1
"""


def q_percentiles(spark, sf_dir):
    """A12 NDVI distribution stats analogue: exact median + quartiles per
    group (reference landcover_analyzer_v3.py:459-467)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", 0.75), 4).alias("p75"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.count("*").alias("n"),
    )


SQL_PERCENTILES = """
  SELECT l_returnflag,
         CAST(ROUND(MEDIAN(l_extendedprice), 4) AS DOUBLE) AS median_price,
         CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
         CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75,
         CAST(ROUND(MIN(l_extendedprice), 4) AS DOUBLE) AS min_price,
         CAST(ROUND(MAX(l_extendedprice), 4) AS DOUBLE) AS max_price,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_classes(spark, sf_dir):
    """A3 class->area pivot rollup (landcover_analyzer_v3.py:246-304):
    wide per-class columns via pivot (explicit value list -> single-pass
    conditional aggregation, no extra distinct job)."""
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0)
    )
    cols = [F.col("user_id")] + [F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES]
    return wide.select(*cols)


SQL_PIVOT = """
  SELECT user_id,
         COUNT(*) FILTER (event_type = 'click') AS n_click,
         COUNT(*) FILTER (event_type = 'error') AS n_error,
         COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
         COUNT(*) FILTER (event_type = 'signup') AS n_signup,
         COUNT(*) FILTER (event_type = 'view') AS n_view
  FROM events GROUP BY user_id
"""


def q_scalar_geo(spark, sf_dir):
    """§2.7 scalar inventory: UTM zone/EPSG, lat band, WorldCover tile
    name, MGRS-like id, coordinate validation — native column math."""
    from biomass_processing_pipeline_spark import functions as BF

    pts = _points(spark, sf_dir)
    lon, lat = F.col("lon"), F.col("lat")
    return pts.select(
        "event_id",
        BF.utm_zone(lon).alias("utm_zone"),
        BF.utm_epsg(lon, lat).alias("utm_epsg"),
        BF.lat_band(lat).alias("lat_band"),
        BF.worldcover_tile_name(lon, lat).alias("wc_tile"),
        BF.mgrs_like_tile_id(lon, lat).alias("mgrs_id"),
        BF.valid_lonlat(lon, lat).alias("coord_ok"),
    )


SQL_SCALAR_GEO = f"""
  WITH pts AS ({_POINTS_SQL})
  SELECT event_id,
         CAST(FLOOR((lon + 180.0) / 6.0) + 1 AS INT) AS utm_zone,
         CAST(CASE WHEN lat >= 0
                   THEN FLOOR((lon + 180.0) / 6.0) + 1 + 32600
                   ELSE FLOOR((lon + 180.0) / 6.0) + 1 + 32700 END AS INT)
           AS utm_epsg,
         CASE WHEN lat >= 16 AND lat < 24 THEN 'Q'
              WHEN lat >= 24 AND lat < 32 THEN 'R'
              WHEN lat >= 32 AND lat < 40 THEN 'S'
              WHEN lat >= 40 AND lat < 48 THEN 'T'
              WHEN lat >= 48 AND lat < 56 THEN 'U'
              WHEN lat >= 56 AND lat < 64 THEN 'V'
              ELSE 'X' END AS lat_band,
         (CASE WHEN CAST(FLOOR(lat / 3) * 3 AS INT) >= 0
               THEN printf('N%02d', CAST(FLOOR(lat / 3) * 3 AS INT))
               ELSE printf('S%02d', -CAST(FLOOR(lat / 3) * 3 AS INT)) END ||
          CASE WHEN CAST(FLOOR(lon / 3) * 3 AS INT) < 0
               THEN printf('W%03d', -CAST(FLOOR(lon / 3) * 3 AS INT))
               ELSE printf('E%03d', CAST(FLOOR(lon / 3) * 3 AS INT)) END)
           AS wc_tile,
         (printf('%02d', CAST(FLOOR((lon + 180.0) / 6.0) + 1 AS INT)) ||
          CASE WHEN lat >= 16 AND lat < 24 THEN 'Q'
               WHEN lat >= 24 AND lat < 32 THEN 'R'
               WHEN lat >= 32 AND lat < 40 THEN 'S'
               WHEN lat >= 40 AND lat < 48 THEN 'T'
               WHEN lat >= 48 AND lat < 56 THEN 'U'
               WHEN lat >= 56 AND lat < 64 THEN 'V'
               ELSE 'X' END) AS mgrs_id,
         (lon >= -180.0 AND lon <= 180.0 AND lat >= -90.0 AND lat <= 90.0)
           AS coord_ok
  FROM pts
"""


def q_veg_indices(spark, sf_dir):
    """§2.7 vegetation indices + forest component math + confidence, as
    column math over bands derived from event ids (guards included)."""
    from biomass_processing_pipeline_spark import functions as BF

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        (F.col("event_id") % 256).cast("double").alias("red"),
        (F.floor(F.col("event_id") / 256) % 256).cast("double").alias("green"),
        (F.floor(F.col("event_id") / 65536) % 256).cast("double").alias("nir"),
        (F.col("user_id") % 256).cast("double").alias("blue"),
    )
    out = d.select(
        "event_id",
        (F.round(BF.ndvi(F.col("nir"), F.col("red")), 6) + 0.0).alias("ndvi"),
        (F.round(BF.evi(F.col("nir"), F.col("red"), F.col("blue")), 6) + 0.0)
        .alias("evi"),
        (F.round(BF.savi(F.col("nir"), F.col("red")), 6) + 0.0).alias("savi"),
        (F.round(BF.ndwi(F.col("green"), F.col("nir")), 6) + 0.0).alias("ndwi"),
        F.round(
            BF.harvestable_biomass(F.col("red"), F.col("green"), F.col("nir")), 6
        ).alias("harvestable"),
        BF.ndvi_biomass_multiplier(
            BF.ndvi(F.col("nir"), F.col("red"))
        ).alias("biomass_mult"),
        BF.confidence_score(
            (F.col("event_id") % 4).cast("int"),
            (F.col("event_id") % 100).cast("double"),
            BF.ndvi(F.col("nir"), F.col("red")),
        ).alias("confidence"),
    )
    return out


SQL_VEG_INDICES = """
  WITH d AS (
    SELECT event_id,
           CAST(event_id % 256 AS DOUBLE) AS red,
           CAST((event_id // 256) % 256 AS DOUBLE) AS green,
           CAST((event_id // 65536) % 256 AS DOUBLE) AS nir,
           CAST(user_id % 256 AS DOUBLE) AS blue
    FROM events)
  SELECT event_id,
    CAST(ROUND(CASE WHEN nir + red <> 0 THEN (nir - red) / (nir + red)
                    ELSE 0.0 END, 6) AS DOUBLE) + 0.0 AS ndvi,
    CAST(ROUND(CASE WHEN nir + 6.0*red - 7.5*blue + 1.0 <> 0
                    THEN 2.5 * (nir - red) / (nir + 6.0*red - 7.5*blue + 1.0)
                    ELSE 0.0 END, 6) AS DOUBLE) + 0.0 AS evi,
    CAST(ROUND(CASE WHEN nir + red + 0.5 <> 0
                    THEN 1.5 * (nir - red) / (nir + red + 0.5)
                    ELSE 0.0 END, 6) AS DOUBLE) + 0.0 AS savi,
    CAST(ROUND(CASE WHEN green + nir <> 0 THEN (green - nir) / (green + nir)
                    ELSE 0.0 END, 6) AS DOUBLE) + 0.0 AS ndwi,
    CAST(ROUND(red + green + 0.8 * nir, 6) AS DOUBLE) AS harvestable,
    CAST(CASE WHEN n >= 0.7 THEN 1.3 WHEN n >= 0.5 THEN 1.0
              WHEN n >= 0.3 THEN 0.7 WHEN n >= 0.1 THEN 0.4
              ELSE 0.1 END AS DOUBLE) AS biomass_mult,
    CAST(ROUND((
      (CASE WHEN ns >= 3 THEN 1.0 WHEN ns = 2 THEN 0.8
            WHEN ns = 1 THEN 0.5 ELSE 0.1 END)
      + (CASE WHEN cov >= 95.0 THEN 1.0 WHEN cov >= 80.0 THEN 0.8
              WHEN cov >= 50.0 THEN 0.6 ELSE 0.3 END)
      + (CASE WHEN n >= 0.6 THEN 1.0 WHEN n >= 0.3 THEN 0.7
              ELSE 0.4 END)) / 3.0, 3) AS DOUBLE) AS confidence
  FROM (SELECT *,
               CASE WHEN nir + red <> 0 THEN (nir - red) / (nir + red)
                    ELSE 0.0 END AS n,
               CAST(event_id % 4 AS INT) AS ns,
               CAST(event_id % 100 AS DOUBLE) AS cov
        FROM d)
"""


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5-groupBy keep-min-id (hash-partition dedup)."""
    from biomass_processing_pipeline_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "keep_id", "n_copies"
    )


SQL_DEDUP_EXACT = """
  SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
  FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
  UNION ALL
  SELECT doc_id AS keep_id, 1 AS n_copies
  FROM documents WHERE text IS NULL
"""


def q_doc_quality(spark, sf_dir):
    """Text-quality scoring: length/punct/stopword ratios + token count."""
    from biomass_processing_pipeline_spark.operators.text import quality_cols

    docs = _t(spark, sf_dir, "documents")
    return quality_cols(docs.select("doc_id", "text")).select(
        "doc_id", "n_tokens", "alpha_ratio", "digit_ratio", "punct_ratio",
        "stopword_ratio", "avg_token_len", "quality_score",
    )


SQL_DOC_QUALITY = r"""
  WITH b AS (
    SELECT doc_id,
           LENGTH(text) AS n,
           LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
           LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
           LENGTH(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS punct,
           LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tokens,
           LEN(regexp_extract_all(LOWER(text),
               '\b(the|and|of|to|in|is|that|with)\b')) AS stop_hits
    FROM documents),
  r AS (
    SELECT doc_id, tokens AS n_tokens,
           CAST(ROUND(alpha * 1.0 / GREATEST(n, 1), 6) AS DOUBLE) AS alpha_ratio,
           CAST(ROUND(digits * 1.0 / GREATEST(n, 1), 6) AS DOUBLE) AS digit_ratio,
           CAST(ROUND(punct * 1.0 / GREATEST(n, 1), 6) AS DOUBLE) AS punct_ratio,
           CAST(ROUND(stop_hits * 1.0 / GREATEST(tokens, 1), 6) AS DOUBLE)
             AS stopword_ratio,
           CAST(ROUND(alpha * 1.0 / GREATEST(tokens, 1), 6) AS DOUBLE)
             AS avg_token_len
    FROM b)
  SELECT doc_id, n_tokens, alpha_ratio, digit_ratio, punct_ratio,
         stopword_ratio, avg_token_len,
         CAST(ROUND(
           (CASE WHEN alpha_ratio > 0.6 THEN 0.4
                 ELSE alpha_ratio * 0.4 / 0.6 END)
           + (CASE WHEN stopword_ratio > 0.05 THEN 0.3
                   ELSE stopword_ratio * 6.0 END)
           + (CASE WHEN avg_token_len >= 3 AND avg_token_len <= 9 THEN 0.3
                   ELSE 0.1 END), 6) AS DOUBLE) AS quality_score
  FROM r
"""


def q_langid(spark, sf_dir):
    """Stopword-vote language ID heuristic."""
    from biomass_processing_pipeline_spark.operators.text import langid_df

    docs = _t(spark, sf_dir, "documents")
    return langid_df(docs).select("doc_id", "lang_guess")


# langid twin CTEs, shared by SQL_LANGID and the mix_sample twin (ONE
# copy to keep: a stopword/tie-rule change edits exactly one string).
# The leading IS NULL arm mirrors langid_df's no-otherwise when-chain:
# NULL text -> NULL hits -> every WHEN condition NULL -> NULL lang (the
# pinned unknown-content rule), where a bare ELSE would misfile it 'es'.
_SQL_LANG_CTE = r"""
  h AS (
    SELECT doc_id,
      LEN(regexp_extract_all(LOWER(text),
          '\b(the|and|of|to|in|is|that|with)\b')) AS hits_en,
      LEN(regexp_extract_all(LOWER(text),
          '\b(der|die|und|das|ist|nicht|mit|ein)\b')) AS hits_de,
      LEN(regexp_extract_all(LOWER(text),
          '\b(le|la|et|les|des|est|dans|une)\b')) AS hits_fr,
      LEN(regexp_extract_all(LOWER(text),
          '\b(el|la|de|que|los|es|una|por)\b')) AS hits_es
    FROM documents),
  lang AS (
    SELECT doc_id,
           CASE WHEN hits_en IS NULL THEN NULL
                WHEN GREATEST(hits_en, hits_de, hits_fr, hits_es) = 0
                  THEN 'unknown'
                WHEN hits_en = GREATEST(hits_en, hits_de, hits_fr, hits_es)
                  THEN 'en'
                WHEN hits_de = GREATEST(hits_en, hits_de, hits_fr, hits_es)
                  THEN 'de'
                WHEN hits_fr = GREATEST(hits_en, hits_de, hits_fr, hits_es)
                  THEN 'fr'
                ELSE 'es' END AS lang_guess
    FROM h)
"""

SQL_LANGID = f"""
  WITH {_SQL_LANG_CTE}
  SELECT doc_id, lang_guess FROM lang
"""


def q_jaccard_topk(spark, sf_dir):
    """Exact n-gram Jaccard top-3 per query doc (inverted shingle index)."""
    from biomass_processing_pipeline_spark.operators.dedup import jaccard_topk

    docs = _t(spark, sf_dir, "documents")
    return jaccard_topk(docs, "text", "doc_id", k=3, query_mod=25)


SQL_JACCARD_TOPK = """
  WITH s AS (
    SELECT DISTINCT doc_id, substr(LOWER(text), CAST(i AS INT), 5) AS sh
    FROM documents, generate_series(1, 100000) g(i)
    WHERE i <= GREATEST(LENGTH(text) - 4, 1)),
  sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
  q AS (SELECT * FROM s WHERE doc_id % 25 = 0),
  inter AS (
    SELECT q.doc_id AS query_id, s.doc_id AS target_id, COUNT(*) AS ni
    FROM q JOIN s ON q.sh = s.sh AND q.doc_id <> s.doc_id
    GROUP BY 1, 2),
  scored AS (
    SELECT query_id, target_id,
           CAST(ROUND(ni * 1.0 / (a.n + b.n - ni), 6) AS DOUBLE) AS jaccard
    FROM inter JOIN sz a ON a.doc_id = query_id
               JOIN sz b ON b.doc_id = target_id)
  SELECT query_id, target_id, jaccard, CAST(rnk AS INT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY jaccard DESC, target_id) AS rnk
    FROM scored) WHERE rnk <= 3
"""


# Exact twin of dedup.simhash_pairs: FNV-1a per token (uint64 wrap, low-61
# masked) -> per-bit majority votes -> 61-bit signature; the 4x16-bit block
# banding is COMPLETE for hamming <= 3 (pigeonhole), so exact all-pairs
# hamming is the same output.
# Twins of the image-fixture queries against the fixture's brute-force
# goldens (synth.py computes county assignment and zonal partials in plain
# numpy at fixture-build time — an independent implementation of what the
# engine's broadcast-cover PIP join and Arrow decode pipeline compute).
# all_phash_ok asserts the constant 1: any decode corruption flips the
# Spark side to 0 and the value hash catches it. The fixture tier is
# TEMPLATED from sf_dir (see oracles_for) so check_oracles at any tier
# compares against that tier's fixtures, not a hard-coded sf0.01.
def _sql_image_pip(fdir: str) -> str:
    return f"""
  SELECT fips, COUNT(*) AS n_images
  FROM read_parquet(
    '{fdir}/golden_image_county.parquet')
  GROUP BY fips
"""


def _sql_image_zonal(fdir: str) -> str:
    return f"""
  WITH g AS (
    SELECT * FROM read_parquet(
      '{fdir}/golden_zonal_image.parquet/*.parquet')),
  c AS (
    SELECT * FROM read_parquet(
      '{fdir}/golden_image_county.parquet'))
  SELECT c.fips, COUNT(*) AS n_images,
         CAST(SUM(g.px_count) AS BIGINT) AS n_pixels,
         CAST(ROUND(SUM(g.sum_r) / SUM(g.px_count), 4) AS DOUBLE) AS mean_r,
         CAST(ROUND(SUM(g.ndvi_sum) / SUM(g.ndvi_count), 6) AS DOUBLE)
           AS ndvi_mean,
         CAST(1 AS INT) AS all_phash_ok
  FROM g JOIN c USING (image_id)
  GROUP BY c.fips
"""


# Twin of q_tile_discovery over the image fixture. The driver compares at
# sf0.01 and runs the Spark query (which materializes the deterministic
# fixture cache) before its oracle, so the parquet path exists; only the
# image_id column is read (DuckDB projection pushdown skips the blobs).
def _sql_tile_discovery(fdir: str) -> str:
    return rf"""
  SELECT regexp_extract(image_id, '^(T\d\d)_', 1) AS tile_code,
         MIN(regexp_extract(image_id, '_(\d{{8}})_', 1)) AS first_date,
         COUNT(DISTINCT regexp_extract(image_id, '_(B\d\d)_', 1)) AS n_bands,
         COUNT(*) AS n_images
  FROM read_parquet('{fdir}/images.parquet/*.parquet')
  GROUP BY 1
"""


def _sql_minhash(threshold: float = 0.3) -> str:
    ctes, final = _sql_minhash_parts(threshold)
    return f"WITH {ctes}\n{final}"


def _sql_minhash_parts(threshold: float = 0.3) -> tuple[str, str]:
    """Exact twin of dedup.minhash_lsh_pairs, built programmatically (it
    embeds the 64 (a, b) permutation constants): 5-byte shingle FNV ->
    64 minhashes with numpy's uint64 product/sum wraps -> FNV band fold
    (bands=16, rows=4) -> band equi-join candidates -> exact-Jaccard
    refine. Relational/unrolled (no SQL lambdas) so it runs in seconds."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        minhash_coeffs,
    )

    a, b = minhash_coeffs(64)
    A = ",".join(map(str, a))
    B = ",".join(map(str, b))
    wrap = "% 18446744073709551616::HUGEINT"

    def fnv(terms: list[str]) -> str:
        e = "1469598103934665603::HUGEINT"
        for t in terms:
            e = f"(xor({e}, {t}) * 1099511628211::HUGEINT) {wrap}"
        return e

    shexpr = fnv([f"unicode(t[i + {j}])::HUGEINT" for j in range(5)])
    bandexpr = fnv([f"sigs[CAST(band_idx*4 + {r} AS INT) + 1]::HUGEINT"
                    for r in range(4)])
    ctes = f"""docs AS (SELECT doc_id, lower(text) AS t FROM documents),
win AS (
  SELECT doc_id, CAST({shexpr} % 2305843009213693952 AS BIGINT) AS sh
  FROM docs, LATERAL (SELECT unnest(range(1, length(t) - 3)) AS i) w),
sh AS (SELECT DISTINCT doc_id, sh FROM win),
perms AS (SELECT unnest(range(0, 64)) AS p,
                 unnest([{A}]) AS pa, unnest([{B}]) AS pb),
sigrows AS (
  SELECT s.doc_id, p.p,
    MIN(CAST(((p.pa::HUGEINT * s.sh::HUGEINT {wrap}
          + p.pb::HUGEINT) {wrap})
         % 2305843009213693951 AS BIGINT)) AS sig
  FROM sh s CROSS JOIN perms p GROUP BY 1, 2),
sig AS (SELECT doc_id, list(sig ORDER BY p) AS sigs FROM sigrows
        GROUP BY doc_id),
banded AS (
  SELECT doc_id, band_idx,
    CAST({bandexpr} % 2305843009213693952 AS BIGINT) AS band_hash
  FROM sig, LATERAL (SELECT unnest(range(0, 16)) AS band_idx) tb),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
   AND l.doc_id < r.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS ni
  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY 1, 2)"""
    final = f"""SELECT i.id_a, i.id_b,
       CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) >= {threshold}"""
    return ctes, final


SQL_SIMHASH = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
  FROM documents),
th AS (
  SELECT doc_id,
    CAST(list_reduce(
      list_prepend(1469598103934665603::HUGEINT,
        [unicode(w[i])::HUGEINT for i in range(1, length(w)+1)]),
      (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
                % 18446744073709551616::HUGEINT
    ) % 2305843009213693952 AS BIGINT) AS h
  FROM tok),
bits AS (
  SELECT doc_id, b, SUM((h >> CAST(b AS INT)) & 1) AS s, COUNT(*) AS n
  FROM th, range(61) t(b) GROUP BY 1, 2),
sigs0 AS (
  SELECT doc_id,
    SUM(CASE WHEN 2*s > n THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS sig
  FROM bits GROUP BY doc_id),
sigs AS (
  SELECT d.doc_id, COALESCE(s.sig, 0) AS sig
  FROM documents d LEFT JOIN sigs0 s USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# Exact twin of text.fingerprint_udf (window=8, n_min=8): Rabin–Karp window
# hashes with the SAME uint64 product wrap the numpy path has
# ((byte * 257^(7-j)) mod 2^64) mod (2^61-1), then the 8 smallest distinct.
# HUGEINT arithmetic + correlated list comprehensions make it closed-form.
# Contract edges encoded even though the fixture has neither: a doc
# SHORTER than the window keeps the engine's whole-string sequential
# hash (list_reduce fold, same per-step 2^64 wrap then mod — verified
# value-identical incl. the empty string's [0]); NULL text has a NULL
# fingerprint (unknown content sketches nothing — length(NULL) nulls the
# comprehension and unnest(NULL) emits zero rows, matching explode).
SQL_DOC_FINGERPRINT = """
  SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp_hash FROM (
    SELECT doc_id,
      CASE WHEN length(text) < 8 THEN
        [CAST(list_reduce(
          list_prepend(0::HUGEINT,
            [unicode(text[i])::HUGEINT for i in range(1, length(text) + 1)]),
          (h, x) -> ((h * 257 + x) % 18446744073709551616::HUGEINT)
                    % 2305843009213693951
        ) AS BIGINT)]
      ELSE
        list_sort(list_distinct([
          CAST(list_sum([
            (unicode(text[i + j])::HUGEINT
             * ([74051159531521793, 288136807515649, 1121154893057,
                 4362470401, 16974593, 66049, 257, 1])[j + 1])
            % 18446744073709551616::HUGEINT
            for j in range(0, 8)
          ]) % 2305843009213693951 AS BIGINT)
          for i in range(1, length(text) - 6)
        ]))[1:8]
      END AS fps
    FROM documents)
"""


def q_utm_transform(spark, sf_dir):
    """§2.7 WGS84->UTM forward transform (Snyder series, native column
    math) + inverse round-trip: rt_lon/rt_lat must recover the inputs
    (reference coordinate_utils_v3.py:54-169 pyproj parity)."""
    from biomass_processing_pipeline_spark import functions as BF

    pts = _points(spark, sf_dir)
    e, n = BF.utm_forward(F.col("lon"), F.col("lat"))
    out = pts.select(
        "event_id", "lon", "lat",
        BF.utm_zone(F.col("lon")).alias("zone"),
        e.alias("easting"), n.alias("northing"),
    )
    rt_lon, rt_lat = BF.utm_inverse(
        F.col("easting"), F.col("northing"), F.col("zone"),
        F.lit(True),
    )
    return out.select(
        "event_id",
        F.col("zone"),
        F.round("easting", 3).alias("easting"),
        F.round("northing", 3).alias("northing"),
        F.round(rt_lon, 6).alias("rt_lon"),
        F.round(rt_lat, 6).alias("rt_lat"),
    )


def _sql_utm_fwd_cte() -> str:
    """Shared forward-series CTE text (identical constants at full repr
    precision): defines ``utm(event_id, zone, lon, lat, easting,
    northing)`` over the derived points."""
    from biomass_processing_pipeline_spark import functions as BF

    c = {k: repr(getattr(BF, k)) for k in
         ("_A", "_E2", "_EP2", "_K0", "_M0", "_M2", "_M4", "_M6")}
    return f"""
  pts AS ({_POINTS_SQL}),
  t AS (
    SELECT event_id, lon, lat,
           CAST(FLOOR((lon + 180.0) / 6.0) + 1 AS INT) AS zone,
           radians(lat) AS phi,
           radians(lon) - radians((FLOOR((lon + 180.0) / 6.0) + 1 - 1.0)
                                  * 6.0 - 180.0 + 3.0) AS dlam
    FROM pts),
  s AS (
    SELECT event_id, zone, phi, lat, lon,
           {c['_A']} / sqrt(1.0 - {c['_E2']} * sin(phi) * sin(phi)) AS n,
           tan(phi) * tan(phi) AS bt,
           {c['_EP2']} * cos(phi) * cos(phi) AS bc,
           cos(phi) * dlam AS a_,
           {c['_A']} * ({c['_M0']} * phi - {c['_M2']} * sin(2.0 * phi)
             + {c['_M4']} * sin(4.0 * phi)
             - {c['_M6']} * sin(6.0 * phi)) AS m
    FROM t),
  utm AS (
    SELECT event_id, zone, lon, lat,
      {c['_K0']} * n * (a_ + (1.0 - bt + bc) * a_*a_*a_ / 6.0
        + (5.0 - 18.0*bt + bt*bt + 72.0*bc - 58.0*{c['_EP2']})
          * a_*a_*a_*a_*a_ / 120.0) + 500000.0 AS easting,
      {c['_K0']} * (m + n * tan(phi) * (a_*a_ / 2.0
        + (5.0 - bt + 9.0*bc + 4.0*bc*bc) * a_*a_*a_*a_ / 24.0
        + (61.0 - 58.0*bt + bt*bt + 600.0*bc - 330.0*{c['_EP2']})
          * a_*a_*a_*a_*a_*a_ / 720.0)) AS northing
    FROM s)"""


def _sql_utm() -> str:
    """Forward-series twin; the round-trip columns must equal the original
    lon/lat (inverse-series error << 1e-6 deg)."""
    return f"""
  WITH {_sql_utm_fwd_cte()}
  SELECT event_id, zone,
    CAST(ROUND(easting, 3) AS DOUBLE) AS easting,
    CAST(ROUND(northing, 3) AS DOUBLE) AS northing,
    CAST(ROUND(lon + 0.0, 6) AS DOUBLE) AS rt_lon,
    CAST(ROUND(lat + 0.0, 6) AS DOUBLE) AS rt_lat
  FROM utm
"""


def q_mgrs_squares(spark, sf_dir):
    """§2.7 MGRS 100 km grid squares: standard two-letter square id from
    the native UTM forward transform, plus the reference's square->UTM
    bounds lookup (coordinate_utils_v3.py:391-472 parity)."""
    from biomass_processing_pipeline_spark import functions as BF

    pts = _points(spark, sf_dir)
    lon, lat = F.col("lon"), F.col("lat")
    base = pts.select(
        "event_id",
        BF.utm_zone(lon).alias("zone"),
        BF.lat_band(lat).alias("band"),
        BF.mgrs_grid_square(lon, lat).alias("square"),
    )
    b = BF.mgrs_square_utm_bounds(
        F.col("zone"), F.col("square"), F.col("band")
    )
    return base.select(
        "event_id", "zone", "band", "square",
        b["min_easting"].alias("min_easting"),
        b["min_northing"].alias("min_northing"),
        b["max_easting"].alias("max_easting"),
        b["max_northing"].alias("max_northing"),
    )


def _sql_mgrs() -> str:
    """Twin: square letters from the shared UTM forward CTE; bounds from
    the reference's lookup tables."""
    from biomass_processing_pipeline_spark import functions as BF

    cols = BF.MGRS_COL_LETTERS
    rows = BF.MGRS_ROW_LETTERS
    zmap = " ".join(
        f"WHEN {z} THEN {e}"
        for z, e in sorted(BF._MGRS_ZONE_EASTING_ORIGIN.items())
    )
    bmap = " ".join(
        f"WHEN '{b}' THEN {n}"
        for b, n in sorted(BF._MGRS_BAND_NORTHING_ORIGIN.items())
    )
    band_sql = """CASE WHEN lat >= 16 AND lat < 24 THEN 'Q'
         WHEN lat >= 24 AND lat < 32 THEN 'R'
         WHEN lat >= 32 AND lat < 40 THEN 'S'
         WHEN lat >= 40 AND lat < 48 THEN 'T'
         WHEN lat >= 48 AND lat < 56 THEN 'U'
         WHEN lat >= 56 AND lat < 64 THEN 'V'
         ELSE 'X' END"""
    return f"""
  WITH {_sql_utm_fwd_cte()},
  sq AS (
    SELECT event_id, zone, lat,
      substring('{cols}',
        CAST((zone - 1) % 3 * 8 + FLOOR(easting / 100000.0) - 1 AS INT) + 1,
        1)
      || substring('{rows}',
        CAST((CAST(FLOOR(northing / 100000.0) AS BIGINT)
              + CASE WHEN zone % 2 = 0 THEN 5 ELSE 0 END) % 20 AS INT) + 1,
        1) AS square
    FROM utm)
  SELECT event_id, zone, {band_sql} AS band, square,
    (CASE zone {zmap} ELSE 100000 END
     + (strpos('{cols}', substring(square, 1, 1)) - 1) * 100000)::BIGINT
      AS min_easting,
    (CASE {band_sql} {bmap} ELSE 4200000 END
     + (strpos('{rows}', substring(square, 2, 1)) - 1) * 100000)::BIGINT
      AS min_northing,
    (CASE zone {zmap} ELSE 100000 END
     + (strpos('{cols}', substring(square, 1, 1)) - 1) * 100000
     + 100000)::BIGINT AS max_easting,
    (CASE {band_sql} {bmap} ELSE 4200000 END
     + (strpos('{rows}', substring(square, 2, 1)) - 1) * 100000
     + 100000)::BIGINT AS max_northing
  FROM sq
"""


def q_forest_threshold(spark, sf_dir):
    """F5 forest-coverage gate with the reference's exact constants
    (forest_analyzer_v3.py:74-77: skip < 0.1 acres OR < 5 pct)."""
    from biomass_processing_pipeline_spark.operators.forest import (
        forest_threshold_filter,
    )

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") / 1000.0).alias("forest_acres"),
        F.col("p_size").cast("double").alias("forest_pct"),
    )
    return forest_threshold_filter(p).select(
        "p_partkey",
        F.round("forest_acres", 6).alias("forest_acres"),
        "forest_pct",
    )


SQL_FOREST_THRESHOLD = """
  SELECT p_partkey,
         CAST(ROUND(p_retailprice / 1000.0, 6) AS DOUBLE) AS forest_acres,
         CAST(p_size AS DOUBLE) AS forest_pct
  FROM part
  WHERE p_retailprice / 1000.0 >= 0.1 AND p_size >= 5.0
"""


def q_json_roundtrip(spark, sf_dir):
    """§2.7 JSON functions: to_json(struct) -> from_json back to columns,
    plus get_json_object path extraction over a natively-built JSON doc
    (reference detail blobs: database_manager_v3.py:700-702,783-785)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    built = o.select(
        "o_orderkey",
        F.format_string(
            '{"key": %s, "meta": {"status": "%s", "prio": "%s"}}',
            "o_orderkey", "o_orderstatus", "o_orderpriority",
        ).alias("js"),
        F.to_json(
            F.struct(F.col("o_totalprice"), F.col("o_orderstatus"))
        ).alias("blob"),
    )
    parsed = built.select(
        "o_orderkey",
        F.get_json_object("js", "$.meta.status").alias("path_status"),
        F.from_json(
            "blob", "o_totalprice double, o_orderstatus string"
        ).alias("rt"),
    )
    return parsed.select(
        "o_orderkey", "path_status",
        F.col("rt.o_totalprice").alias("rt_price"),
        F.col("rt.o_orderstatus").alias("rt_status"),
    )


# DuckDB builds + path-extracts the same JSON doc; the round-trip columns
# must equal the originals
SQL_JSON_ROUNDTRIP = """
  SELECT o_orderkey,
         json_extract_string(
           format('{{"key": {}, "meta": {{"status": "{}", "prio": "{}"}}}}',
                  o_orderkey, o_orderstatus, o_orderpriority),
           '$.meta.status') AS path_status,
         o_totalprice AS rt_price,
         o_orderstatus AS rt_status
  FROM orders WHERE o_orderkey <= 2000
"""


def q_cosine_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH-blocked scale path is recall-tested in test_similarity). The 0.4
    threshold sits in this corpus's top-0.1% similarity tail."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs(emb, threshold=0.4)


SQL_COSINE_DUPS = """
  WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
  norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM u GROUP BY vec_id),
  dots AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.x * b.x) AS dot
    FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
    GROUP BY 1, 2)
  SELECT ia AS id_a, ib AS id_b,
         CAST(ROUND(dot / sqrt(na.n2 * nb.n2), 6) AS DOUBLE) AS cosine
  FROM dots JOIN norms na ON na.vec_id = ia JOIN norms nb ON nb.vec_id = ib
  WHERE ROUND(dot / sqrt(na.n2 * nb.n2), 6) >= 0.4
"""


def q_geometry_ops(spark, sf_dir):
    """§2.7 geometry scalars (fix/simplify/buffer/centroid + WKT parse):
    build a pentagon WKT natively per part row (duplicate vertex +
    collinear vertex + jittered top-edge bump), run the numpy geometry
    kernel in one Arrow UDF, emit closed-form-checkable outputs."""
    from biomass_processing_pipeline_spark.operators.geom_ops import (
        geometry_ops_df,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return geometry_ops_df(
        part,
        key=F.col("p_partkey"),
        w=(1 + F.col("p_partkey") % 5).cast("double"),
        h=(1 + F.col("p_partkey") % 3).cast("double"),
        jitter=F.when(F.col("p_partkey") % 2 == 0, 0.0001).otherwise(0.01),
        tol=F.lit(0.0005),
        dist=0.1 + (F.col("p_partkey") % 4) * 0.05,
    )


# closed-form twin of operators/geom_ops.py: make_valid leaves 5 vertices,
# DP drops the bump iff jitter < tol, the rect buffer area is
# A + P*d + 16 d^2 sin(pi/16) (quad_segs=8 arc fans), centroid = center
SQL_GEOMETRY_OPS = """
  WITH base AS (
    SELECT p_partkey AS key,
           CAST(1 + p_partkey % 5 AS DOUBLE) AS w,
           CAST(1 + p_partkey % 3 AS DOUBLE) AS h,
           CASE WHEN p_partkey % 2 = 0 THEN 0.0001 ELSE 0.01 END AS jitter,
           0.1 + (p_partkey % 4) * 0.05 AS d
    FROM part WHERE p_partkey <= 500)
  SELECT key,
    CAST(5 AS INT) AS nv_valid,
    CAST(CASE WHEN jitter < 0.0005 THEN 4 ELSE 5 END AS INT) AS nv_simpl,
    CAST(ROUND(w * h + CASE WHEN jitter < 0.0005 THEN 0
                            ELSE w * jitter / 2 END, 6) AS DOUBLE) AS area_simpl,
    CAST(ROUND(w * h + 2 * (w + h) * d
               + 16 * d * d * sin(pi() / 16), 6) AS DOUBLE) AS buf_area,
    CAST(ROUND(w / 2, 6) AS DOUBLE) AS cx,
    CAST(ROUND(h / 2, 6) AS DOUBLE) AS cy
  FROM base
"""


def q_sim_bruteforce(spark, sf_dir):
    """Exact cosine top-5 neighbors (native array math, no Python)."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") % 25 == 0), k=5)


SQL_SIM_BRUTEFORCE = """
  WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
  norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM u GROUP BY vec_id),
  q AS (SELECT * FROM u WHERE vec_id % 25 = 0),
  dots AS (SELECT q.vec_id AS query_id, u.vec_id AS target_id,
                  SUM(q.x * u.x) AS dot
           FROM q JOIN u ON q.i = u.i AND q.vec_id <> u.vec_id
           GROUP BY 1, 2),
  scored AS (SELECT query_id, target_id,
                    CAST(ROUND(dot / SQRT(nq.n2 * nt.n2), 6) AS DOUBLE) AS cosine
             FROM dots JOIN norms nq ON nq.vec_id = query_id
                       JOIN norms nt ON nt.vec_id = target_id)
  SELECT query_id, target_id, cosine, CAST(rnk AS INT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, target_id) AS rnk
    -- zero-norm vectors score NULL/NaN and never hold a top-k slot (the
    -- engine applies the same exclusion in brute force AND the ANN refine)
    FROM scored WHERE cosine IS NOT NULL AND NOT isnan(cosine)
    ) WHERE rnk <= 5
"""


def q_validation_flags(spark, sf_dir):
    """Reference plausibility validators (validate_forest_analysis /
    validate_vegetation_indices / validate_crop_analysis /
    validate_landcover_analysis) as native column expressions: derived
    exact-decimal metrics trip every branch; warning/error strings are
    joined with '|' so the hash compares exact message text."""
    from biomass_processing_pipeline_spark.operators.validation import (
        crop_coverage_validation, forest_validation, landcover_validation,
        vegetation_validation,
    )

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    k = F.col("o_orderkey")
    biomass_tpa = (k % 2300) / 10.0
    confidence = (k % 100) / 100.0
    area = (k % 30) / 100.0
    ndvi = ((k % 241) - 120) / 100.0
    px = (k % 25).cast("long")
    coverage = (k % 1200) / 10.0
    n_low = (k % 3).cast("long")
    completeness = (k % 100) / 100.0
    total_pct = (90 + (k % 21)).cast("double")
    fv = forest_validation(biomass_tpa, confidence, area)
    vv = vegetation_validation(ndvi, px)
    cv = crop_coverage_validation(coverage, n_low)
    lv = landcover_validation(completeness, total_pct)
    return o.select(
        k.alias("o_orderkey"),
        F.concat_ws("|", fv["warnings"]).alias("f_warn"),
        vv["valid"].cast("int").alias("v_valid"),
        F.concat_ws("|", vv["errors"]).alias("v_err"),
        F.concat_ws("|", vv["warnings"]).alias("v_warn"),
        F.concat_ws("|", cv["warnings"]).alias("c_warn"),
        F.concat_ws("|", lv["warnings"]).alias("l_warn"),
    )


SQL_VALIDATION = """
  WITH m AS (
    SELECT o_orderkey,
           (o_orderkey % 2300) / 10.0 AS tpa,
           (o_orderkey % 100) / 100.0 AS conf,
           (o_orderkey % 30) / 100.0 AS area,
           ((o_orderkey % 241) - 120) / 100.0 AS ndvi,
           o_orderkey % 25 AS px,
           (o_orderkey % 1200) / 10.0 AS cov,
           o_orderkey % 3 AS nlow,
           (o_orderkey % 100) / 100.0 AS compl,
           CAST(90 + (o_orderkey % 21) AS DOUBLE) AS tot
    FROM orders WHERE o_orderkey <= 2000)
  SELECT o_orderkey,
    concat_ws('|',
      CASE WHEN tpa < 10 THEN printf('Low biomass density: %.1f tons/acre', tpa) END,
      CASE WHEN tpa > 200 THEN printf('High biomass density: %.1f tons/acre', tpa) END,
      CASE WHEN conf < 0.5 THEN printf('Low confidence score: %.2f', conf) END,
      CASE WHEN area < 0.1 THEN printf('Very small forest area: %.3f acres', area) END
    ) AS f_warn,
    CAST(CASE WHEN ndvi BETWEEN -1.0 AND 1.0 THEN 1 ELSE 0 END AS INT) AS v_valid,
    concat_ws('|',
      CASE WHEN NOT (ndvi BETWEEN -1.0 AND 1.0)
           THEN printf('NDVI %.3f outside valid range', ndvi) END
    ) AS v_err,
    concat_ws('|',
      CASE WHEN ndvi BETWEEN -1.0 AND 1.0 AND ndvi < -0.5
           THEN printf('Very low NDVI %.3f - may indicate water or bare soil', ndvi) END,
      CASE WHEN px < 10 THEN printf('Low pixel count %d - may affect accuracy', px) END
    ) AS v_warn,
    concat_ws('|',
      CASE WHEN cov > 105 THEN printf('Total crop coverage %.1f%% exceeds 100%%', cov) END,
      CASE WHEN nlow > 0 THEN printf('%d crops with low confidence scores', nlow) END
    ) AS c_warn,
    concat_ws('|',
      CASE WHEN compl < 0.8 THEN printf('Low data completeness: %.2f%%', compl * 100) END,
      CASE WHEN abs(tot - 100) > 5 THEN printf('Land cover percentages sum to %.1f%% (expected ~100%%)', tot) END
    ) AS l_warn
  FROM m
"""


# ---------------------------------------------------------------------------
# fixture-backed queries (binary decode, LSH/IVF internals, ray-cast
# refine): the non-SQL-expressible half is either golden-verified
# (independent brute force computed at fixture build) or frozen to parquet
# (ANN candidate sets), and the relational half is DuckDB-oracled on top
# ---------------------------------------------------------------------------

def _fixture(spark, sf_dir):
    from biomass_processing_pipeline_spark import synth

    return synth.ensure_fixtures(spark, synth.tier_for_sf_dir(sf_dir))


def q_image_pip_county(spark, sf_dir):
    """J7 ray-cast PIP over the image fixture (golden-tested in pytest)."""
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.pip import (
        assign_points_to_polygons,
    )
    from biomass_processing_pipeline_spark.sources.images import (
        load_images, with_footprint,
    )

    d = _fixture(spark, sf_dir)
    fp = with_footprint(load_images(spark, d).select("image_id"))
    counties = pd.read_parquet(f"{d}/counties.parquet")
    assigned = assign_points_to_polygons(spark, fp, counties, "fips")
    return assigned.groupBy("fips").agg(F.count("*").alias("n_images"))


def q_image_zonal_stats(spark, sf_dir):
    """J6/A2-A12 binary decode -> per-county band stats."""
    from biomass_processing_pipeline_spark.operators.zonal import (
        decode_partials, zonal_band_stats,
    )
    from biomass_processing_pipeline_spark.sources.images import load_images

    d = _fixture(spark, sf_dir)
    images = load_images(spark, d)
    zones = spark.read.parquet(f"{d}/golden_image_county.parquet")
    s = zonal_band_stats(decode_partials(images), zones)
    return s.select(
        "fips", "n_images", "n_pixels",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("ndvi_mean", 6).alias("ndvi_mean"),
        F.col("all_phash_ok").cast("int").alias("all_phash_ok"),
    )


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs with exact-Jaccard refine."""
    from biomass_processing_pipeline_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3 via block banding)."""
    from biomass_processing_pipeline_spark.operators.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", max_hamming=3)


def q_phash_dedup(spark, sf_dir):
    """IMAGE near-dup grouping on the stored 64-bit perceptual hash
    (input_hint's ``phash`` column), scoped per acquisition tile:
    collapse exact-phash duplicates, band the DISTINCT (tile, sig)
    vertices (4x16-bit pigeonhole, complete for Hamming<=3), connected
    components, map every image to its component's min-id representative.
    The image twin of ``simhash_pairs`` — the dedup a 10^12-image caption
    corpus runs before training. Tile scoping is the imagery-native
    semantics (repeat captures of one tile are dups; cross-tile lookalikes
    are not) AND what keeps the synth fixture non-degenerate: unscoped,
    its 628-phase sinusoid hashes chain the whole tier into one component
    at Hamming<=2 (measured at sf0.001/sf0.01)."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )
    from biomass_processing_pipeline_spark.sources.images import load_images

    d = _fixture(spark, sf_dir)
    images = load_images(spark, d).select(
        "image_id", "phash",
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
    )
    return phash_dedup_groups(
        images, "image_id", "phash", max_hamming=2, scope_col="tile_code"
    )


def _sql_phash_dedup(fdir: str) -> str:
    """Brute-force twin: all-pairs Hamming over DISTINCT (tile, phash)
    vertices + recursive-CTE min-reachable component, then min-image-id
    rep and summed group size mapped back per image."""
    return rf"""
WITH RECURSIVE imgs AS MATERIALIZED (
  SELECT image_id, regexp_extract(image_id, '^(T\d\d)_', 1) AS tile, phash
  FROM read_parquet('{fdir}/images.parquet/*.parquet')),
sigs AS MATERIALIZED (
  SELECT tile, phash, MIN(image_id) AS sig_rep, COUNT(*) AS n_exact,
         tile || '|' || CAST(phash AS VARCHAR) AS vid
  FROM imgs GROUP BY tile, phash),
pairs AS MATERIALIZED (
  SELECT a.vid AS pa, b.vid AS pb FROM sigs a JOIN sigs b
    ON a.tile = b.tile AND a.phash < b.phash
  WHERE bit_count(xor(a.phash, b.phash)) <= 2),
sym AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM pairs UNION SELECT pb, pa FROM pairs),
reach(id, r) AS (
  SELECT vid, vid FROM sigs
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.id = s.dst),
comp AS (SELECT id AS vid, MIN(r) AS comp_label FROM reach GROUP BY id),
grp AS (
  SELECT c.comp_label, MIN(s.sig_rep) AS rep_id,
         CAST(SUM(s.n_exact) AS BIGINT) AS group_size
  FROM comp c JOIN sigs s USING (vid) GROUP BY 1)
SELECT i.image_id, g.rep_id, g.group_size
FROM imgs i
JOIN sigs s ON s.tile = i.tile AND s.phash = i.phash
JOIN comp c ON c.vid = s.vid
JOIN grp g ON g.comp_label = c.comp_label
"""


def q_dedup_components(spark, sf_dir):
    """Near-dup CLUSTERING: connected components over the MinHash-LSH pair
    graph, canonical rep = min doc id per component (iterative min-label
    propagation — the driver-contract's 'iterative algorithm' class, yet
    still oracled via a DuckDB recursive CTE)."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        dedup_components, minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3)
    return dedup_components(pairs)


def _sql_dedup_components() -> str:
    """Recursive-CTE twin: min-reachable-id over the symmetrized pair
    graph produced by the exact minhash SQL twin."""
    ctes, final = _sql_minhash_parts()
    return f"""
WITH RECURSIVE {ctes},
pairs AS MATERIALIZED (
  {final}
),
sym AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.id = s.dst
)
SELECT id AS doc_id, MIN(r) AS rep_id FROM reach GROUP BY id
"""


def q_doc_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprints (shift-robust k-min signature),
    exploded to ``(doc_id, fp_hash)`` rows so the driver canonicalizer can
    sort/hash it (array columns are unhashable in pandas)."""
    from biomass_processing_pipeline_spark.operators.text import fingerprint_udf

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(fingerprint_udf()(F.col("text"))).alias("fp_hash"),
    )


def q_image_features(spark, sf_dir):
    """Multimodal plumbing: decode -> thumbnail -> grid features (Arrow
    batch pipeline over the binary column). Deterministic subset (seq % 8,
    capped) instead of limit() — and ORACLED against the fixture's
    independent left-fold feat_sum golden (synth.grid_feat_sum)."""
    from biomass_processing_pipeline_spark.operators.multimodal import (
        image_resize_features,
    )
    from biomass_processing_pipeline_spark.sources.images import load_images

    d = _fixture(spark, sf_dir)
    seq = F.regexp_extract("image_id", r"_(\d{8})$", 1).cast("int")
    subset = load_images(spark, d).where((seq % 8 == 0) & (seq < 4000))
    feats = image_resize_features(subset)
    return feats.select(
        "image_id",
        F.round(F.aggregate("features", F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 4).alias("feat_sum"),
    )


def _sql_image_features(fdir: str) -> str:
    return rf"""
  SELECT image_id, CAST(ROUND(feat_sum, 4) AS DOUBLE) AS feat_sum
  FROM read_parquet('{fdir}/golden_image_features.parquet/*.parquet')
  WHERE CAST(regexp_extract(image_id, '_(\d{{8}})$', 1) AS INT) % 8 = 0
    AND CAST(regexp_extract(image_id, '_(\d{{8}})$', 1) AS INT) < 4000
"""


def q_video_frames(spark, sf_dir):
    """Multimodal video plumbing: stacked raw-codec frames -> byte-sliced
    decode -> every-k frame sampling -> per-frame stats. Frames are
    CONSTANT-valued ((v*7 + fi*3) % 256), so mean_lum and the grid-feature
    sum are closed-form: feat_sum = 48 * float32(c/255) summed in double
    exactly — the oracle replicates the float32 cast."""
    import numpy as np
    import pandas as pd

    from biomass_processing_pipeline_spark import imaging
    from biomass_processing_pipeline_spark.operators.multimodal import (
        video_frame_sample,
    )

    rows = []
    for v in range(20):
        frames = []
        for fi in range(6):
            c = (v * 7 + fi * 3) % 256
            px = np.full((8, 8, 3), c, dtype=np.uint8)
            frames.append(imaging.encode_image(px, "raw"))
        rows.append((f"v{v:02d}", b"".join(frames), 6, 8, 8))
    videos = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes", "n_frames", "w", "h"])
    )
    out = video_frame_sample(videos, every_k=2)
    return out.select(
        "video_id", "frame_idx",
        F.round("mean_lum", 6).alias("mean_lum"),
        F.round(
            F.aggregate("features", F.lit(0.0),
                        lambda a, x: a + x.cast("double")), 6
        ).alias("feat_sum"),
    )


SQL_VIDEO_FRAMES = """
  SELECT format('v{:02d}', v) AS video_id,
         CAST(fi AS INT) AS frame_idx,
         CAST((v * 7 + fi * 3) % 256 AS DOUBLE) AS mean_lum,
         CAST(ROUND(48 * CAST(CAST((v * 7 + fi * 3) % 256 AS DOUBLE) / 255.0
                              AS FLOAT)::DOUBLE, 6) AS DOUBLE) AS feat_sum
  FROM range(0, 20) t(v), (VALUES (0), (2), (4)) f(fi)
"""


def q_audio_features(spark, sf_dir):
    """Multimodal audio plumbing with the injectable int8-PCM decoder
    (the real codec stays a documented stub — no audio libs in this
    container): alternating square waves make duration/rms/zero-cross
    closed-form, and a/128 is exact in float32 so rms is bit-exact."""
    import numpy as np
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.multimodal import (
        audio_features, fake_audio_decoder,
    )

    rows = []
    for k in range(16):
        n = 64 + 8 * k
        a = (k % 5 + 1) * 10
        wave = np.tile(np.array([a, -a], dtype=np.int8), n // 2)
        rows.append((f"a{k:02d}", wave.tobytes()))
    audio = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    out = audio_features(audio, decoder=fake_audio_decoder)
    return out.select(
        "audio_id", "duration_samples",
        F.round("rms", 6).alias("rms"), "zero_cross",
    )


SQL_AUDIO_FEATURES = """
  SELECT format('a{:02d}', k) AS audio_id,
         CAST(64 + 8 * k AS BIGINT) AS duration_samples,
         CAST(ROUND((k % 5 + 1) * 10 / 128.0, 6) AS DOUBLE) AS rms,
         CAST(64 + 8 * k - 1 AS BIGINT) AS zero_cross
  FROM range(0, 16) t(k)
"""


def q_tile_discovery(spark, sf_dir):
    """S6 source discovery: distinct name-tiles + first available date per
    tile parsed from image ids (blob_manager_v3.py:1053-1118 semantics:
    list blobs -> distinct tile ids -> min date per tile)."""
    from biomass_processing_pipeline_spark.sources.images import load_images

    d = _fixture(spark, sf_dir)
    ids = load_images(spark, d).select("image_id")
    parsed = ids.select(
        F.regexp_extract("image_id", r"^(T\d\d)_", 1).alias("tile_code"),
        F.regexp_extract("image_id", r"_(\d{8})_", 1).alias("date"),
        F.regexp_extract("image_id", r"_(B\d\d)_", 1).alias("band"),
    )
    return parsed.groupBy("tile_code").agg(
        F.min("date").alias("first_date"),
        F.countDistinct("band").alias("n_bands"),
        F.count("*").alias("n_images"),
    )


# bump whenever a candidate-generating algorithm changes (LSH planes,
# IVF training) — the freeze dir is content-versioned by this constant
# (v3: matmul distance expansion in the IVF assign/probe UDFs)
ANN_FREEZE_VERSION = 3


def _ann_freeze_dir(sf_dir: str) -> str:
    """Frozen ANN candidate sets live in a tier-scoped SIBLING of the
    fixture tree — never inside the _DONE-guarded dir that
    synth.ensure_fixtures rmtree's wholesale on a version bump (a fixture
    regeneration triggered by another query must not delete a candidate
    set an oracle is about to read)."""
    from biomass_processing_pipeline_spark import synth

    base = os.environ.get("BPP_FIXTURE_DIR", "/tmp/bpp_fixtures")
    tier = synth.tier_for_sf_dir(sf_dir)
    return os.path.join(base, f"{tier}_ann_v{ANN_FREEZE_VERSION}")


def _frozen_candidates(spark, build_cand, name: str, sf_dir: str) -> DataFrame:
    """Freeze an ANN candidate set to parquet and read it back, so the
    Spark refine and the DuckDB oracle consume the IDENTICAL pairs (the
    candidate generation is the non-SQL-expressible half — float
    dot-product sign bits / argmin lists; the exact-cosine refine + rank
    is then verified hash-exact).

    Write-once + race-safe: deterministic input ⇒ deterministic
    candidates, so a frozen set is served as-is; a miss builds into a
    pid-scoped temp dir and atomically renames it in — a concurrent run
    that loses the rename discards its (identical) copy. No reader can
    observe a half-written set."""
    import shutil

    final = os.path.join(_ann_freeze_dir(sf_dir), name)
    marker = os.path.join(final, "_FROZEN")
    if os.path.exists(marker):
        return spark.read.parquet(final)
    tmp = f"{final}.__tmp{os.getpid()}"
    build_cand().write.mode("overwrite").parquet(tmp)
    open(os.path.join(tmp, "_FROZEN"), "w").close()
    try:
        os.rename(tmp, final)
    except OSError:  # lost the race — an identical frozen set exists
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(final)


def q_sim_ivf(spark, sf_dir):
    """IVF ANN: distributed-Lloyd centroids, slim assign/probe tables,
    candidate pruning via the list equi-join. The (q_id, t_id) candidate
    set is frozen to a fixture parquet; the exact-cosine top-k refine is
    DuckDB-oracled over the same frozen set."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        cosine_refine_topk, ivf_candidates, train_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 25 == 0)
    # lazy build: a frozen-set cache hit skips Lloyd training entirely
    frozen = _frozen_candidates(
        spark,
        lambda: ivf_candidates(
            emb, q, train_centroids(emb, n_centroids=16), n_probe=4
        ),
        "ivf_candidates.parquet", sf_dir,
    )
    return cosine_refine_topk(frozen, emb, q, k=5)


def q_sim_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN: slim banded candidate join, frozen
    candidate set, DuckDB-oracled exact-cosine top-k refine (recall is
    additionally pytest-tested on planted clusters)."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        cosine_refine_topk, lsh_candidates,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 25 == 0)
    frozen = _frozen_candidates(
        spark, lambda: lsh_candidates(emb, q),
        "lsh_candidates.parquet", sf_dir,
    )
    return cosine_refine_topk(frozen, emb, q, k=5)


def _sql_ann_refine(cand_parquet: str) -> str:
    """Exact-cosine top-5 refine over a frozen (q_id, t_id) candidate
    parquet — shared twin for sim_lsh and sim_ivf (SQL_SIM_BRUTEFORCE's
    scoring with the candidate set swapped in)."""
    return f"""
  WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
  norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM u GROUP BY vec_id),
  cand AS (SELECT q_id, t_id
           FROM read_parquet('{cand_parquet}/*.parquet')),
  dots AS (SELECT c.q_id AS query_id, c.t_id AS target_id,
                  SUM(a.x * b.x) AS dot
           FROM cand c JOIN u a ON a.vec_id = c.q_id
                       JOIN u b ON b.vec_id = c.t_id AND b.i = a.i
           GROUP BY 1, 2),
  scored AS (SELECT query_id, target_id,
                    CAST(ROUND(dot / SQRT(nq.n2 * nt.n2), 6) AS DOUBLE) AS cosine
             FROM dots JOIN norms nq ON nq.vec_id = query_id
                       JOIN norms nt ON nt.vec_id = target_id)
  SELECT query_id, target_id, cosine, CAST(rnk AS INT) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, target_id) AS rnk
    -- zero-norm vectors score NULL/NaN and never hold a top-k slot (the
    -- engine applies the same exclusion in brute force AND the ANN refine)
    FROM scored WHERE cosine IS NOT NULL AND NOT isnan(cosine)
    ) WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_upsert_semantics(spark, sf_dir):
    """S7 upsert SEMANTICS (not just mechanics): seeded base table + a
    conflicting batch through the partition-pruned ``upsert_parquet``
    (bucketed keep-latest merge, only touched buckets rewritten); the
    DuckDB twin is the equivalent anti-join + union — the reference's
    ``INSERT ... ON CONFLICT DO UPDATE`` (database_manager_v3.py:727-732).
    The third batch carries INTRA-batch key conflicts plus a ``seq``
    column: the engine's explicit last-wins precedence (max seq per key,
    the reference's rows-applied-in-order rule) must match the twin's
    ROW_NUMBER pre-dedup. The table is written under a fixed per-run temp
    root that is wiped on entry and at interpreter exit, so repeated gate
    runs leave no accumulating residue."""
    import atexit
    import os as _os
    import shutil as _shutil
    import tempfile

    from biomass_processing_pipeline_spark.sources.sinks import (
        read_upsert_parquet, upsert_parquet,
    )

    orders = _t(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice"), 2).alias("v"),
        F.col("o_orderstatus").alias("status"),
    )
    batch = orders.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 2.0, 2).alias("v"),
        F.lit("U").alias("status"),
    )
    # intra-batch conflict: every %5 key arrives TWICE (seq 1 then seq 2);
    # last-wins must keep the seq-2 row
    conflicted = orders.where(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") + 1.0, 2).alias("v"),
        F.lit("X").alias("status"), F.lit(1).alias("seq"),
    ).unionByName(
        orders.where(F.col("o_orderkey") % 5 == 0).select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") + 2.0, 2).alias("v"),
            F.lit("Y").alias("status"), F.lit(2).alias("seq"),
        )
    )
    # pid-scoped: a FIXED path would let two concurrent gate runs (pytest
    # alongside check_oracles) rmtree each other's live table mid-upsert;
    # wipe-on-entry keeps reruns in one process idempotent, atexit keeps
    # /tmp residue-free either way.
    root = _os.path.join(
        tempfile.gettempdir(), f"bpp_upsert_q_{_os.getpid()}"
    )
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(root, exist_ok=True)
    atexit.register(_shutil.rmtree, root, ignore_errors=True)
    out = root + "/t"
    upsert_parquet(spark, base, out, ["k"], n_buckets=16)
    upsert_parquet(spark, batch, out, ["k"])
    upsert_parquet(spark, conflicted, out, ["k"], seq_col="seq")
    return read_upsert_parquet(spark, out)


def _rect_class_rows() -> list[tuple[int, int, float, float, float, float]]:
    """Deterministic class-polygon rectangles (id, code, x0, y0, x1, y1) —
    the single source of truth for BOTH the Spark-side dictionary and the
    DuckDB twin's VALUES literal. Codes cycle through the crop coefficients
    plus two URBAN codes so the F1 filter is exercised; sizes span 3-6
    level-10 cells per axis so every pair shares MANY cover cells and the
    anchor-cell dedup must pick exactly one. All coordinates are multiples
    of 1/32 deg — exactly representable, so both engines compute the
    piecewise intersection math on identical doubles."""
    codes = [1, 5, 24, 36, 2, 4, 21, 27, 28, 31, 111, 121]
    rows = []
    for j in range(24):
        x0 = -10.0 + (j % 12) * 1.5
        y0 = 30.0 + (j % 8) * 0.75
        x1 = x0 + 1.0 + (j % 3) * 0.5
        y1 = y0 + 0.5 + (j % 4) * 0.25
        rows.append((j, codes[j % len(codes)], x0, y0, x1, y1))
    # four SAME-CODE polys offset half-overlapping the first four, so some
    # (parcel, class_code) groups aggregate n_polys > 1 distinct polygons
    # (the per-code SUM is then a real float-order-insensitive check)
    for j in range(24, 28):
        b = j - 24
        x0 = -10.0 + b * 1.5 + 0.5
        y0 = 30.0 + b * 0.75 + 0.25
        rows.append((j, codes[b], x0, y0, x0 + 1.0, y0 + 0.5))
    return rows


def q_intersect_rect(spark, sf_dir):
    """J1 polygon x polygon intersection join, end-to-end through the
    production operator (distributed mapInPandas parcel cover -> broadcast
    class-cover equi-join -> map-side anchor-cell dedup + bbox prune ->
    whole-stage-codegen piecewise area -> F4 min-acres + F1 urban filters),
    DuckDB-oracled: axis-aligned parcels derived from ``customer`` on a
    1/32-deg lattice make the exact area SQL-expressible, while parcels up
    to 1.25 x 0.875 deg (4 x 5 level-10 cells) force multi-cell covers —
    a surviving equi-join duplicate would inflate the summed area and
    break the value hash. Reference semantics: ST_Intersection area per
    (parcel, CDL polygon) pair (database_config_v3.py:82-92)."""
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.intersect import (
        intersection_join,
    )

    k = F.col("c_custkey")
    x0 = F.lit(-10.0) + (k % 37) * F.lit(0.5)
    y0 = F.lit(30.0) + (k % 23) * F.lit(0.25)
    x1 = x0 + F.lit(0.25) + (k % 5) * F.lit(0.25)
    y1 = y0 + F.lit(0.125) + (k % 7) * F.lit(0.125)
    wkt = F.format_string(
        "POLYGON((%.5f %.5f, %.5f %.5f, %.5f %.5f, %.5f %.5f, %.5f %.5f))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )
    parcels = _t(spark, sf_dir, "customer").select(
        k.alias("parcel_id"), (k % 5).alias("fips"),
        F.lit(1.0).alias("acres"), wkt.alias("geom_wkt"),
    )
    cls = pd.DataFrame(
        _rect_class_rows(),
        columns=["class_poly_id", "class_code", "x0", "y0", "x1", "y1"],
    )
    cls["geom_wkt"] = [
        f"POLYGON(({r.x0:.5f} {r.y0:.5f}, {r.x1:.5f} {r.y0:.5f}, "
        f"{r.x1:.5f} {r.y1:.5f}, {r.x0:.5f} {r.y1:.5f}, "
        f"{r.x0:.5f} {r.y0:.5f}))"
        for r in cls.itertuples()
    ]
    # 200k acres sits INSIDE the area distribution (drops ~20% of pairs,
    # nearest value 33k acres away — a deleted/inverted F4 filter breaks
    # the row count, and float divergence near the threshold is impossible
    # by 4 orders of magnitude); the lattice's smallest positive overlap
    # is ~78k acres, so any smaller threshold would be a no-op.
    res = intersection_join(
        spark, parcels, cls[["class_poly_id", "class_code", "geom_wkt"]],
        min_acres=200000.0,
    )
    return (
        res.groupBy("parcel_id", "class_code")
        .agg(
            F.round(F.sum("area_acres"), 2).alias("area_acres_r"),
            F.count("*").alias("n_polys"),
        )
        .orderBy("parcel_id", "class_code")
    )


def _sql_intersect_rect() -> str:
    values = ",\n           ".join(
        f"({j}, {code}, {x0!r}, {y0!r}, {x1!r}, {y1!r})"
        for j, code, x0, y0, x1, y1 in _rect_class_rows()
    )
    # literal matches the engine's F.lit(G.DEG_M * G.DEG_M) single-constant
    # multiply (111320.0^2 is integer-valued, exactly representable)
    from biomass_processing_pipeline_spark import geometry as _G

    deg_m2 = repr(_G.DEG_M * _G.DEG_M)
    acres = repr(_G.ACRES_PER_M2)
    urban = ", ".join(str(c) for c in URBAN_CODES)
    return f"""
  WITH parcels AS (
    -- each COORDINATE expression computes in DuckDB DECIMAL (0.5-style
    -- literals are DECIMAL) and is cast to DOUBLE once at the end; the
    -- cast is exact ONLY because every value here is a dyadic rational
    -- (2^-k lattice) — a non-dyadic lattice (0.1 steps) would need the
    -- cast on every literal BEFORE the arithmetic to match Spark
    SELECT c_custkey AS parcel_id,
           CAST(-10.0 + (c_custkey % 37) * 0.5 AS DOUBLE) AS x0,
           CAST(30.0 + (c_custkey % 23) * 0.25 AS DOUBLE) AS y0,
           CAST(-10.0 + (c_custkey % 37) * 0.5
                + 0.25 + (c_custkey % 5) * 0.25 AS DOUBLE) AS x1,
           CAST(30.0 + (c_custkey % 23) * 0.25
                + 0.125 + (c_custkey % 7) * 0.125 AS DOUBLE) AS y1
    FROM customer),
  classes_raw(class_poly_id, class_code, rx0, ry0, rx1, ry1) AS (
    VALUES {values}),
  classes AS (
    SELECT class_poly_id, class_code,
           CAST(rx0 AS DOUBLE) AS cx0, CAST(ry0 AS DOUBLE) AS cy0,
           CAST(rx1 AS DOUBLE) AS cx1, CAST(ry1 AS DOUBLE) AS cy1
    FROM classes_raw),
  pairs AS (
    SELECT p.parcel_id, c.class_poly_id, c.class_code,
           GREATEST(p.x0, c.cx0) AS ix0, GREATEST(p.y0, c.cy0) AS iy0,
           LEAST(p.x1, c.cx1) AS ix1, LEAST(p.y1, c.cy1) AS iy1
    FROM parcels p CROSS JOIN classes c
    WHERE LEAST(p.x1, c.cx1) > GREATEST(p.x0, c.cx0)
      AND LEAST(p.y1, c.cy1) > GREATEST(p.y0, c.cy0)),
  areas AS (
    SELECT parcel_id, class_poly_id, class_code,
           (ix1 - ix0) * (iy1 - iy0) * {deg_m2}
             * COS(RADIANS((iy0 + iy1) / 2.0)) * {acres} AS area_acres
    FROM pairs)
  SELECT parcel_id, CAST(class_code AS BIGINT) AS class_code,
         CAST(ROUND(CAST(SUM(area_acres) AS DOUBLE) + 0.0, 2) AS DOUBLE)
           AS area_acres_r,
         COUNT(*) AS n_polys
  FROM areas
  WHERE area_acres >= 200000.0 AND class_code NOT IN ({urban})
  GROUP BY parcel_id, class_code
  ORDER BY parcel_id, class_code
"""


SQL_UPSERT = """
  WITH base AS (
    SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS v,
           o_orderstatus AS status
    FROM orders WHERE o_orderkey % 4 != 0),
  batch AS (
    SELECT o_orderkey AS k, ROUND(o_totalprice * 2.0, 2) AS v,
           'U' AS status
    FROM orders WHERE o_orderkey % 3 = 0),
  after2 AS (
    SELECT * FROM base WHERE k NOT IN (SELECT k FROM batch)
    UNION ALL SELECT * FROM batch),
  conflicted AS (
    SELECT o_orderkey AS k, ROUND(o_totalprice + 1.0, 2) AS v,
           'X' AS status, 1 AS seq
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey AS k, ROUND(o_totalprice + 2.0, 2) AS v,
           'Y' AS status, 2 AS seq
    FROM orders WHERE o_orderkey % 5 = 0),
  batch3 AS (
    SELECT k, v, status FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM conflicted) WHERE rn = 1)
  SELECT * FROM after2 WHERE k NOT IN (SELECT k FROM batch3)
  UNION ALL SELECT * FROM batch3
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C rule): every tenth doc
    is the deterministic 'benchmark'; each remaining training doc reports
    its distinct word-4-gram count and how many of those occur anywhere
    in the benchmark — all native expressions, eval grams broadcast."""
    from biomass_processing_pipeline_spark.operators.text import decontaminate

    docs = _t(spark, sf_dir, "documents")
    return decontaminate(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        n=4,
    )


SQL_DECONTAMINATE = """
  WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
  g AS (SELECT doc_id,
               unnest(list_transform(range(1, len(words) - 4 + 2),
                      i -> array_to_string(words[i:i+3], ' '))) AS gram
        FROM w),
  tg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 10 <> 0),
  eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
  per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM tg GROUP BY doc_id),
  hits AS (SELECT doc_id, COUNT(*) AS n_hit_grams FROM tg
           WHERE gram IN (SELECT gram FROM eg) GROUP BY doc_id)
  SELECT d.doc_id,
         COALESCE(p.n_grams, 0) AS n_grams,
         COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
         COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
  FROM documents d
  LEFT JOIN per_doc p ON p.doc_id = d.doc_id
  LEFT JOIN hits h ON h.doc_id = d.doc_id
  WHERE d.doc_id % 10 <> 0
"""


def q_repetition(spark, sf_dir):
    """Within-doc repetition stats (Gopher rules) with word-level
    segments: the synthetic corpus is single-line, so the driver instance
    sets ``line_sep=' '`` — the duplicate-"line" metrics become
    duplicate-WORD fractions (heavily exercised: the corpus repeats
    words), and the top-bigram share rides the same spaces. The pytest
    fixtures exercise real multi-line text with ``'\\n'``."""
    from biomass_processing_pipeline_spark.operators.text import (
        repetition_stats,
    )

    return repetition_stats(
        _t(spark, sf_dir, "documents"), n=2, line_sep=" "
    )


SQL_REPETITION = """
  WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
             FROM documents),
  nl AS (SELECT doc_id, line, COUNT(*) AS c, LENGTH(line) AS ln
         FROM l WHERE LENGTH(line) > 0 GROUP BY doc_id, line),
  pl AS (SELECT doc_id, SUM(c) AS n_lines, COUNT(*) AS nd,
                SUM(c * ln) AS tot_ch, SUM((c - 1) * ln) AS dup_ch
         FROM nl GROUP BY doc_id),
  w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
  g AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
               i -> array_to_string(words[i:i+1], ' '))) AS gram FROM w),
  gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
  pg AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM gc GROUP BY doc_id)
  SELECT d.doc_id,
    CAST(COALESCE(pl.n_lines, 0) AS BIGINT) AS n_lines,
    CAST(ROUND(CASE WHEN pl.n_lines > 0
               THEN (pl.n_lines - pl.nd) / CAST(pl.n_lines AS DOUBLE)
               ELSE 0.0 END, 6) AS DOUBLE) AS dup_line_frac,
    CAST(ROUND(CASE WHEN pl.tot_ch > 0
               THEN pl.dup_ch / CAST(pl.tot_ch AS DOUBLE)
               ELSE 0.0 END, 6) AS DOUBLE) AS dup_line_char_frac,
    CAST(ROUND(CASE WHEN pg.tot > 0
               THEN pg.mx / CAST(pg.tot AS DOUBLE)
               ELSE 0.0 END, 6) AS DOUBLE) AS top_ngram_frac,
    (CAST(ROUND(CASE WHEN pl.n_lines > 0
                THEN (pl.n_lines - pl.nd) / CAST(pl.n_lines AS DOUBLE)
                ELSE 0.0 END, 6) AS DOUBLE) > 0.30
     OR CAST(ROUND(CASE WHEN pg.tot > 0
                   THEN pg.mx / CAST(pg.tot AS DOUBLE)
                   ELSE 0.0 END, 6) AS DOUBLE) > 0.20) AS repetitive
  FROM documents d
  LEFT JOIN pl ON pl.doc_id = d.doc_id
  LEFT JOIN pg ON pg.doc_id = d.doc_id
"""


# the driver-contract mixture: downsample the dominant language, upsample
# the scarce ones with replacement (fractional rates exercise the
# Bernoulli leg, >1 rates the replication leg)
_MIX_RATES = {"en": 0.45, "de": 1.0, "fr": 1.0, "es": 1.5, "unknown": 2.6}


def q_mix_sample(spark, sf_dir):
    """Deterministic training-mix sampling: language-ID the corpus, then
    re-weight per language (en 0.45x down, unknown 2.6x up with
    replacement) — map-only modular-arithmetic Bernoulli, zero shuffles
    past the langid projection, reproducible row-for-row by any SQL
    engine (no rand, no murmur3)."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        mix_sample,
    )
    from biomass_processing_pipeline_spark.operators.text import langid_df

    lang = langid_df(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang_guess"
    )
    return mix_sample(
        lang, "lang_guess", _MIX_RATES, key_col="doc_id", seed=42
    )


def _sql_mix_sample() -> str:
    """Twin with the (base, threshold) literals generated by the SAME
    ``rate_to_copies`` the engine uses — the Bernoulli compare is pure
    integer arithmetic, so literal identity IS value identity. The key
    hash wraps with pmod arithmetic (``((k % m) + m) % m``), the
    contract ``sample_hash_col`` documents: DuckDB's plain ``%``
    follows the dividend's sign, so a negative key would otherwise
    hash negative and always draw the Bernoulli extra."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        rate_to_copies,
    )

    base_cases = " ".join(
        f"WHEN '{g}' THEN {rate_to_copies(r)[0]}"
        for g, r in _MIX_RATES.items()
    )
    thr_cases = " ".join(
        f"WHEN '{g}' THEN {rate_to_copies(r)[1]}"
        for g, r in _MIX_RATES.items()
    )
    db, dt = rate_to_copies(1.0)
    return f"""
  WITH {_SQL_LANG_CTE},
  par AS (
    SELECT doc_id, lang_guess,
           CASE lang_guess {base_cases} ELSE {db} END AS base_n,
           CASE lang_guess {thr_cases} ELSE {dt} END AS thr,
           ((((doc_id % 2147483648) + 2147483648) % 2147483648)
             * 2654435761 + 42) % 2147483647
             * 2246822519 % 2147483647 AS hh
    FROM lang),
  n_of AS (
    SELECT doc_id, lang_guess,
           base_n + CASE WHEN hh < thr THEN 1 ELSE 0 END AS n
    FROM par)
  SELECT doc_id, lang_guess, CAST(unnest(range(n)) AS INT) AS sample_copy
  FROM n_of
"""


def q_lm_score(spark, sf_dir):
    """Unigram-LM quality scoring (the CCNet perplexity-filter shape):
    train the add-1 unigram model on the even-id half of the corpus,
    score every doc — exercises the unseen-token smoothing join path
    structurally while keeping the model a pure corpus statistic."""
    from biomass_processing_pipeline_spark.operators.text import (
        unigram_logprob,
    )

    docs = _t(spark, sf_dir, "documents")
    return unigram_logprob(docs, ref=docs.where(F.col("doc_id") % 2 == 0))


def _sql_lm_cte(ref_where: str) -> str:
    """Unigram-LM twin CTE block (token explode, add-1 model over the
    ``ref_where``-filtered reference, per-doc scores) — ONE copy shared
    by the lm_score and lm_buckets twins so the model arithmetic cannot
    drift between them."""
    return f"""
  tok AS (
    SELECT doc_id, t FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE LENGTH(t) > 0),
  c AS (SELECT t, COUNT(*) AS c FROM tok {ref_where} GROUP BY t),
  tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM c),
  scored AS (
    SELECT tok.doc_id,
           LN((COALESCE(c.c, 0) + 1.0) / (tot.n + 1.0 * tot.v)) AS lp
    FROM tok LEFT JOIN c USING (t) CROSS JOIN tot),
  per AS (SELECT doc_id, COUNT(*) AS n_tokens,
                 CAST(ROUND(-AVG(lp), 6) AS DOUBLE) AS avg_neg_logp
          FROM scored GROUP BY doc_id)
"""


SQL_LM_SCORE = f"""
  WITH {_sql_lm_cte("WHERE doc_id % 2 = 0")}
  SELECT d.doc_id, CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         p.avg_neg_logp
  FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""


def q_line_dedup(spark, sf_dir):
    """C4-style corpus-level exact segment dedup at word granularity
    (the corpus is single-line, so ``line_sep=' '`` exercises the full
    winner-election + rebuild machinery on a heavily duplicated segment
    universe; pytest covers real multi-line text)."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        corpus_line_dedup,
    )

    return corpus_line_dedup(_t(spark, sf_dir, "documents"), line_sep=" ")


SQL_LINE_DEDUP = """
  WITH l AS (
    SELECT doc_id, unnest(range(len(ws))) AS pos, unnest(ws) AS line
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
  ne AS (
    SELECT doc_id, pos, line,
           ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
    FROM l WHERE LENGTH(line) > 0),
  kept AS (
    SELECT doc_id, pos, line FROM ne WHERE rn = 1
    UNION ALL
    SELECT doc_id, pos, line FROM l WHERE LENGTH(line) = 0),
  rebuilt AS (
    SELECT doc_id,
           string_agg(line, ' ' ORDER BY pos) AS clean_text,
           SUM(CASE WHEN LENGTH(line) > 0 THEN 1 ELSE 0 END) AS n_kept
    FROM kept GROUP BY doc_id),
  totals AS (
    SELECT doc_id, COUNT(*) AS n_ne FROM l WHERE LENGTH(line) > 0
    GROUP BY doc_id)
  SELECT d.doc_id, r.clean_text,
         CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
         CAST(COALESCE(t.n_ne, 0) - COALESCE(r.n_kept, 0) AS BIGINT)
           AS n_dropped
  FROM documents d
  LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
  LEFT JOIN totals t ON t.doc_id = d.doc_id
"""


def q_pii_scrub(spark, sf_dir):
    """PII scrub over deterministic synthesized contact lines (the
    corpus itself is clean word soup, so each doc gets an email, a
    dotted-quad, and an international phone derived from its id —
    constructed identically in the SQL twin): every pattern family is
    exercised on every row, counts + progressive replacement verified
    hash-exact."""
    from biomass_processing_pipeline_spark.operators.text import scrub_pii

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" mail u"), d, F.lit("@ex.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +44 7700 900"),
            (F.col("doc_id") % 1000).cast("string"),
        ).alias("text"),
    )
    return scrub_pii(synth)


SQL_PII_SCRUB = r"""
  WITH s AS (
    SELECT doc_id,
           text || ' mail u' || CAST(doc_id AS VARCHAR)
                || '@ex.com or 10.0.'
                || CAST(doc_id % 256 AS VARCHAR)
                || '.7 tel +44 7700 900'
                || CAST(doc_id % 1000 AS VARCHAR) AS t
    FROM documents),
  e AS (
    SELECT doc_id,
      CAST(LEN(regexp_extract_all(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        AS n_email,
      regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g') AS t1
    FROM s),
  i AS (
    SELECT doc_id, n_email,
      CAST(LEN(regexp_extract_all(t1,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
      regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                     '<IP>', 'g') AS t2
    FROM e),
  p AS (
    SELECT doc_id, n_email, n_ip,
      CAST(LEN(regexp_extract_all(t2, '\+?\d[\d\- ]{7,}\d')) AS INT)
        AS n_phone,
      regexp_replace(t2, '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS t3
    FROM i)
  SELECT doc_id, t3 AS clean_text, n_email, n_ip, n_phone FROM p
"""


def q_pack_offsets(spark, sf_dir):
    """GPT-style packing layout over the corpus in doc_id order,
    512-token training windows; bucket_size=64 forces the two-level
    distributed prefix scan through its multi-bucket path even at the
    smallest tier (the oracle is a plain ordered-window cumsum)."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        pack_offsets,
    )
    from biomass_processing_pipeline_spark.operators.text import (
        token_count_col,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    return pack_offsets(
        docs, "n_tokens", "doc_id", budget=512, bucket_size=64
    )


SQL_PACK_OFFSETS = """
  WITH t AS (
    SELECT doc_id,
           COALESCE(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')), 0)
             AS n_tokens
    FROM documents),
  c AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t)
  SELECT doc_id,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(cum - n_tokens AS BIGINT) AS start_tok,
         CASE WHEN n_tokens > 0
              THEN CAST((cum - n_tokens) // 512 AS BIGINT) END AS first_chunk,
         CASE WHEN n_tokens > 0
              THEN CAST((cum - 1) // 512 AS BIGINT) END AS last_chunk
  FROM c
"""


def q_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus split: self-trained unigram LM
    scores bucketed by exact round-6 tertile cuts (one tiny aggregate
    broadcast back — never a corpus-wide ranking window)."""
    from biomass_processing_pipeline_spark.operators.text import (
        lm_quality_split, unigram_logprob,
    )

    docs = _t(spark, sf_dir, "documents")
    return lm_quality_split(unigram_logprob(docs))


SQL_LM_BUCKETS = f"""
  WITH {_sql_lm_cte("")},
  sc AS (
    SELECT d.doc_id, p.avg_neg_logp
    FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id),
  cuts AS (
    SELECT
      CAST(ROUND(QUANTILE_CONT(avg_neg_logp, 1.0/3), 6) AS DOUBLE) AS c1,
      CAST(ROUND(QUANTILE_CONT(avg_neg_logp, 2.0/3), 6) AS DOUBLE) AS c2
    FROM sc)
  SELECT doc_id, avg_neg_logp,
         CASE WHEN avg_neg_logp IS NULL THEN NULL
              WHEN avg_neg_logp <= c1 THEN 'head'
              WHEN avg_neg_logp <= c2 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM sc CROSS JOIN cuts
"""


def q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup: distributed-Lloyd clusters (assignment
    FROZEN to parquet so the DuckDB twin consumes identical clusters),
    within-cluster cosine>=0.4 pair graph, one kept representative per
    component (min id). The non-SQL half is exactly the k-means assign;
    the cosine refine + components are verified hash-exact."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        ivf_assign, semdedup_groups, train_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    frozen = _frozen_candidates(
        spark,
        lambda: ivf_assign(emb, train_centroids(emb, n_centroids=8)),
        "semdedup_assign.parquet", sf_dir,
    )
    return semdedup_groups(emb, frozen, threshold=0.4)


def _sql_semdedup(assign_parquet: str) -> str:
    """Recursive-CTE twin over the frozen cluster assignment: exact
    within-cluster cosine pairs -> min-reachable-id components -> keep
    flag (the dedup_components / phash_dedup CTE shape)."""
    return f"""
WITH RECURSIVE
assign AS (SELECT t_id, list_id FROM read_parquet('{assign_parquet}/*.parquet')),
u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM u GROUP BY vec_id),
cand AS (SELECT a.t_id AS ia, b.t_id AS ib
         FROM assign a JOIN assign b USING (list_id) WHERE a.t_id < b.t_id),
dots AS (SELECT c.ia, c.ib, SUM(ua.x * ub.x) AS dot
         FROM cand c
         JOIN u ua ON ua.vec_id = c.ia
         JOIN u ub ON ub.vec_id = c.ib AND ub.i = ua.i
         GROUP BY 1, 2),
pairs AS MATERIALIZED (
  SELECT ia AS id_a, ib AS id_b
  FROM dots JOIN norms na ON na.vec_id = ia JOIN norms nb ON nb.vec_id = ib
  WHERE ROUND(dot / sqrt(na.n2 * nb.n2), 6) >= 0.4),
sym AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT src AS id FROM sym),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.id = s.dst),
comp AS (SELECT id AS doc_id, MIN(r) AS rep_id FROM reach GROUP BY id)
SELECT e.vec_id,
       COALESCE(c.rep_id, e.vec_id) AS rep_id,
       e.vec_id = COALESCE(c.rep_id, e.vec_id) AS is_kept
FROM embeddings e LEFT JOIN comp c ON c.doc_id = e.vec_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "urban_filter": q_urban_filter,
    "minarea_filter": q_minarea_filter,
    "null_guard": q_null_guard,
    "topk_per_group": q_topk_per_group,
    "dominant_argmax": q_dominant_argmax,
    "weighted_mean": q_weighted_mean,
    "shannon_entropy": q_shannon_entropy,
    "bounds_agg": q_bounds_agg,
    "semi_join": q_semi_join,
    "dim_join": q_dim_join,
    "range_join": q_range_join,
    "distinct_sort_limit": q_distinct_sort_limit,
    "histogram_pct": q_histogram_pct,
    "cell_index": q_cell_index,
    "tile_assign_lattice": q_tile_assign_lattice,
    "knn_lattice": q_knn_lattice,
    "weighted_knn_agg": q_weighted_knn_agg,
    "scalar_geo": q_scalar_geo,
    "veg_indices": q_veg_indices,
    "pip_points": q_pip_points,
    "weighted_mode": q_weighted_mode,
    "percentiles": q_percentiles,
    "pivot_classes": q_pivot_classes,
    "dedup_exact": q_dedup_exact,
    "doc_quality": q_doc_quality,
    "langid": q_langid,
    "jaccard_topk": q_jaccard_topk,
    "sim_bruteforce": q_sim_bruteforce,
    "geometry_ops": q_geometry_ops,
    "json_roundtrip": q_json_roundtrip,
    "utm_transform": q_utm_transform,
    "mgrs_squares": q_mgrs_squares,
    "forest_threshold": q_forest_threshold,
    "cosine_dups": q_cosine_dups,
    "dedup_components": q_dedup_components,
    "video_frames": q_video_frames,
    "audio_features": q_audio_features,
    "image_pip_county": q_image_pip_county,
    "image_zonal_stats": q_image_zonal_stats,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "doc_fingerprint": q_doc_fingerprint,
    "sim_lsh": q_sim_lsh,
    "sim_ivf": q_sim_ivf,
    "image_features": q_image_features,
    "tile_discovery": q_tile_discovery,
    "validation_flags": q_validation_flags,
    "upsert_semantics": q_upsert_semantics,
    "phash_dedup": q_phash_dedup,
    "intersect_rect": q_intersect_rect,
    "decontaminate": q_decontaminate,
    "repetition": q_repetition,
    "mix_sample": q_mix_sample,
    "lm_score": q_lm_score,
    "line_dedup": q_line_dedup,
    "pii_scrub": q_pii_scrub,
    "pack_offsets": q_pack_offsets,
    "lm_buckets": q_lm_buckets,
    "semdedup": q_semdedup,
}

_STATIC_ORACLES: dict[str, str] = {
    "pricing_summary": SQL_PRICING,
    "urban_filter": SQL_URBAN,
    "minarea_filter": SQL_MINAREA,
    "null_guard": SQL_NULL_GUARD,
    "topk_per_group": SQL_TOPK,
    "dominant_argmax": SQL_DOMINANT,
    "weighted_mean": SQL_WEIGHTED,
    "shannon_entropy": SQL_SHANNON,
    "bounds_agg": SQL_BOUNDS,
    "semi_join": SQL_SEMI,
    "dim_join": SQL_DIM_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "distinct_sort_limit": SQL_DISTINCT,
    "histogram_pct": SQL_HISTOGRAM,
    "cell_index": _sql_cell_index(),
    "tile_assign_lattice": SQL_TILE_ASSIGN,
    "knn_lattice": SQL_KNN,
    "weighted_knn_agg": SQL_WEIGHTED_KNN,
    "scalar_geo": SQL_SCALAR_GEO,
    "veg_indices": SQL_VEG_INDICES,
    "pip_points": _sql_pip_points(),
    "weighted_mode": SQL_WEIGHTED_MODE,
    "percentiles": SQL_PERCENTILES,
    "pivot_classes": SQL_PIVOT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "doc_quality": SQL_DOC_QUALITY,
    "langid": SQL_LANGID,
    "jaccard_topk": SQL_JACCARD_TOPK,
    "sim_bruteforce": SQL_SIM_BRUTEFORCE,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "geometry_ops": SQL_GEOMETRY_OPS,
    "json_roundtrip": SQL_JSON_ROUNDTRIP,
    "utm_transform": _sql_utm(),
    "mgrs_squares": _sql_mgrs(),
    "forest_threshold": SQL_FOREST_THRESHOLD,
    "cosine_dups": SQL_COSINE_DUPS,
    "dedup_components": _sql_dedup_components(),
    "video_frames": SQL_VIDEO_FRAMES,
    "audio_features": SQL_AUDIO_FEATURES,
    "simhash_pairs": SQL_SIMHASH,
    "minhash_pairs": _sql_minhash(),
    "validation_flags": SQL_VALIDATION,
    "upsert_semantics": SQL_UPSERT,
    "intersect_rect": _sql_intersect_rect(),
    "decontaminate": SQL_DECONTAMINATE,
    "repetition": SQL_REPETITION,
    "mix_sample": _sql_mix_sample(),
    "lm_score": SQL_LM_SCORE,
    "line_dedup": SQL_LINE_DEDUP,
    "pii_scrub": SQL_PII_SCRUB,
    "pack_offsets": SQL_PACK_OFFSETS,
    "lm_buckets": SQL_LM_BUCKETS,
}


def oracles_for(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Full oracle dict with fixture-backed twins templated for the tier
    matching ``sf_dir`` (the driver compares at sf0.01; check_oracles.py
    passes whatever tier it was given)."""
    from biomass_processing_pipeline_spark import synth

    fdir = synth.fixture_dir(synth.tier_for_sf_dir(sf_dir))
    out = dict(_STATIC_ORACLES)
    out["tile_discovery"] = _sql_tile_discovery(fdir)
    out["image_pip_county"] = _sql_image_pip(fdir)
    out["image_zonal_stats"] = _sql_image_zonal(fdir)
    out["image_features"] = _sql_image_features(fdir)
    out["phash_dedup"] = _sql_phash_dedup(fdir)
    adir = _ann_freeze_dir(sf_dir)
    out["sim_lsh"] = _sql_ann_refine(f"{adir}/lsh_candidates.parquet")
    out["sim_ivf"] = _sql_ann_refine(f"{adir}/ivf_candidates.parquet")
    out["semdedup"] = _sql_semdedup(f"{adir}/semdedup_assign.parquet")
    return out


ORACLES: dict[str, str] = oracles_for()
