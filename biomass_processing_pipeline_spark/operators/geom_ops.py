"""Geometry scalar ops as an Arrow-batched UDF surface (SURVEY.md §2.7
rows: geometry fix/simplify/buffer, WKT conversion, centroid — reference
``geometry_utils_v1.py:34-160``).

The UDF parses WKT built NATIVELY from table columns (format_string), runs
make_valid -> simplify -> buffer -> centroid in numpy, and returns one
struct per row. Every output is closed-form in the inputs, so the whole
surface gets a DuckDB oracle:

- make_valid drops the duplicate + collinear vertices -> 5 left;
- Douglas-Peucker removes the top-edge bump iff ``jitter < tol``;
- the rect buffer area is exactly A + P*d + 16 d^2 sin(pi/16)
  (4 quarter-arc fans sampled at quad_segs=8);
- the rect centroid is (w/2, h/2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import geometry as G

GEOM_OPS_SCHEMA = T.StructType([
    T.StructField("nv_valid", T.IntegerType()),
    T.StructField("nv_simpl", T.IntegerType()),
    T.StructField("area_simpl", T.DoubleType()),
    T.StructField("buf_area", T.DoubleType()),
    T.StructField("cx", T.DoubleType()),
    T.StructField("cy", T.DoubleType()),
])


def geom_ops_udf():
    @pandas_udf(GEOM_OPS_SCHEMA)
    def ops(wkt: pd.Series, tol: pd.Series, dist: pd.Series,
            rw: pd.Series, rh: pd.Series) -> pd.DataFrame:
        rows = []
        for w, t, d, ww, hh in zip(wkt, tol, dist, rw, rh):
            xs, ys = G.parse_wkt(w)[0][0]
            v = G.make_valid_ring(xs, ys)
            sx, sy = G.simplify_ring(*v, float(t))
            # buffer the underlying w x h rect (closed-form oracle target)
            rx = np.array([0.0, float(ww), float(ww), 0.0])
            ry = np.array([0.0, 0.0, float(hh), float(hh)])
            b = G.buffer_ring(rx, ry, float(d))
            cx, cy = G.centroid(rx, ry)
            rows.append((
                len(v[0]), len(sx), G.shoelace_area(sx, sy),
                G.shoelace_area(*b) if b is not None else 0.0, cx, cy,
            ))
        return pd.DataFrame(
            rows, columns=[f.name for f in GEOM_OPS_SCHEMA.fields]
        )

    return ops


def geometry_ops_df(df: DataFrame, key: Column, w: Column, h: Column,
                    jitter: Column, tol: Column, dist: Column) -> DataFrame:
    """Build the test pentagon WKT natively (dup vertex + collinear vertex
    + jittered top-edge bump), then run the geometry-op UDF over it."""
    wkt = F.format_string(
        "POLYGON ((0 0, %s 0, %s 0, %s %s, %s %s, 0 %s, 0 %s, 0 0))",
        w, w, w, h, (w / 2), (h + jitter), h, (h / 2),
    )
    out = df.select(
        key.alias("key"), w.alias("w"), h.alias("h"),
        jitter.alias("jitter"), tol.alias("tol"), dist.alias("dist"),
        wkt.alias("wkt"),
    )
    ops = geom_ops_udf()(
        F.col("wkt"), F.col("tol"), F.col("dist"), F.col("w"), F.col("h")
    ).alias("g")
    return out.select("key", ops).select(
        "key",
        F.col("g.nv_valid").alias("nv_valid"),
        F.col("g.nv_simpl").alias("nv_simpl"),
        F.round("g.area_simpl", 6).alias("area_simpl"),
        F.round("g.buf_area", 6).alias("buf_area"),
        F.round("g.cx", 6).alias("cx"),
        F.round("g.cy", 6).alias("cy"),
    )
