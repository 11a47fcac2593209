"""Result sinks (SURVEY.md S7-S9).

Reference semantics: batched ``INSERT ... ON CONFLICT DO UPDATE`` upserts
(``/root/reference/src/core/database_manager_v3.py:644-809``), normalized
detail-row bulk inserts (``:811-1004``), and a flat CSV export
(``src/config/processing_config_v3.py:43-70``).

Spark mapping: parquet sinks here; on a real deployment the upsert is an
Iceberg ``MERGE INTO`` — the parquet emulation below implements the same
keep-latest-by-key semantics with an anti-join + union rewrite, and is the
documented fallback when no Iceberg catalog is configured (the session
does not hard-require Iceberg, SURVEY.md §7.0 point 1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession, new: DataFrame, path: str, key_cols: list[str],
) -> int:
    """Keep-latest upsert: rows in ``new`` replace same-key rows in the
    existing table; everything else is preserved. Returns row count after.

    Emulates ``ON CONFLICT (keys) DO UPDATE`` / Iceberg MERGE INTO. The
    write staged to a temp dir then moved keeps the operation atomic-ish
    on a local FS (object stores would use the Iceberg commit protocol).
    """
    import shutil

    from pyspark.sql import Observation

    exists = os.path.exists(path)
    if exists:
        old = spark.read.parquet(path)
        keep = old.join(
            new.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(new)
    else:
        merged = new
    # ONE data pass: the count rides on the staged write via observe();
    # the staged dir then replaces the live dir with a filesystem move
    # (merged reads from `path`, so the swap happens only after the full
    # staged write succeeded — same ordering an Iceberg commit gives)
    tmp = path.rstrip("/") + "._staged"
    obs = Observation("upsert_rows")
    merged.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(tmp)
    n = int(obs.get["n"])
    if exists:
        shutil.rmtree(path)
    os.rename(tmp, path)
    return n


def append_detail(df: DataFrame, path: str) -> None:
    """S8 normalized detail sink: plain bulk append of exploded rows."""
    df.write.mode("append").parquet(path)


CSV_COLUMNS = [
    # S9: flat export projection, analogue of the 19-col v1 schema
    # (processing_config_v3.py:43-70)
    "image_id", "fips", "tile_code", "biomass_type", "source_code",
    "area_acres", "yield_tons", "harvestable_tons", "ndvi", "evi", "savi",
    "ndwi", "confidence_score",
]


def write_csv(df: DataFrame, path: str) -> None:
    """S9 CSV sink: stable column order + header, one directory of parts."""
    cols = [c for c in CSV_COLUMNS if c in df.columns]
    df.select(*cols).write.mode("overwrite").option("header", True).csv(path)


# --- DecimalType parity shim (SURVEY §1.3) ---------------------------------
# The reference's result table declares NUMERIC(p,s) columns
# (database_manager_v3.py:669-695); the engine computes in DoubleType
# (SURVEY §1.3 explicitly allows this) and this shim restores the exact
# declared precision AT THE SINK BOUNDARY. Matching is by column name /
# suffix, mirroring the reference's naming conventions.
_DECIMAL_RULES: list[tuple[tuple[str, ...], tuple[int, int]]] = [
    # exact names first, then suffix families
    (("ndvi", "evi", "savi", "ndwi", "ndvi_mean"), (6, 4)),
    (("confidence_score",), (4, 3)),
    (("centroid_lon", "centroid_lat", "lon", "lat"), (12, 8)),
]
_DECIMAL_SUFFIX_RULES: list[tuple[str, tuple[int, int]]] = [
    ("_tons", (12, 3)),
    ("_acres", (10, 3)),
    ("_percentage", (5, 2)),
    ("_pct", (5, 2)),
]


def reference_decimal_schema(columns: list[str]) -> dict[str, tuple[int, int]]:
    """column name -> (precision, scale) for every column the reference
    declares as NUMERIC; unmatched columns are left untouched."""
    out: dict[str, tuple[int, int]] = {}
    for c in columns:
        for names, ps in _DECIMAL_RULES:
            if c in names:
                out[c] = ps
                break
        else:
            for suffix, ps in _DECIMAL_SUFFIX_RULES:
                if c.endswith(suffix):
                    out[c] = ps
                    break
    return out


def cast_reference_decimals(df: DataFrame) -> DataFrame:
    """Cast double columns to the reference's NUMERIC(p,s) at the sink
    boundary (ANSI mode: an out-of-range value fails the write loudly,
    the same contract the reference's NUMERIC columns enforce)."""
    schema = reference_decimal_schema(df.columns)
    return df.select(*[
        F.col(c).cast(f"decimal({schema[c][0]},{schema[c][1]})").alias(c)
        if c in schema else F.col(c)
        for c in df.columns
    ])
