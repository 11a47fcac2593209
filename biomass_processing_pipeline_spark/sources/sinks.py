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
