"""Local stand-in for the driver's CORRECTNESS check: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row-count + name-sorted schema + order-insensitive value
hash. Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    only = [a.split("=", 1)[1].split(",") for a in sys.argv[1:]
            if a.startswith("--only=")]
    only = set(only[0]) if only else None
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from biomass_processing_pipeline_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from biomass_processing_pipeline_spark.queries import oracles_for

    # template fixture-backed twins for THIS tier (the driver contract's
    # oracle_sql() stays pinned to the sf0.01 tier it is compared at)
    qs, oracles = entrymod.queries(), oracles_for(sf_dir)
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if status == "FAIL" and ok_cols and ok_rows:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).head(3)
            e2 = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).head(3)
            print("  spark:", g.to_dict("records"))
            print("  duck :", e2.to_dict("records"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
