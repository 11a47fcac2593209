import shutil
import tempfile

import pandas as pd

from biomass_processing_pipeline_spark.sources.catalog import (
    iceberg_available,
    read_table,
    write_table,
)


def test_catalog_fallback_roundtrip(spark):
    base = tempfile.mkdtemp(prefix="bpp_cat_")
    try:
        df = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 3], "bucket": [0, 0, 1]})
        )
        backend = write_table(df, f"{base}/t", partition_by=["bucket"])
        # sandbox has no Iceberg jars -> graceful parquet fallback with the
        # same partition layout
        assert backend == ("iceberg" if iceberg_available(spark) else "parquet")
        back = read_table(spark, f"{base}/t")
        assert back.count() == 3
        assert {r.bucket for r in back.select("bucket").distinct().collect()} == {0, 1}
    finally:
        shutil.rmtree(base, ignore_errors=True)
