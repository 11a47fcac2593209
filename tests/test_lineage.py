import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.plans.lineage import (
    completed_buckets,
    lineage_metrics,
    pending,
    run_resumable,
)
from biomass_processing_pipeline_spark.plans.partitioning import (
    repartition_salted,
    skew_census,
    with_cell_prefix,
    with_salt,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def _bucketed(spark, smoke_dir):
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    return with_cell_prefix(fp, prefix_level=5).withColumnRenamed(
        "cell_prefix", "bucket"
    )


def test_resumable_write_and_noop_second_run(spark, smoke_dir):
    df = _bucketed(spark, smoke_dir).select("image_id", "cell_id", "bucket")
    out = tempfile.mkdtemp(prefix="bpp_lineage_")
    try:
        r1 = run_resumable(df, out)
        assert r1["buckets"] > 0
        total = spark.read.parquet(f"{out}/data").count()
        assert total == df.count()
        # second run: everything complete -> no-op
        r2 = run_resumable(df, out)
        assert r2["buckets"] == 0
        m = lineage_metrics(spark, out).toPandas()
        assert m.status.eq("complete").all()
        assert m.rows_out.sum() == total
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_resume_processes_only_missing_buckets(spark, smoke_dir):
    df = _bucketed(spark, smoke_dir).select("image_id", "cell_id", "bucket")
    out = tempfile.mkdtemp(prefix="bpp_resume_")
    try:
        buckets = [r.bucket for r in df.select("bucket").distinct().collect()]
        half = buckets[: len(buckets) // 2]
        run_resumable(df.where(F.col("bucket").isin(half)), out)
        n_done = len(
            completed_buckets(spark, out).collect()
        )
        assert n_done == len(half)
        todo = pending(df, out)
        assert todo.select("bucket").distinct().count() == len(buckets) - len(half)
        # full resume completes the rest; totals match the full input
        run_resumable(df, out)
        assert spark.read.parquet(f"{out}/data").count() == df.count()
        assert pending(df, out).isEmpty()
        # lineage rows are per-RUN deltas: the resumed run must not re-emit
        # rows for buckets the first run completed (no double counting)
        m = lineage_metrics(spark, out).toPandas()
        assert m.rows_out.sum() == df.count()
        assert len(m) == 2  # two run_ids, disjoint bucket sets
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_skew_census_finds_urban_cells(spark, smoke_dir):
    df = _bucketed(spark, smoke_dir)
    census = skew_census(
        df, key_col="bucket", sample_frac=0.5, target_rows_per_task=100
    )
    assert census, "urban cells must trip the census"
    # the top salted bucket should be one holding an urban name-tile
    counts = df.groupBy("bucket").count().orderBy(F.desc("count")).toPandas()
    assert counts.iloc[0]["bucket"] in census
    salted = with_salt(
        df.withColumnRenamed("bucket", "cell_prefix"), census,
        key_col="cell_prefix",
    )
    sp = salted.groupBy("cell_prefix", "salt").count().toPandas()
    hot = max(census, key=census.get)
    assert sp[sp.cell_prefix == hot]["salt"].nunique() == census[hot]
    # salting must not change row count
    assert salted.count() == df.count()
    assert repartition_salted(salted, 8).count() == df.count()
