import shutil
import tempfile

from biomass_processing_pipeline_spark.plans.lineage import pending
from biomass_processing_pipeline_spark.workflow import (
    biomass_result_table,
    county_summary,
    run_county_workflow,
)


def test_full_workflow_end_to_end(spark, smoke_dir):
    out = tempfile.mkdtemp(prefix="bpp_wf_")
    try:
        r = run_county_workflow(spark, "sf0.001", out)
        assert r["buckets"] > 0
        res = spark.read.parquet(f"{out}/data")
        assert res.count() == 2000  # every image produced a result row
        cols = set(res.columns)
        assert {"image_id", "fips", "tile_code", "ndvi_mean",
                "standing_biomass_tons", "harvestable_tons",
                "confidence_score", "bucket"} <= cols
        # re-run: resumable no-op
        r2 = run_county_workflow(spark, "sf0.001", out)
        assert r2["buckets"] == 0
        summary = county_summary(spark, out).toPandas()
        assert len(summary) == 8
        assert (summary.all_decodes_ok == 1).all()
        assert (summary.avg_confidence > 0).all()
        assert summary.n_images.sum() == 2000
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_workflow_salting_triggers_on_skew(spark, smoke_dir):
    """With a low per-task target the urban buckets must trip the census
    and the salted write must still produce identical results."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="bpp_wf_salt_")
    try:
        r = run_county_workflow(
            spark, "sf0.001", out, target_rows_per_task=150
        )
        assert r["buckets"] > 0
        assert spark.read.parquet(f"{out}/data").count() == 2000
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_result_table_sane_values(spark, smoke_dir):
    res = biomass_result_table(spark, smoke_dir, k_neighbors=10).limit(200).toPandas()
    assert ((res.ndvi_mean >= -1) & (res.ndvi_mean <= 1)).all()
    assert (res.standing_biomass_tons >= 0).all()
    assert ((res.confidence_score >= 0) & (res.confidence_score <= 1)).all()
    assert res.phash_ok.all()
    # reference forest A6 columns (forest_analyzer_v3.py:625-726)
    assert {"stand_age", "dominant_forest_type", "harvest_prob"} <= set(res.columns)
    # stand ages derive from 20 + plot_cn % 80 -> weighted means inside
    assert ((res.stand_age >= 20) & (res.stand_age < 100)).all()
    assert res.dominant_forest_type.isin([0, 1, 2, 3]).all()
    assert ((res.harvest_prob > 0.1) & (res.harvest_prob <= 0.95)).all()
    # plausibility gate (vegetation_analyzer_v3.py:233-273): NDVI in range
    # -> every row valid; warnings only fire on NDVI < -0.5 / px < 10
    assert {"valid", "validation_warnings"} <= set(res.columns)
    assert res.valid.all()
    flagged = res.validation_warnings != ""
    expect = (res.ndvi_mean < -0.5) | (res.px_count < 10)
    assert (flagged == expect).all()


def test_result_table_json_array_parity(spark, smoke_dir):
    """Reference result-row parity (database_manager_v3.py:664-712):
    data_sources array + three JSON blobs, and a from_json round-trip that
    recovers the flat columns exactly."""
    from pyspark.sql import functions as F

    df = biomass_result_table(spark, smoke_dir, k_neighbors=10).limit(100)
    pdf = df.toPandas()
    assert {"data_sources", "forest_analysis", "landcover_analysis",
            "crop_analysis"} <= set(pdf.columns)
    # every image decodes + finds neighbors + has NDVI -> all 3 sources
    assert all(list(s) == ["NAIP", "FIA", "CDL"] for s in pdf.data_sources)
    rt = df.select(
        "image_id", "n_neighbors", "standing_biomass_tons",
        F.from_json(
            "forest_analysis",
            "biomass_tpa double, harvestable_tpa double, "
            "n_neighbors long, sum_w double",
        ).alias("fa"),
        F.from_json(
            "crop_analysis",
            "multiplier double, standing_biomass_tons double, "
            "harvestable_tons double",
        ).alias("ca"),
    ).toPandas()
    assert all(r.fa["n_neighbors"] == r.n_neighbors
               for r in rt.itertuples(index=False))
    assert all(r.ca["standing_biomass_tons"] == r.standing_biomass_tons
               for r in rt.itertuples(index=False))


def test_workflow_reference_decimals_write(spark, smoke_dir):
    """Decimal-mode FLAGSHIP leg: reference_decimals=True persists the
    exact NUMERIC(p,s) sink schema (ANSI cast = loud on overflow) AND the
    written values agree with the double-mode run at each column's scale
    — the reference-parity sink exercised end-to-end, not just
    unit-tested."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="bpp_wf_dec_")
    out_d = tempfile.mkdtemp(prefix="bpp_wf_dbl_")
    try:
        run_county_workflow(spark, "sf0.001", out, reference_decimals=True)
        dec = spark.read.parquet(f"{out}/data")
        got = dict(dec.dtypes)
        assert got["ndvi_mean"] == "decimal(6,4)"
        assert got["confidence_score"] == "decimal(4,3)"
        assert got["standing_biomass_tons"] == "decimal(12,3)"
        assert got["harvestable_tons"] == "decimal(12,3)"

        run_county_workflow(spark, "sf0.001", out_d)
        dbl = spark.read.parquet(f"{out_d}/data")
        assert dec.count() == dbl.count() == 2000

        scales = {"ndvi_mean": 4, "confidence_score": 3,
                  "standing_biomass_tons": 3, "harvestable_tons": 3}
        j = dec.select(
            "image_id", *[F.col(c).cast("double").alias(f"d_{c}")
                          for c in scales]
        ).join(
            dbl.select("image_id", *scales), "image_id", "inner"
        )
        assert j.count() == 2000  # identical key sets
        diffs = j.select(*[
            F.max(F.abs(F.col(f"d_{c}") - F.round(F.col(c), s))).alias(c)
            for c, s in scales.items()
        ]).first()
        for c in scales:
            assert diffs[c] < 1e-9, (c, diffs[c])
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out_d, ignore_errors=True)


def test_workflow_output_files_sorted_within_partition(spark, smoke_dir):
    """SURVEY §4 index replacement: every written parquet file is sorted
    by image_id, so min/max row-group stats prune point lookups."""
    import glob

    import pyarrow.parquet as pq

    out = tempfile.mkdtemp(prefix="bpp_wf_sort_")
    try:
        run_county_workflow(spark, "sf0.001", out)
        files = glob.glob(f"{out}/data/bucket=*/*.parquet")
        assert files
        for f in files:
            ids = pq.read_table(f, columns=["image_id"])["image_id"].to_pylist()
            assert ids == sorted(ids), f
    finally:
        shutil.rmtree(out, ignore_errors=True)
