"""Physical-plan quality gates: the optimizations the engine claims must
be visible in the executed plan, not just intended (SURVEY.md §7: "iterate
until it's the plan you'd want").
"""

import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.pipeline import county_tile_assign
from biomass_processing_pipeline_spark.queries import (
    q_cell_index,
    q_dim_join,
    q_pricing_summary,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def _plan(df, execute: bool = False) -> str:
    if execute:  # AQE final plan (codegen markers) only exists post-run
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_fused_assign_is_map_only_and_broadcast(spark, smoke_dir):
    """The tiling fast path must be: broadcast join, zero exchanges, zero
    Python evals."""
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    counties = pd.read_parquet(f"{smoke_dir}/counties.parquet")
    tiles = pd.read_parquet(f"{smoke_dir}/tiles.parquet")
    out = county_tile_assign(spark, fp, counties, tiles)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    # Python appears only for the footprint offset UDF (Catalyst may split
    # it into two ArrowEvalPython projections) — never a ray-cast eval
    assert plan.count("ArrowEvalPython") <= 2
    assert "_refine" not in plan and "points_in_polygon" not in plan


def test_cell_index_is_pure_codegen(spark):
    """Morton cell ids must stay inside whole-stage codegen (no UDF)."""
    plan = _plan(q_cell_index(spark, "/root/testdata/sf0.001"), execute=True)
    assert "Python" not in plan
    assert "*(1)" in plan  # star = whole-stage-codegen'd stage


def test_filter_pushdown_reaches_parquet(spark):
    """Predicate pushdown: the quantity filter must reach the parquet scan."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 45.0).select("l_orderkey")
    plan = _plan(q)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_parquet(spark):
    """A 2-col projection must not read the whole lineitem schema."""
    plan = _plan(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # unused column pruned
    assert "l_quantity" in read_schema


def test_dim_join_broadcasts(spark):
    plan = _plan(q_dim_join(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 2  # nation AND region


def test_images_bytes_never_read_for_assignment(spark, smoke_dir):
    """The headline job must scan only image_id from the images table."""
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    counties = pd.read_parquet(f"{smoke_dir}/counties.parquet")
    tiles = pd.read_parquet(f"{smoke_dir}/tiles.parquet")
    plan = _plan(county_tile_assign(spark, fp, counties, tiles))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema and "caption" not in read_schema


def test_utm_mgrs_queries_are_pure_codegen(spark):
    """The coordinate-transform scalar surface must be JVM-only: the
    Snyder series and MGRS letter math run as native column expressions,
    never Python."""
    from biomass_processing_pipeline_spark.queries import (
        q_mgrs_squares,
        q_utm_transform,
    )

    for q in (q_utm_transform, q_mgrs_squares):
        plan = _plan(q(spark, "/root/testdata/sf0.001"))
        assert "Python" not in plan and "ArrowEval" not in plan


def test_phash_dedup_plan_slim_scan_no_cartesian(spark, smoke_dir):
    """The phash dedup query must (a) scan ONLY (image_id, phash) from the
    images table — never the binary blobs, (b) contain no cartesian
    product (banding keeps the self-join an equi-join), and (c) run its
    connected components as exactly one grouped Arrow pass (the scoped
    union-find), not an iterative join loop."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        scoped_components,
    )
    from biomass_processing_pipeline_spark.queries import q_phash_dedup

    plan = _plan(q_phash_dedup(spark, "/root/testdata/sf0.001"))
    for rs in plan.split("ReadSchema:")[1:]:
        line = rs.splitlines()[0]
        assert "bytes" not in line and "caption" not in line
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the labeled sig table is checkpointed, so the banding join + CC run
    # once (behind Scan ExistingRDD), never once per consuming branch
    assert plan.count("FlatMapGroupsInPandas") == 0
    assert "Scan ExistingRDD" in plan
    # the CC itself is ONE grouped Arrow union-find pass, no join loop
    pairs = spark.createDataFrame(
        pd.DataFrame({"t": ["A"], "id_a": ["x"], "id_b": ["y"]})
    )
    cc_plan = _plan(scoped_components(pairs, "t"))
    assert cc_plan.count("FlatMapGroupsInPandas") == 1
    assert "Join" not in cc_plan
