import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.knn import (
    distance_weighted_agg,
    knn_join,
    knn_weighted_agg_fused,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def test_fused_equals_unfused(spark, smoke_dir):
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id")).limit(150)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    unfused = distance_weighted_agg(
        knn_join(fp, plots, k=10), plots, ["attr_1", "attr_2"]
    ).toPandas().set_index("image_id").sort_index()
    fused = knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=10
    ).toPandas().set_index("image_id").sort_index()
    assert len(fused) == len(unfused) == 150
    assert (fused.n_neighbors == unfused.n_neighbors).all()
    assert np.allclose(fused.sum_w, unfused.sum_w, rtol=1e-12)
    assert np.allclose(fused.w_attr_1, unfused.w_attr_1, rtol=1e-12)
    assert np.allclose(fused.w_attr_2, unfused.w_attr_2, rtol=1e-12)


def test_fused_mode_attr_parity(spark, smoke_dir):
    """mode_attr folds the A6 weighted mode into the fused pass via the
    two-level (point, cat) aggregation: the mode must equal the standalone
    weighted_mode over the unfused kNN pairs, and the weighted means must
    be unchanged from the attrs-only fused output."""
    from biomass_processing_pipeline_spark.operators.forest import weighted_mode

    fp = with_footprint(load_images(spark, smoke_dir).select("image_id")).limit(150)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet").withColumn(
        "ftype", (F.col("plot_cn") % 4).cast("int")
    )
    fused = knn_weighted_agg_fused(
        fp, plots, ["attr_1"], k=10, mode_attr="ftype"
    ).toPandas().set_index("image_id").sort_index()
    plain = knn_weighted_agg_fused(
        fp, plots, ["attr_1"], k=10
    ).toPandas().set_index("image_id").sort_index()
    ref_mode = weighted_mode(
        knn_join(fp, plots, k=10), plots, "ftype"
    ).toPandas().set_index("image_id").sort_index()
    assert (fused.mode_ftype == ref_mode.dominant_type).all()
    assert (fused.n_neighbors == plain.n_neighbors).all()
    assert np.allclose(fused.sum_w, plain.sum_w, rtol=1e-12)
    assert np.allclose(fused.w_attr_1, plain.w_attr_1, rtol=1e-9)


def test_fused_shuffle_fallback_parity(spark, smoke_dir):
    """All three physical plans must agree: the default local-grid-index
    map-only path, the exploded-ring broadcast join
    (local_index_threshold=0), and the shuffle-join + window OOM guard
    (broadcast_threshold=0 as well)."""
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id")).limit(120)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    local = knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=10
    ).toPandas().set_index("image_id").sort_index()
    bcast = knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=10, local_index_threshold=0
    ).toPandas().set_index("image_id").sort_index()
    shuffled = knn_weighted_agg_fused(
        fp, plots, ["attr_1", "attr_2"], k=10, broadcast_threshold=0,
        local_index_threshold=0,
    ).toPandas().set_index("image_id").sort_index()
    assert len(shuffled) == len(bcast) == len(local) == 120
    for other in (bcast, shuffled):
        assert (other.n_neighbors == local.n_neighbors).all()
        assert np.allclose(other.sum_w, local.sum_w, rtol=1e-12)
        assert np.allclose(other.w_attr_1, local.w_attr_1, rtol=1e-12)
        assert np.allclose(other.w_attr_2, local.w_attr_2, rtol=1e-12)


def test_fused_null_attr_and_cat_parity(spark, smoke_dir):
    """NULL target attrs / mode categories: one rule, every plan. A NULL
    attr contributes nothing to the weighted-mean numerator while its
    weight stays in the denominator (all-NULL top-k -> NULL mean, never
    NaN or 0/sum_w); a NULL category never wins the vote (all-NULL ->
    NULL mode). The local-index kernel and the distributed two-level agg
    must return the SAME rows."""
    fp = with_footprint(
        load_images(spark, smoke_dir).select("image_id")
    ).limit(120)
    plots = (
        spark.read.parquet(f"{smoke_dir}/plots.parquet")
        # 1/7 of attrs non-NULL -> a decent share of points see an
        # all-NULL top-10; 1/2 of categories NULL
        .withColumn("attr_1", F.when(F.col("plot_cn") % 7 == 0,
                                     F.col("attr_1")))
        .withColumn("ftype", F.when(F.col("plot_cn") % 2 == 0,
                                    (F.col("plot_cn") % 4).cast("int")))
    )
    kw = dict(attrs=["attr_1"], k=10, mode_attr="ftype")
    local = knn_weighted_agg_fused(fp, plots, **kw).toPandas() \
        .set_index("image_id").sort_index()
    dist = knn_weighted_agg_fused(
        fp, plots, local_index_threshold=0, **kw
    ).toPandas().set_index("image_id").sort_index()
    assert len(local) == len(dist) == 120
    assert (local.n_neighbors == dist.n_neighbors).all()
    assert np.allclose(local.sum_w, dist.sum_w, rtol=1e-12)
    # NaN (<- SQL NULL) must line up exactly, values tightly
    assert (local.w_attr_1.isna() == dist.w_attr_1.isna()).all()
    assert local.w_attr_1.isna().any(), "fixture should produce all-NULL points"
    m = ~local.w_attr_1.isna()
    assert np.allclose(local.w_attr_1[m], dist.w_attr_1[m], rtol=1e-12)
    assert (local.mode_ftype.isna() == dist.mode_ftype.isna()).all()
    mm = ~local.mode_ftype.isna()
    assert (local.mode_ftype[mm] == dist.mode_ftype[mm]).all()
    # NULL never wins: every non-null mode is an even plot_cn's category
    assert set(local.mode_ftype[mm].unique()) <= {0.0, 1.0, 2.0, 3.0}


def test_fused_nan_attr_parity(spark, smoke_dir):
    """A stored NaN attr/category is the SAME unknown as SQL NULL, in
    every plan: the local-index kernel's isnan mask cannot distinguish
    them, and the distributed plans normalize NaN -> NULL before F.sum
    (which skips NULL but would PROPAGATE NaN) and before the mode vote.
    Mixed top-k (some NaN, some valid neighbors) is the discriminating
    case: the unknown drops from the numerator while its weight stays in
    the denominator, so both plans must return the same FINITE mean —
    an unfixed fallback plan would return NaN there."""
    fp = with_footprint(
        load_images(spark, smoke_dir).select("image_id")
    ).limit(120)
    nan = F.lit(float("nan"))
    plots = (
        spark.read.parquet(f"{smoke_dir}/plots.parquet")
        # 1/5 of attrs NaN, 1/7 NULL, rest real -> most points see a
        # mixed top-10; float category NaN on 1/3 of plots
        .withColumn("attr_1", F.when(F.col("plot_cn") % 5 == 0, nan)
                    .when(F.col("plot_cn") % 7 == 0, F.lit(None))
                    .otherwise(F.col("attr_1")))
        .withColumn("ftype", F.when(F.col("plot_cn") % 3 == 0, nan)
                    .otherwise((F.col("plot_cn") % 4).cast("double")))
    )
    kw = dict(attrs=["attr_1"], k=10, mode_attr="ftype")
    local = knn_weighted_agg_fused(fp, plots, **kw).toPandas() \
        .set_index("image_id").sort_index()
    dist = knn_weighted_agg_fused(
        fp, plots, local_index_threshold=0, **kw
    ).toPandas().set_index("image_id").sort_index()
    assert len(local) == len(dist) == 120
    assert (local.n_neighbors == dist.n_neighbors).all()
    assert np.allclose(local.sum_w, dist.sum_w, rtol=1e-12)
    # the discriminator: points with >=1 valid neighbor attr must be
    # FINITE in both plans (NaN propagation would make dist NaN == isna)
    assert (local.w_attr_1.isna() == dist.w_attr_1.isna()).all()
    m = ~local.w_attr_1.isna()
    assert m.any(), "fixture should produce points with valid neighbors"
    assert np.isfinite(dist.w_attr_1[m]).all()
    assert np.allclose(local.w_attr_1[m], dist.w_attr_1[m], rtol=1e-12)
    # NaN categories never win the vote, in either plan
    assert (local.mode_ftype.isna() == dist.mode_ftype.isna()).all()
    mm = ~local.mode_ftype.isna()
    assert (local.mode_ftype[mm] == dist.mode_ftype[mm]).all()
    assert not np.isnan(local.mode_ftype[mm].to_numpy(float)).any()
    # the standalone A5/A6 relational ops apply the same rule
    knn10 = knn_join(fp, plots, k=10)
    dw = distance_weighted_agg(knn10, plots, ["attr_1"]).toPandas() \
        .set_index("image_id").sort_index()
    assert (dw.w_attr_1.isna() == local.w_attr_1.isna()).all()
    assert np.allclose(dw.w_attr_1[m], local.w_attr_1[m], rtol=1e-12)


def test_nan_attrs_as_null_dtypes(spark):
    """The NaN->NULL select wrapper: float32 and double NaN become SQL
    NULL (real values untouched), non-float columns pass through
    unchanged (they cannot hold NaN)."""
    from biomass_processing_pipeline_spark.operators.knn import (
        nan_attrs_as_null,
    )

    df = spark.createDataFrame(
        [(1, float("nan"), float("nan"), 7), (2, 1.5, 2.5, 8)],
        "id long, d double, f float, i int",
    ).withColumn("f", F.col("f").cast("float"))
    out = df.select("id", *nan_attrs_as_null(df, ["d", "f", "i"])) \
        .toPandas().set_index("id").sort_index()
    assert out.loc[1].isna().d and out.loc[1].isna().f
    assert out.loc[2].d == 1.5 and out.loc[2].f == 2.5
    assert out.i.tolist() == [7, 8]
    # schema preserved: float stays float, int stays int
    typed = dict(df.select(*nan_attrs_as_null(df, ["d", "f", "i"])).dtypes)
    assert typed == {"d": "double", "f": "float", "i": "int"}
