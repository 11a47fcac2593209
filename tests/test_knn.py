import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.knn import (
    distance_weighted_agg,
    knn_join,
)
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint


def _points(spark, smoke_dir, n=200):
    images = with_footprint(load_images(spark, smoke_dir).select("image_id"))
    gold_ids = (
        pd.read_parquet(f"{smoke_dir}/golden_knn.parquet")["image_id"].unique()[:n]
    )
    ids_df = spark.createDataFrame(pd.DataFrame({"image_id": gold_ids}))
    return images.join(F.broadcast(ids_df), "image_id")


def test_knn_matches_bruteforce_golden(spark, smoke_dir):
    points = _points(spark, smoke_dir)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    got = knn_join(points, plots, k=50).toPandas()
    gold = pd.read_parquet(f"{smoke_dir}/golden_knn.parquet")
    g = got.sort_values(["image_id", "rank"]).reset_index(drop=True)
    e = gold.sort_values(["image_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g.image_id == e.image_id).all()
    assert (g.plot_cn == e.plot_cn).all()
    assert np.allclose(g.distance, e.distance, atol=1e-12)


def test_distance_weighted_agg_matches_manual(spark, smoke_dir):
    points = _points(spark, smoke_dir, n=20)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    knn = knn_join(points, plots, k=10)
    agg = distance_weighted_agg(knn, plots, ["attr_1", "attr_2"]).toPandas()
    kpdf = knn.toPandas().merge(
        pd.read_parquet(f"{smoke_dir}/plots.parquet"), on="plot_cn"
    )
    for _, row in agg.iterrows():
        sub = kpdf[kpdf.image_id == row.image_id]
        w = 1.0 / (sub.distance + 0.01)
        assert abs(row.w_attr_1 - (w * sub.attr_1).sum() / w.sum()) < 1e-9
        assert abs(row.w_attr_2 - (w * sub.attr_2).sum() / w.sum()) < 1e-9
        assert row.n_neighbors == 10


def test_knn_distributed_path_matches_golden(spark, smoke_dir):
    """local_index_threshold=0 forces the exploded-ring broadcast plan —
    it must stay exact vs the same brute-force golden now that the local
    grid index is the default."""
    points = _points(spark, smoke_dir)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    got = knn_join(points, plots, k=50, local_index_threshold=0).toPandas()
    gold = pd.read_parquet(f"{smoke_dir}/golden_knn.parquet")
    g = got.sort_values(["image_id", "rank"]).reset_index(drop=True)
    e = gold.sort_values(["image_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g.plot_cn == e.plot_cn).all()
    assert np.allclose(g.distance, e.distance, atol=1e-12)


def test_knn_local_plan_is_map_only(spark, smoke_dir):
    """The default local-grid-index plan must be a single mapInPandas over
    the points: no join, no Exchange, no per-candidate rows."""
    points = _points(spark, smoke_dir, n=50)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet")
    df = knn_join(points.localCheckpoint(), plots, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan.replace("MapInPandas", "")


def test_knn_local_escalation_and_small_target_sets(spark):
    """Ring escalation + brute-force backstop: clustered targets with a
    far outlier point (phase-1 completeness fails), and k > n_targets
    (every point must get all targets). Exact vs in-test brute force."""
    import itertools

    rng = np.random.default_rng(3)
    # targets clustered near (0, 0); density sizing will pick a small disc
    t = pd.DataFrame({
        "plot_cn": np.arange(400, dtype=np.int64),
        "lon": rng.uniform(-1, 1, 400),
        "lat": rng.uniform(-1, 1, 400),
    })
    # points: in-cluster + far outliers (10 deg away -> escalation/brute)
    p = pd.DataFrame({
        "image_id": [f"p{i:02d}" for i in range(30)],
        "lon": np.concatenate([rng.uniform(-1, 1, 20), rng.uniform(9, 11, 10)]),
        "lat": np.concatenate([rng.uniform(-1, 1, 20), rng.uniform(9, 11, 10)]),
    })
    for k in (7, 500):  # 500 > n_targets: everyone gets all 400
        got = knn_join(
            spark.createDataFrame(p), spark.createDataFrame(t), k=k
        ).toPandas().sort_values(["image_id", "rank"]).reset_index(drop=True)
        rows = []
        for r in p.itertuples(index=False):
            # golden uses the engine-wide sqrt(dx*dx + dy*dy) form so a
            # rank flip from a formula drift (e.g. hypot's 1-ulp licence)
            # is detectable, not absorbed by the tolerance
            dxg = t.lon.to_numpy() - r.lon
            dyg = t.lat.to_numpy() - r.lat
            d = np.sqrt(dxg * dxg + dyg * dyg)
            order = np.lexsort((t.plot_cn.to_numpy(), d))[:k]
            for rk, oi in enumerate(order):
                rows.append((r.image_id, int(t.plot_cn[oi]), float(d[oi]), rk + 1))
        exp = pd.DataFrame(
            rows, columns=["image_id", "plot_cn", "distance", "rank"]
        ).sort_values(["image_id", "rank"]).reset_index(drop=True)
        assert len(got) == len(exp) == len(p) * min(k, len(t))
        assert (got.plot_cn == exp.plot_cn).all()
        assert np.allclose(got.distance, exp.distance, atol=1e-12)


def test_knn_local_partitioning_independent(spark):
    """Same results at 1 and 13 point partitions (the batch boundary must
    not affect the top-k)."""
    rng = np.random.default_rng(5)
    t = spark.createDataFrame(pd.DataFrame({
        "plot_cn": np.arange(300, dtype=np.int64),
        "lon": rng.uniform(-3, 3, 300), "lat": rng.uniform(-3, 3, 300),
    }))
    p = pd.DataFrame({
        "image_id": [f"q{i:03d}" for i in range(97)],
        "lon": rng.uniform(-3, 3, 97), "lat": rng.uniform(-3, 3, 97),
    })
    outs = []
    for nparts in (1, 13):
        df = spark.createDataFrame(p).repartition(nparts)
        outs.append(
            knn_join(df, t, k=9).toPandas()
            .sort_values(["image_id", "rank"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])



def test_knn_empty_targets(spark):
    """Zero targets -> zero result rows with the correct schema (the bbox
    stats are NULL and must not reach the density arithmetic)."""
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.knn import (
        knn_join, knn_weighted_agg_fused,
    )

    pts = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "b"], "lon": [0.0, 1.0], "lat": [0.0, 1.0],
    }))
    tgts = spark.createDataFrame(
        [], "plot_cn long, lon double, lat double, attr_1 double")
    j = knn_join(pts, tgts, k=3)
    assert j.count() == 0
    assert [f.name for f in j.schema] == [
        "image_id", "plot_cn", "distance", "rank"]
    a = knn_weighted_agg_fused(pts, tgts, ["attr_1"], k=3)
    assert a.count() == 0
    assert [f.name for f in a.schema] == [
        "image_id", "sum_w", "n_neighbors", "w_attr_1"]


def test_knn_null_nan_coords_dropped(spark):
    """NULL/NaN coordinates (what a quarantined footprint produces) must
    drop from BOTH sides of every plan — not clamp into cell 0 via
    greatest()'s NULL-skip or poison the numpy top-k with NaN distances.
    Valid rows are unaffected (exact vs in-test brute force)."""
    from biomass_processing_pipeline_spark.operators.knn import (
        knn_weighted_agg_fused,
    )

    rng = np.random.default_rng(11)
    t = pd.DataFrame({
        "plot_cn": np.arange(50, dtype=np.int64),
        "lon": rng.uniform(-1, 1, 50), "lat": rng.uniform(-1, 1, 50),
        "attr_1": rng.uniform(0, 9, 50),
    })
    # two poisoned targets: NULL lon, NaN lat
    t_bad = pd.concat([t, pd.DataFrame({
        "plot_cn": [900, 901], "lon": [None, 0.0], "lat": [0.0, np.nan],
        "attr_1": [1.0, 1.0],
    })], ignore_index=True)
    p = pd.DataFrame({
        "image_id": [f"p{i}" for i in range(10)],
        "lon": rng.uniform(-1, 1, 10), "lat": rng.uniform(-1, 1, 10),
    })
    p_bad = pd.concat([p, pd.DataFrame({
        "image_id": ["bad_null", "bad_nan"],
        "lon": [None, np.nan], "lat": [0.0, 0.0],
    })], ignore_index=True)
    tdf = spark.createDataFrame(t_bad)
    pdfs = spark.createDataFrame(p_bad)
    for kwargs in ({}, {"local_index_threshold": 0}):  # both plans
        got = (knn_join(pdfs, tdf, k=5, **kwargs).toPandas()
               .sort_values(["image_id", "rank"]).reset_index(drop=True))
        assert not set(got.image_id) & {"bad_null", "bad_nan"}
        assert not set(got.plot_cn) & {900, 901}
        rows = []
        for r in p.itertuples(index=False):
            dx = t.lon.to_numpy() - r.lon
            dy = t.lat.to_numpy() - r.lat
            d = np.sqrt(dx * dx + dy * dy)
            order = np.lexsort((t.plot_cn.to_numpy(), d))[:5]
            for rk, oi in enumerate(order):
                rows.append((r.image_id, int(t.plot_cn[oi]), rk + 1))
        exp = pd.DataFrame(rows, columns=["image_id", "plot_cn", "rank"]) \
            .sort_values(["image_id", "rank"]).reset_index(drop=True)
        assert (got.plot_cn == exp.plot_cn).all()
    # fused path: same gate
    agg = knn_weighted_agg_fused(pdfs, tdf, ["attr_1"], k=5).toPandas()
    assert not set(agg.image_id) & {"bad_null", "bad_nan"}
    assert len(agg) == len(p)
