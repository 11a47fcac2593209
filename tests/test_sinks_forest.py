import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.forest import (
    harvest_probability,
    weighted_mode,
    weighted_stand_age,
)
from biomass_processing_pipeline_spark.operators.knn import knn_join
from biomass_processing_pipeline_spark.sources.images import load_images, with_footprint
from biomass_processing_pipeline_spark.sources.sinks import (
    append_detail,
    upsert_parquet,
    write_csv,
)


def test_upsert_semantics(spark):
    out = tempfile.mkdtemp(prefix="bpp_upsert_") + "/t"
    try:
        v1 = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
        )
        assert upsert_parquet(spark, v1, out, ["k"]) == 3
        v2 = spark.createDataFrame(
            pd.DataFrame({"k": [2, 4], "v": ["B", "d"]})
        )
        assert upsert_parquet(spark, v2, out, ["k"]) == 4
        got = {
            r.k: r.v for r in spark.read.parquet(out).collect()
        }
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}  # 2 updated, 4 inserted
    finally:
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)


def _partition_files(root):
    """{bucket_dir: {relpath: (inode, mtime_ns, size)}} for every _ub=* dir."""
    import os

    out = {}
    for d in os.listdir(root):
        if not d.startswith("_ub="):
            continue
        files = {}
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            for n in names:
                p = os.path.join(dirpath, n)
                st = os.stat(p)
                files[os.path.relpath(p, root)] = (
                    st.st_ino, st.st_mtime_ns, st.st_size,
                )
        out[d] = files
    return out


def test_upsert_rewrites_only_touched_buckets(spark):
    """Partition-pruned upsert: buckets not hit by the batch's keys keep
    byte-identical files (same inode — never rewritten, moved, or even
    re-opened for write)."""
    import pyspark.sql.functions as SF

    from biomass_processing_pipeline_spark.sources.sinks import (
        UPSERT_BUCKET_COL, read_upsert_parquet,
    )

    base = tempfile.mkdtemp(prefix="bpp_upsert_prune_")
    out = base + "/t"
    try:
        v1 = spark.range(0, 200).select(
            SF.col("id").alias("k"), (SF.col("id") * 10).alias("v")
        )
        assert upsert_parquet(spark, v1, out, ["k"], n_buckets=16) == 200
        before = _partition_files(out)
        assert len(before) == 16  # all buckets materialized

        v2 = spark.createDataFrame(
            pd.DataFrame({"k": [3, 7, 500], "v": [-3, -7, -500]})
        )
        assert upsert_parquet(spark, v2, out, ["k"]) == 201
        after = _partition_files(out)

        touched = {
            f"{UPSERT_BUCKET_COL}={r[0]}"
            for r in v2.select(
                SF.pmod(SF.xxhash64("k"), SF.lit(16)).cast("int")
            ).distinct().collect()
        }
        assert 1 <= len(touched) <= 3
        for d, files in before.items():
            if d in touched:
                assert after[d] != files  # rewritten
            else:
                assert after[d] == files, f"untouched bucket {d} was rewritten"

        got = {r.k: r.v for r in read_upsert_parquet(spark, out).collect()}
        expect = {k: k * 10 for k in range(200)}
        expect.update({3: -3, 7: -7, 500: -500})
        assert got == expect
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_csv_and_detail_sinks(spark, smoke_dir):
    base = tempfile.mkdtemp(prefix="bpp_sink_")
    try:
        df = spark.createDataFrame(
            pd.DataFrame({
                "image_id": ["i1", "i2"], "fips": ["17000", "17001"],
                "area_acres": [1.5, 2.5], "extra": [0, 1],
            })
        )
        write_csv(df, f"{base}/csv")
        back = spark.read.option("header", True).csv(f"{base}/csv")
        assert back.count() == 2
        assert "extra" not in back.columns  # stable projection
        append_detail(df, f"{base}/detail")
        append_detail(df, f"{base}/detail")
        assert spark.read.parquet(f"{base}/detail").count() == 4
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_forest_weighted_aggs(spark, smoke_dir):
    fp = with_footprint(load_images(spark, smoke_dir).select("image_id")).limit(30)
    plots = spark.read.parquet(f"{smoke_dir}/plots.parquet").withColumn(
        "forest_type", (F.col("plot_cn") % 4).cast("int")
    ).withColumn("age", F.col("attr_2")).withColumn(
        "prob", F.col("attr_3")
    )
    knn = knn_join(fp, plots, k=10)
    kpdf = knn.toPandas().merge(plots.toPandas(), on="plot_cn")
    kpdf["w"] = 1.0 / (kpdf.distance + 0.01)

    mode = weighted_mode(knn, plots, "forest_type").toPandas().set_index("image_id")
    age = weighted_stand_age(knn, plots, "age").toPandas().set_index("image_id")
    prob = harvest_probability(knn, plots, "prob").toPandas().set_index("image_id")
    for img, grp in kpdf.groupby("image_id"):
        by_type = grp.groupby("forest_type").w.sum()
        best = by_type[by_type == by_type.max()].index.min()
        assert mode.loc[img, "dominant_type"] == best
        assert abs(age.loc[img, "stand_age"] - (grp.w * grp.age).sum() / grp.w.sum()) < 1e-5
        expect = min(0.95, (grp.w * grp.prob).sum() / grp.w.sum() + 0.1)
        assert abs(prob.loc[img, "harvest_prob"] - expect) < 1e-5


def test_reference_decimal_cast_parity(spark, smoke_dir):
    """Sink-boundary NUMERIC(p,s) shim (database_manager_v3.py:669-695):
    every matched double lands in the reference's declared decimal type,
    values round to the declared scale (half-up, ANSI-safe in range),
    unmatched columns keep their engine type."""
    import decimal

    from biomass_processing_pipeline_spark.sources.sinks import (
        cast_reference_decimals, reference_decimal_schema,
    )
    from biomass_processing_pipeline_spark.workflow import biomass_result_table

    df = biomass_result_table(spark, smoke_dir, k_neighbors=10).limit(100)
    out = cast_reference_decimals(df)
    schema = reference_decimal_schema(df.columns)
    assert {"ndvi_mean", "standing_biomass_tons", "confidence_score"} <= set(schema)
    got = dict(out.dtypes)
    for c, (p, s) in schema.items():
        assert got[c] == f"decimal({p},{s})", (c, got[c])
    # untouched columns keep engine types
    assert got["image_id"] == dict(df.dtypes)["image_id"]
    # value parity: decimal == double rounded at the declared scale
    pdf = out.select("image_id", "ndvi_mean", "confidence_score").toPandas()
    src = df.select("image_id", "ndvi_mean", "confidence_score").toPandas()
    m = pdf.merge(src, on="image_id", suffixes=("_d", "_f"))
    for c, s in (("ndvi_mean", 4), ("confidence_score", 3)):
        err = (m[f"{c}_d"].astype(float) - m[f"{c}_f"]).abs()
        assert (err <= 0.5 * 10.0 ** -s + 1e-12).all(), c
        assert all(isinstance(v, decimal.Decimal) for v in pdf[c].head(3))


def test_upsert_intra_batch_last_wins(spark):
    """A batch carrying the same key twice must apply the reference's
    rows-in-order rule (database_manager_v3.py:789-792): with seq_col the
    max-seq row wins; without it the ambiguity raises instead of silently
    keeping both rows."""
    import pytest

    base = tempfile.mkdtemp(prefix="bpp_upsert_lw_")
    out = base + "/t"
    try:
        v1 = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
        )
        upsert_parquet(spark, v1, out, ["k"])
        dup = spark.createDataFrame(pd.DataFrame({
            "k": [2, 2, 3], "v": ["first", "last", "c"], "seq": [1, 2, 1],
        }))
        assert upsert_parquet(spark, dup, out, ["k"], seq_col="seq") == 3
        got = {r.k: r.v for r in spark.read.parquet(out).collect()}
        assert got == {1: "a", 2: "last", 3: "c"}
        assert "seq" not in spark.read.parquet(out).drop("_ub").columns

        with pytest.raises(ValueError, match="duplicate keys"):
            upsert_parquet(spark, dup.drop("seq"), out, ["k"])

        # NULL key: unreachable by keep-latest (equality never matches
        # NULL) — must raise loudly, matching the reference's NOT NULL PK
        nullk = spark.createDataFrame(
            pd.DataFrame({"k": [4, None], "v": ["d", "ghost"]})
        )
        with pytest.raises(ValueError, match="NULL in key"):
            upsert_parquet(spark, nullk, out, ["k"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_upsert_crash_mid_swap_repair(spark):
    """Kill the swap between two bucket renames (simulated via an
    os.rename that fails after the first call): the _PENDING marker must
    make the next read roll the batch FORWARD to the committed state."""
    import os

    import pytest

    from biomass_processing_pipeline_spark.sources import sinks
    from biomass_processing_pipeline_spark.sources.sinks import (
        read_upsert_parquet,
    )

    base = tempfile.mkdtemp(prefix="bpp_upsert_crash_")
    out = base + "/t"
    try:
        v1 = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        upsert_parquet(spark, v1, out, ["k"], n_buckets=8)
        # batch touching several buckets
        v2 = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 3, 4, 5, 200], "v": [-1] * 6})
        )
        real_rename = os.rename
        calls = {"n": 0}

        def flaky_rename(src, dst):
            if f"{sinks.UPSERT_BUCKET_COL}=" in os.path.basename(src):
                calls["n"] += 1
                if calls["n"] > 1:
                    raise OSError("simulated crash mid-swap")
            return real_rename(src, dst)

        os.rename = flaky_rename
        try:
            with pytest.raises(OSError, match="simulated crash"):
                upsert_parquet(spark, v2, out, ["k"])
        finally:
            os.rename = real_rename
        assert calls["n"] > 1  # the crash really hit mid-loop
        assert os.path.exists(os.path.join(out, "_PENDING.json"))
        # reader repairs: rolls the remaining renames forward
        got = {r.k: r.v for r in read_upsert_parquet(spark, out).collect()}
        expect = {k: k * 10 for k in range(100)}
        expect.update({k: -1 for k in [1, 2, 3, 4, 5, 200]})
        assert got == expect
        assert not os.path.exists(os.path.join(out, "_PENDING.json"))
        assert not os.path.exists(out + "._staged")
        # the in-process failure path must have released the swap lock
        # (a real process kill leaves it; _swap_lock times out loudly)
        assert not os.path.exists(os.path.join(out, "_SWAP.lock"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_upsert_create_is_atomic(spark):
    """A crash during the FIRST batch's write must not leave a torn,
    marker-less table that readers would serve as valid data (or whose
    missing _upsert_meta.json kills the next batch): the create is staged
    and committed by one directory rename, so the path either doesn't
    exist or holds the complete table + meta."""
    import os

    import pytest

    from biomass_processing_pipeline_spark.sources import sinks

    base = tempfile.mkdtemp(prefix="bpp_upsert_create_")
    out = base + "/t"
    try:
        v1 = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        real_rename = os.rename

        def flaky_rename(src, dst):
            if src.endswith("._create_staged"):
                raise OSError("simulated crash at create commit")
            return real_rename(src, dst)

        os.rename = flaky_rename
        try:
            with pytest.raises(OSError, match="create commit"):
                upsert_parquet(spark, v1, out, ["k"], n_buckets=8)
        finally:
            os.rename = real_rename
        assert not os.path.exists(out)  # no torn table visible
        # retry commits the complete table (meta included) atomically
        n = upsert_parquet(spark, v1, out, ["k"], n_buckets=8)
        assert n == 50
        assert os.path.exists(os.path.join(out, "_upsert_meta.json"))
        got = {r.k: r.v for r in
               sinks.read_upsert_parquet(spark, out).collect()}
        assert got == {k: k * 10 for k in range(50)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_swap_lock_times_out_loudly_on_stale_holder():
    """A dead process's leftover _SWAP.lock must not hang readers forever:
    acquisition times out with removal guidance; after removal the lock
    is acquirable again."""
    import os

    import pytest

    from biomass_processing_pipeline_spark.sources.sinks import _swap_lock

    base = tempfile.mkdtemp(prefix="bpp_swap_lock_")
    try:
        open(os.path.join(base, "_SWAP.lock"), "w").close()  # stale holder
        with pytest.raises(RuntimeError, match="remove the lock file"):
            with _swap_lock(base, timeout_s=0.2):
                pass
        os.remove(os.path.join(base, "_SWAP.lock"))
        with _swap_lock(base, timeout_s=0.2):
            assert os.path.exists(os.path.join(base, "_SWAP.lock"))
        assert not os.path.exists(os.path.join(base, "_SWAP.lock"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_upsert_randomized_batch_sequences_match_reference(spark):
    """Randomized S7 stress: apply 5 random batches (overlapping keys,
    intra-batch seq conflicts, varying bucket touch sets) and compare the
    table after EVERY batch against a pandas keep-latest reference that
    applies rows strictly in (batch, seq) order — the reference's
    execute_values ON CONFLICT DO UPDATE semantics
    (database_manager_v3.py:727-792). Seeded: failures reproduce."""
    import numpy as np

    from biomass_processing_pipeline_spark.sources.sinks import (
        read_upsert_parquet,
    )

    rng = np.random.default_rng(20260818)
    out = tempfile.mkdtemp(prefix="bpp_upsert_fuzz_") + "/t"
    try:
        ref: dict[int, tuple] = {}
        for bi in range(5):
            n = int(rng.integers(5, 40))
            keys = rng.integers(0, 30, size=n)  # dense -> real conflicts
            batch = pd.DataFrame({
                "k": keys.astype("int64"),
                "v": (keys * 100 + bi).astype("int64"),
                "tag": [f"b{bi}r{i}" for i in range(n)],
                "seq": np.arange(n, dtype="int64"),  # row order in batch
            })
            upsert_parquet(
                spark, spark.createDataFrame(batch), out, ["k"],
                n_buckets=8, seq_col="seq",
            )
            for r in batch.itertuples(index=False):  # in-order reference
                ref[int(r.k)] = (int(r.v), r.tag)
            got = read_upsert_parquet(spark, out).toPandas()
            exp = pd.DataFrame(
                [(k, v, t) for k, (v, t) in sorted(ref.items())],
                columns=["k", "v", "tag"],
            )
            g = got.sort_values("k").reset_index(drop=True)[["k", "v", "tag"]]
            assert len(g) == len(exp), f"batch {bi}: row count"
            pd.testing.assert_frame_equal(
                g.astype({"k": "int64", "v": "int64"}), exp,
            )
    finally:
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)
