import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    train_centroids,
)


def _emb(spark, sf_dir="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_matches_numpy_oracle(spark):
    emb = _emb(spark)
    pdf = emb.toPandas()
    m = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    norms = np.linalg.norm(m, axis=1)
    q = emb.where(F.col("vec_id") % 100 == 0)
    got = brute_force_topk(emb, q, k=5).toPandas()
    for qid in got.query_id.unique():
        qi = np.where(ids == qid)[0][0]
        cos = np.round((m @ m[qi]) / (norms * norms[qi]), 6)
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))[:5]
        expect = ids[order]
        sub = got[got.query_id == qid].sort_values("rank")
        assert (sub.target_id.to_numpy() == expect).all()


def test_brute_force_matmul_and_crossjoin_plans_identical(spark):
    """The broadcast-matmul fast path and the crossJoin+window fallback
    (pinned via broadcast_elems=0) must return IDENTICAL rows — same
    neighbors, same rounded cosines, same ranks — on the driver fixture
    and on a corpus with heavy cosine ties (duplicate vectors, where the
    rounded-cosine/id tiebreak does real work)."""
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)

    def norm(df):
        return (
            df.toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    fast = norm(brute_force_topk(emb, q, k=5))
    slow = norm(brute_force_topk(emb, q, k=5, broadcast_elems=0))
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow)

    # tie-heavy corpus: 3 distinct directions x many duplicates
    base = np.eye(3, 8) + 0.25
    rows = [(i, (base[i % 3] / np.linalg.norm(base[i % 3]))
             .astype(np.float32).tolist()) for i in range(30)]
    dup = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id",
                                                            "embedding"]))
    qd = dup.where(F.col("vec_id") < 6)
    fast = norm(brute_force_topk(dup, qd, k=4))
    slow = norm(brute_force_topk(dup, qd, k=4, broadcast_elems=0))
    assert (fast.groupby("query_id")["rank"].max() == 4).all()
    pd.testing.assert_frame_equal(fast, slow)

    # degenerate zero-norm vectors: cosine is undefined (0/0) — without
    # try_divide the crossJoin plan THROWS under Spark 4 ANSI mode (one
    # degenerate row killed the whole job); with it, a zero-norm TARGET
    # never ranks and a zero-norm QUERY yields zero rows; plans must agree
    rng = np.random.default_rng(11)
    zrows = [(i, rng.standard_normal(8).astype(np.float32).tolist())
             for i in range(10)]
    zrows.append((10, [0.0] * 8))  # zero-norm target
    zdf = spark.createDataFrame(pd.DataFrame(zrows, columns=["vec_id",
                                                             "embedding"]))
    zq = zdf.where(F.col("vec_id") >= 9)  # one real query + the zero query
    fast = norm(brute_force_topk(zdf, zq, k=3))
    slow = norm(brute_force_topk(zdf, zq, k=3, broadcast_elems=0))
    pd.testing.assert_frame_equal(fast, slow)
    assert 10 not in fast.target_id.to_numpy()  # zero target never ranks
    assert 10 not in fast.query_id.to_numpy()  # zero query emits no rows
    assert set(fast.query_id.unique()) == {9}
    assert (fast[fast.query_id == 9]["rank"].to_numpy() == [1, 2, 3]).all()


def _planted(spark, n=300, dim=64, seed=7):
    """Clusters of genuinely-near vectors (cosine ~0.95) — the regime LSH
    is built for; the driver's embeddings are near-uniform (top cosine
    ~0.33), where no sublinear ANN can have high recall."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n // 3, dim))
    vecs = []
    for i in range(n):
        b = base[i % (n // 3)]
        v = b + 0.15 * rng.standard_normal(dim)
        vecs.append((i, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    return spark.createDataFrame(
        pd.DataFrame(vecs, columns=["vec_id", "embedding"])
    )


def test_lsh_recall_on_planted_clusters(spark):
    emb = _planted(spark)
    q = emb.where(F.col("vec_id") < 30)
    exact = brute_force_topk(emb, q, k=2).toPandas()
    approx = lsh_topk(emb, q, k=2, n_tables=8, n_bits=8).toPandas()
    e = {(r.query_id, r.target_id) for r in exact.itertuples()}
    a = {(r.query_id, r.target_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_lsh_plumbing_on_driver_table(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)
    approx = lsh_topk(emb, q, k=5, n_tables=16, n_bits=6).toPandas()
    assert approx.query_id.nunique() == q.count()
    assert (approx.groupby("query_id")["rank"].max() <= 5).all()


def test_ivf_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)
    cent = train_centroids(emb, n_centroids=8)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = ivf_topk(emb, q, cent, k=5, n_probe=4).toPandas()
    e = {(r.query_id, r.target_id) for r in exact.itertuples()}
    a = {(r.query_id, r.target_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_centroids_deterministic(spark):
    emb = _emb(spark)
    c1 = train_centroids(emb, n_centroids=4)
    c2 = train_centroids(emb, n_centroids=4)
    assert np.allclose(c1, c2)


def test_distributed_lloyd_recovers_planted_centers(spark):
    """The Spark-side trainer (hash-fraction sample, posexplode+avg
    update) must land centroids on well-separated planted cluster
    centers — and do so without any full-corpus collect."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 10.0
    rows = []
    for i in range(400):
        v = centers[i % 4] + 0.05 * rng.standard_normal(16)
        rows.append((i, v.astype(np.float32).tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    cent = train_centroids(emb, n_centroids=4, iters=6)
    # every planted center has a trained centroid within a fraction of the
    # inter-center distance
    for c in centers:
        d = np.linalg.norm(cent - c, axis=1).min()
        assert d < 1.0, d


def test_cosine_dup_pairs_exact_and_blocked(spark):
    """Planted near-duplicate embeddings: the exact path finds exactly the
    planted pairs; the LSH-blocked scale path recovers them (recall 1.0 on
    well-separated planted dups) without the quadratic cross join."""
    import numpy as np
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    rows = [(i, base[i].astype("float32").tolist()) for i in range(40)]
    # plant 5 near-dups: vec 100+i = vec i + tiny noise
    for i in range(5):
        v = base[i] + 0.01 * rng.standard_normal(64)
        rows.append((100 + i, v.astype("float32").tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))

    exact = cosine_dup_pairs(emb, threshold=0.95).toPandas()
    assert set(zip(exact.id_a, exact.id_b)) == {(i, 100 + i) for i in range(5)}
    blocked = cosine_dup_pairs(emb, threshold=0.95, blocked=True).toPandas()
    assert set(zip(blocked.id_a, blocked.id_b)) == {(i, 100 + i) for i in range(5)}
    # blocked plan must not contain a cartesian/nested-loop join
    plan = cosine_dup_pairs(emb, threshold=0.95, blocked=True)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_lsh_band_join_is_slim_single_pass(spark):
    """The 100 TB shape of the LSH joins: ONE signature Arrow pass per
    side (not n_tables, not a Catalyst-duplicated pair), and the banded
    candidate join carries only (id, table, bucket) — no embedding column
    rides the band exchange."""
    from pyspark.sql import functions as F

    from biomass_processing_pipeline_spark.operators.similarity import (
        _banded_slim, lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = lsh_topk(emb, emb.where(F.col("vec_id") % 25 == 0), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Python eval per side (query side + target side)
    assert plan.count("ArrowEvalPython") == 2
    assert "posexplode" in plan
    # the slim band table is 3 columns by construction
    banded = _banded_slim(emb, "vec_id", "embedding", "t_id", 64, 10, 8)
    assert banded.columns == ["t_id", "table", "bucket"]
    # and no vector column survives into the banded subtree's output
    bplan = banded._jdf.queryExecution().executedPlan().toString()
    top = bplan.splitlines()[1]  # root operator output after AQE wrapper
    assert "embedding" not in top


def test_train_centroids_partitioning_independent(spark):
    """Centroids must be identical regardless of input partitioning (the
    old limit()-based sample depended on partition scheduling)."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.similarity import (
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1 = train_centroids(emb.repartition(1), n_centroids=8)
    c2 = train_centroids(emb.repartition(13), n_centroids=8)
    c3 = train_centroids(emb.coalesce(2), n_centroids=8)
    assert np.array_equal(c1, c2) and np.array_equal(c1, c3)


def test_band_exchange_carries_no_vectors(spark):
    """Scale invariant: the LSH candidate join shuffles ONLY slim
    (id, table, bucket) rows — embeddings must never enter an Exchange
    (at 768-dim x 10^12 rows a vector-fat band shuffle dominates the
    job). Vectors join back by id onto candidates afterwards."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        lsh_candidates,
    )

    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)
    cand = lsh_candidates(emb, q, n_bits=6, n_tables=4)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "embedding" not in line, line
    # the shuffled attributes are exactly the slim trio + ids
    assert "embedding" not in plan.split("Exchange", 1)[1].split("\n")[0]


def test_spark_round6_matches_spark_round_bitexact(spark):
    """_spark_round6 must reproduce Spark's round(x, 6) BIT-EXACTLY —
    including the half-boundary shortest-repr values where np.round
    (binary half-even) disagrees with Spark (HALF_UP on the decimal
    repr): 2.5e-06 -> 3e-06 in Spark, 2e-06 under numpy."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        _spark_round6,
    )

    rng = np.random.default_rng(11)
    vals = [2.5e-06, 3.5e-06, 4.5e-06, -2.5e-06, -3.5e-06, 1.25e-05,
            0.9999995, -0.9999995, 0.1234565, -0.1234565, 0.0, 1.0, -1.0]
    vals += rng.uniform(-1, 1, 200).tolist()
    # values a hair around the 1e-6 grid: the rounding cliff
    grid = np.round(rng.uniform(-1, 1, 100), 6)
    vals += (grid + 5e-07).tolist() + (grid - 5e-07).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    want = [r[0] for r in df.select(F.round("x", 6).alias("r")).collect()]
    got = _spark_round6(np.array(vals, dtype=np.float64))
    assert [repr(g) for g in got.tolist()] == [repr(w) for w in want]


def test_brute_force_quarantines_null_and_ragged_vectors(spark):
    """A NULL or wrong-length embedding row must QUARANTINE (drop from
    every ranking), never kill the job — in both plans, on both sides.
    RAGGED targets route the gate to the crossJoin plan (two equal-length
    off-dim vectors have a defined cosine there, which packing would
    lose); NULL-only dirt is filtered off the packed side and keeps the
    map-only plan; dirty queries reaching the matmul kernel are skipped
    row-wise (zero output rows for that query, exactly the fallback's
    NULL-cosine result)."""
    rng = np.random.default_rng(3)
    clean_rows = [
        (i, rng.standard_normal(8).astype(np.float32).tolist())
        for i in range(20)
    ]
    schema = "vec_id long, embedding array<float>"
    dirty_t = spark.createDataFrame(
        clean_rows + [(100, None), (101, [1.0, 2.0])], schema)
    clean_t = spark.createDataFrame(clean_rows, schema)
    q = spark.createDataFrame(
        [clean_rows[0], clean_rows[1], (102, None), (103, [0.5] * 3)],
        schema)

    def norm(df):
        return (df.toPandas().sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    # dirty TARGETS: gate must fall back; parity with the pinned fallback
    fast = brute_force_topk(dirty_t, q, k=3)
    assert "MapInPandas" not in (
        fast._jdf.queryExecution().executedPlan().toString())
    slow = brute_force_topk(dirty_t, q, k=3, broadcast_elems=0)
    got = norm(fast)
    pd.testing.assert_frame_equal(got, norm(slow))
    assert set(got.query_id) == {0, 1}
    assert not {100, 101} & set(got.target_id)

    # clean targets, dirty QUERIES: matmul plan engages and skips them
    fast2 = brute_force_topk(clean_t, q, k=3)
    assert "MapInPandas" in (
        fast2._jdf.queryExecution().executedPlan().toString())
    got2 = norm(fast2)
    pd.testing.assert_frame_equal(
        got2, norm(brute_force_topk(clean_t, q, k=3, broadcast_elems=0)))
    assert set(got2.query_id) == {0, 1}

    # NULL-only dirt (the upstream decode quarantine's shape): one NULL
    # row must NOT forfeit the 21x map-only plan for a 10^6-row corpus —
    # it filters off the packed side, results identical to the fallback
    null_t = spark.createDataFrame(clean_rows + [(100, None)], schema)
    fast3 = brute_force_topk(null_t, q, k=3)
    assert "MapInPandas" in (
        fast3._jdf.queryExecution().executedPlan().toString())
    got3 = norm(fast3)
    pd.testing.assert_frame_equal(
        got3, norm(brute_force_topk(null_t, q, k=3, broadcast_elems=0)))
    assert 100 not in set(got3.target_id)
    assert set(got3.query_id) == {0, 1}


def test_nan_element_vectors_never_match_or_rank(spark):
    """A literal NaN (or inf) ELEMENT inside a vector makes the cosine
    undefined. Spark orders NaN ABOVE every double and evaluates
    ``NaN >= t`` as TRUE, so an unmasked NaN ratio would outrank every
    real neighbor in the crossJoin plan and match every row in the
    dup-pair threshold — while the matmul fast path masks non-finite
    scores to -inf. ``_cosine_col`` maps NaN -> NULL (nanvl) so all plans
    agree: a poisoned TARGET never ranks/matches, a poisoned QUERY yields
    zero rows."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        cosine_dup_pairs,
    )

    rng = np.random.default_rng(23)
    rows = [(i, rng.standard_normal(8).astype(np.float32).tolist())
            for i in range(10)]
    rows.append((10, [float("nan")] * 8))           # NaN-element target
    rows.append((11, [float("inf")] + [1.0] * 7))   # inf-element target
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    q = df.where(F.col("vec_id").isin([0, 10]))  # one real + the NaN query

    def norm(d):
        return (d.toPandas().sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    fast = brute_force_topk(df, q, k=3)
    assert "MapInPandas" in (  # NaN rows are non-NULL and rectangular:
        fast._jdf.queryExecution().executedPlan().toString()
    )  # the matmul gate engages — parity is live, not vacuous
    got = norm(fast)
    pd.testing.assert_frame_equal(
        got, norm(brute_force_topk(df, q, k=3, broadcast_elems=0)))
    assert set(got.query_id.unique()) == {0}        # NaN query: zero rows
    assert not {10, 11} & set(got.target_id)        # poisoned never ranks
    assert (got[got.query_id == 0]["rank"].to_numpy() == [1, 2, 3]).all()

    # threshold filter: NaN >= t must not sneak through as "true" —
    # threshold=-1 matches every DEFINED cosine, so the poisoned ids
    # are excluded by semantics, not by the bar being high
    dups = cosine_dup_pairs(df, threshold=-1.0).toPandas()
    assert not {10, 11} & (set(dups.id_a) | set(dups.id_b))
    assert len(dups) == 45  # C(10,2) real pairs all match at t=-1


def test_ivf_and_lsh_quarantine_poisoned_vectors(spark):
    """One poisoned vector must not destroy the IVF index: a NaN element
    in a sampled vector (or a seed) makes a NaN centroid, and np.argmin
    returns the FIRST NaN index on a NaN distance row — funneling every
    vector into the poisoned list on the next iteration. Training
    quarantines NULL/NaN/inf (and, with dim given, ragged) vectors; the
    assign/probe/signature kernels quarantine row-wise (NULL list_id /
    bucket array -> joins and explode drop them). Clean rows' results are
    IDENTICAL to a run on the clean subset."""
    rng = np.random.default_rng(31)
    clean_rows = [(i, rng.standard_normal(16).astype(np.float32).tolist())
                  for i in range(60)]
    schema = "vec_id long, embedding array<float>"
    clean = spark.createDataFrame(clean_rows, schema)
    dirty = spark.createDataFrame(clean_rows + [
        (100, [float("nan")] * 16),           # NaN element
        (101, [float("inf")] + [0.5] * 15),   # inf element
        (102, None),                          # NULL vector
        (103, [1.0, 2.0]),                    # ragged (wrong dim)
    ], schema)

    cent_clean = train_centroids(clean, n_centroids=4, iters=3, dim=16)
    cent_dirty = train_centroids(dirty, n_centroids=4, iters=3, dim=16)
    assert np.isfinite(cent_dirty).all()
    np.testing.assert_array_equal(cent_clean, cent_dirty)

    def norm(pdf):
        return (pdf.sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    # n_probe = n_centroids: exhaustive probing, so clean-row results are
    # exact and the only difference a poisoned row COULD make is wrongly
    # appearing (it must not)
    q_dirty = dirty.where(F.col("vec_id").isin([0, 1, 100, 102]))
    got = norm(ivf_topk(dirty, q_dirty, cent_dirty, k=3, n_probe=4)
               .toPandas())
    assert set(got.query_id.unique()) == {0, 1}   # poisoned queries: 0 rows
    assert not {100, 101, 102, 103} & set(got.target_id)
    q_clean = clean.where(F.col("vec_id").isin([0, 1]))
    want = norm(ivf_topk(clean, q_clean, cent_clean, k=3, n_probe=4)
                .toPandas())
    pd.testing.assert_frame_equal(got, want)

    # LSH path: poisoned rows never band (NULL bucket array), clean rows
    # band identically to the clean corpus
    got_lsh = norm(lsh_topk(dirty, q_dirty, k=3, n_bits=6, n_tables=4,
                            dim=16).toPandas())
    assert set(got_lsh.query_id.unique()) <= {0, 1}
    assert not {100, 101, 102, 103} & set(got_lsh.target_id)
    want_lsh = norm(lsh_topk(clean, q_clean, k=3, n_bits=6, n_tables=4,
                             dim=16).toPandas())
    pd.testing.assert_frame_equal(got_lsh, want_lsh)


def test_zero_norm_vector_never_holds_ann_topk_slot(spark):
    """An all-zero embedding is FINITE, so it passes the training/assign
    quarantine, gets real LSH buckets and a real IVF list — and reaches
    the shared exact-cosine refine, where its cosine is NULL (0/0 via
    try_divide). The refine must exclude it (brute_force_topk already
    does), otherwise a dead-feature vector occupies top-k slots with
    cosine=NULL in the ANN plans only — plan-dependent results."""
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(16).astype(np.float32).tolist())
            for i in range(40)]
    schema = "vec_id long, embedding array<float>"
    corpus = spark.createDataFrame(
        rows + [(200, [0.0] * 16)], schema)
    queries = corpus.where(F.col("vec_id").isin([0, 200]))

    # k > defined-cosine candidates in a bucket is the dangerous regime:
    # row_number would hand the NULL row a rank without the filter
    got_lsh = lsh_topk(corpus, queries, k=39, n_bits=4, n_tables=4,
                       dim=16).toPandas()
    assert 200 not in set(got_lsh.target_id)      # never a neighbor
    assert set(got_lsh.query_id.unique()) <= {0}  # zero-norm query: 0 rows
    assert got_lsh.cosine.notna().all()

    cent = train_centroids(corpus, n_centroids=2, iters=2, dim=16)
    got_ivf = ivf_topk(corpus, queries, cent, k=39, n_probe=2).toPandas()
    assert 200 not in set(got_ivf.target_id)
    assert set(got_ivf.query_id.unique()) <= {0}
    assert got_ivf.cosine.notna().all()

    # agreement with brute force on the same input
    bf = brute_force_topk(corpus, queries, k=39).toPandas()
    assert 200 not in set(bf.target_id)
    assert set(bf.query_id.unique()) <= {0}


def test_semdedup_groups_planted(spark):
    """SemDeDup semantics pinned closed-form: exact dups merge within a
    cluster, transitive chains merge, a cross-CLUSTER exact dup does NOT
    merge (SemDeDup's defining approximation), no-dup vectors and
    NULL-assigned (quarantined) vectors keep themselves."""
    from biomass_processing_pipeline_spark.operators.similarity import (
        semdedup_groups,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # list 0: dup of 2
            (2, [2.0, 0.0, 0.0]),   # list 0 (cosine(1,2)=1)
            (3, [0.0, 1.0, 0.0]),   # list 0: orthogonal — singleton
            (4, [1.0, 1.0, 0.0]),   # list 1: chain 4-5
            (5, [1.0, 0.9, 0.0]),   # list 1: chain 5-6 (4-6 below thr)
            (6, [1.0, 0.58, 0.0]),  # list 1: 4-6 directly below thr
            (7, [1.0, 0.0, 0.0]),   # list 2: exact dup of 1, OTHER cluster
            (8, None),              # NULL embedding, NULL list
        ],
        "vec_id long, embedding array<float>",
    )
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1), (7, 2)],
        "t_id long, list_id int",
    ).unionByName(
        spark.createDataFrame([(8, None)], "t_id long, list_id int")
    )
    import numpy as np

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return round(float(a @ b / np.sqrt((a @ a) * (b @ b))), 6)

    # threshold between cos(4,6) and min(cos(4,5), cos(5,6)): the chain
    # merges only transitively
    lo, hi = cos([1, 1, 0], [1, 0.58, 0]), min(
        cos([1, 1, 0], [1, 0.9, 0]), cos([1, 0.9, 0], [1, 0.58, 0])
    )
    assert lo < hi
    thr = (lo + hi) / 2
    got = (
        semdedup_groups(emb, assign, threshold=thr)
        .toPandas().set_index("vec_id").sort_index()
    )
    assert got.rep_id.to_dict() == {
        1: 1, 2: 1, 3: 3, 4: 4, 5: 4, 6: 4, 7: 7, 8: 8
    }
    assert got.is_kept.to_dict() == {
        1: True, 2: False, 3: True, 4: True, 5: False, 6: False,
        7: True, 8: True,
    }
    # partitioning independence
    got2 = (
        semdedup_groups(emb.repartition(7), assign.repartition(5),
                        threshold=thr)
        .toPandas().set_index("vec_id").sort_index()
    )
    assert got2.rep_id.to_dict() == got.rep_id.to_dict()
