import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the "
    "green forest while the hunter watches quietly from the old wooden tower"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("quick", "fast")),  # near dup
        (3, BASE.replace("forest", "meadow").replace("dog", "cat")),  # near dup
        (4, "completely different content about spark sql engines and joins"),
        (5, "another unrelated text mentioning databases and query planners"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark):
    d = exact_dedup(_docs(spark), "text", "doc_id").toPandas()
    dup = d[d.n_copies > 1]
    assert len(dup) == 1 and dup.iloc[0].keep_id == 0 and dup.iloc[0].n_copies == 2
    assert len(d) == 5  # 5 distinct contents


def test_minhash_candidates_contain_true_near_dups(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), "text", "doc_id", threshold=0.5
    ).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(4 in p or 5 in p for p in got)
    # jaccard of the exact pair is 1.0
    assert pairs[(pairs.id_a == 0) & (pairs.id_b == 1)].jaccard.iloc[0] == 1.0


def test_minhash_jaccard_matches_exact(spark):
    """LSH-refined jaccard == exact inverted-index jaccard on same pairs."""
    lsh = minhash_lsh_pairs(_docs(spark), "text", "doc_id", threshold=0.3).toPandas()
    exact = ngram_jaccard_pairs(_docs(spark), "text", "doc_id", threshold=0.3).toPandas()
    l = {(a, b): j for a, b, j in zip(lsh.id_a, lsh.id_b, lsh.jaccard)}
    e = {(a, b): j for a, b, j in zip(exact.id_a, exact.id_b, exact.jaccard)}
    for pair, j in l.items():
        assert abs(e[pair] - j) < 1e-12  # refine is exact, values identical


def test_simhash_finds_exact_and_near(spark):
    pairs = simhash_pairs(_docs(spark), "text", "doc_id", max_hamming=10).toPandas()
    got = {(a, b): h for a, b, h in zip(pairs.id_a, pairs.id_b, pairs.hamming)}
    assert got.get((0, 1)) == 0  # identical -> hamming 0
    assert (0, 2) in got  # one-word swap -> small hamming


def test_jaccard_topk_deterministic(spark):
    t1 = jaccard_topk(_docs(spark), "text", "doc_id", k=2, query_mod=3).toPandas()
    t2 = jaccard_topk(_docs(spark), "text", "doc_id", k=2, query_mod=3).toPandas()
    key = ["query_id", "rank"]
    assert t1.sort_values(key).reset_index(drop=True).equals(
        t2.sort_values(key).reset_index(drop=True)
    )
    top = t1[(t1.query_id == 0) & (t1["rank"] == 1)]
    assert top.target_id.iloc[0] == 1 and top.jaccard.iloc[0] == 1.0


def test_minhash_hot_bucket_salting_parity(spark):
    """Band-bucket skew: 120 near-identical docs share every band bucket.
    With a tiny hot threshold the chunked self-join path engages (visible
    in the plan) and must emit exactly the same pairs as the plain join."""
    rows = [(i, BASE + f" tail{i % 3}") for i in range(120)]
    rows += [(200 + i, f"unrelated text number {i} about engines") for i in range(20)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    plain = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5, hot_bucket_threshold=10**9
    )
    salted = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5, hot_bucket_threshold=50,
        hot_chunks=8,
    )
    p = plain.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    s = salted.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(p) > 100  # the hot cluster really is quadratic-ish
    pd.testing.assert_frame_equal(p, s)
    # the chunked path is in the executed plan: chunk join key + explode
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "chunk" in plan and "explode" in plan.lower()


def test_dedup_components_transitive(spark):
    """Connected components over near-dup pairs: a 4-doc chain (0-1, 1-2,
    2-3) collapses to one component with rep 0 even though 0 and 3 never
    pair directly; disjoint pairs keep separate reps."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        dedup_components,
    )

    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": [0, 1, 2, 10, 20, 21],
        "id_b": [1, 2, 3, 11, 21, 22],
    }))
    got = dedup_components(pairs).toPandas().set_index("doc_id")["rep_id"]
    assert got.to_dict() == {
        0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
    }


def test_dedup_components_long_chain_and_budget(spark):
    """A 60-edge chain has diameter > the old 20-iteration budget; the
    pointer-doubling shortcut must still converge (O(log d) rounds), and
    an exhausted budget must raise, never return silently-wrong reps."""
    import pytest

    from biomass_processing_pipeline_spark.operators.dedup import (
        dedup_components,
    )

    n = 61
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": list(range(n - 1)), "id_b": list(range(1, n)),
    }))
    got = dedup_components(pairs, max_iters=10).toPandas()
    assert (got["rep_id"] == 0).all() and len(got) == n
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(pairs, max_iters=2)
