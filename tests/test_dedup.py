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


def test_minhash_refine_plans_identical(spark):
    """The broadcast CSR refine (default at small corpus size) and the
    at-scale array-join refine must emit BIT-identical (id_a, id_b,
    jaccard) rows — jaccard is int/int in float64 on both plans. Also
    pins that string ids survive the broadcast index round-trip."""
    docs = _docs(spark)
    bcast = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3)
    joined = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.3, refine_broadcast_elems=0
    )
    b = bcast.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    j = joined.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)
    # the broadcast plan must not join the shingle arrays onto candidates
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan

    sdocs = docs.withColumn("sid", F.concat(F.lit("d"), F.col("doc_id")))
    sb = minhash_lsh_pairs(sdocs, "text", "sid", threshold=0.3).toPandas()
    sj = minhash_lsh_pairs(
        sdocs, "text", "sid", threshold=0.3, refine_broadcast_elems=0
    ).toPandas()
    pd.testing.assert_frame_equal(
        sb.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        sj.sort_values(["id_a", "id_b"]).reset_index(drop=True),
    )


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
    """Chain graphs (the near-threshold signature worst case) must
    converge in LOG rounds — hooking + grandparent shortcutting, not
    O(diameter) crawling: a 255-edge chain needs <= ceil(log2(256)) + 2
    driver rounds (measured: exactly +1). An exhausted budget must raise,
    never return silently-wrong reps."""
    import math

    import pytest

    from biomass_processing_pipeline_spark.operators.dedup import (
        dedup_components,
    )

    n = 256
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": list(range(n - 1)), "id_b": list(range(1, n)),
    }))
    got = dedup_components(pairs, max_iters=15).toPandas()
    assert (got["rep_id"] == 0).all() and len(got) == n
    assert dedup_components.last_rounds <= math.ceil(math.log2(n)) + 2
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(pairs, max_iters=2)


def test_scoped_components_union_find(spark):
    """Per-scope union-find: chains collapse to min-id reps inside a scope,
    identical ids in different scopes never merge."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        scoped_components,
    )

    pairs = spark.createDataFrame(pd.DataFrame({
        "tile": ["A", "A", "A", "B", "B"],
        "id_a": ["a1", "a2", "a3", "a1", "b8"],
        "id_b": ["a2", "a3", "a4", "a9", "b9"],
    }))
    got = scoped_components(pairs, "tile").toPandas()
    reps = dict(zip(got.doc_id, got.rep_id))
    # scope A chain a1-a2-a3-a4 -> rep a1; scope B a1-a9 -> rep a1, b8-b9 -> b8
    assert reps == {"a1": "a1", "a2": "a1", "a3": "a1", "a4": "a1",
                    "a9": "a1", "b8": "b8", "b9": "b8"}
    # rows: 4 from scope A + 4 from scope B ("a1" appears once per scope)
    assert len(got) == 8


def _brute_phash_groups(pdf, max_hamming):
    """Transitive-closure golden in plain python: per scope, all-pairs
    Hamming union-find over images (not collapsed sigs)."""
    out = {}
    for tile, g in pdf.groupby("tile_code"):
        ids = list(g.image_id)
        ph = {i: p for i, p in zip(g.image_id, g.phash)}
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for i in ids:
            for j in ids:
                if i < j and bin(ph[i] ^ ph[j]).count("1") <= max_hamming:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[rj] = ri
        comp = {}
        for i in ids:
            comp.setdefault(find(i), []).append(i)
        for members in comp.values():
            rep = min(members)
            for m in members:
                out[m] = (rep, len(members))
    return out


def test_phash_dedup_groups_matches_bruteforce(spark):
    """Tile-scoped phash near-dup grouping == per-image transitive-closure
    brute force (exact-dup collapse + banding + union-find must compose to
    the naive answer), and the result is partitioning-independent."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )

    rng = np.random.default_rng(7)
    rows = []
    base = int(rng.integers(0, 1 << 62))
    for k in range(120):
        tile = f"T{k % 3}"
        # clusters: flip 0-2 bits off one of 6 anchors; some exact copies
        anchor = base ^ (int(rng.integers(0, 6)) << 40)
        sig = anchor
        for _ in range(int(rng.integers(0, 3))):
            sig ^= 1 << int(rng.integers(0, 63))
        rows.append((f"img{k:03d}", tile, sig))
    pdf = pd.DataFrame(rows, columns=["image_id", "tile_code", "phash"])
    df = spark.createDataFrame(pdf)

    got = phash_dedup_groups(
        df, "image_id", "phash", max_hamming=2, scope_col="tile_code"
    ).toPandas()
    golden = _brute_phash_groups(pdf, 2)
    assert len(got) == len(pdf)
    for r in got.itertuples(index=False):
        grep, gsize = golden[r.image_id]
        assert (r.rep_id, r.group_size) == (grep, gsize), r.image_id

    # partitioning independence
    got2 = phash_dedup_groups(
        df.repartition(7), "image_id", "phash", max_hamming=2,
        scope_col="tile_code",
    ).toPandas()
    a = got.sort_values("image_id").reset_index(drop=True)
    b = got2.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)


def test_phash_dedup_groups_unscoped_negative_sigs(spark):
    """Unscoped path (dedup_components fallback) + negative int64 phashes:
    banding must treat the sign bit as data (arithmetic shiftright is
    masked), grouping exact vs brute force."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )

    sigs = [-(1 << 62) + 5, -(1 << 62) + 4, (1 << 61) + 9, (1 << 61) + 8, 77]
    pdf = pd.DataFrame({
        "image_id": [f"i{k}" for k in range(5)],
        "phash": pd.array(sigs, dtype="int64"),
    })
    got = phash_dedup_groups(
        spark.createDataFrame(pdf), "image_id", "phash", max_hamming=1
    ).toPandas().set_index("image_id")
    # i0-i1 differ in 1 bit, i2-i3 differ in 1 bit, i4 alone
    assert got.loc["i0"].rep_id == "i0" and got.loc["i1"].rep_id == "i0"
    assert got.loc["i2"].rep_id == "i2" and got.loc["i3"].rep_id == "i2"
    assert got.loc["i4"].rep_id == "i4" and got.loc["i4"].group_size == 1
    assert got.loc["i0"].group_size == 2 and got.loc["i2"].group_size == 2


def test_hamming_sig_pairs_pigeonhole_complete_h3(spark):
    """Banding completeness at the pigeonhole limit: signatures differing
    in EXACTLY 3 bits spread across 3 DIFFERENT 16-bit blocks (the worst
    case — only one block left agreeing) must still pair; 4-bit spreads
    across all 4 blocks must NOT (they share no block, documenting the
    completeness boundary). Verified against brute-force all-pairs."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.dedup import (
        hamming_sig_pairs,
    )

    rng = np.random.default_rng(11)
    base = int(rng.integers(0, 1 << 63))
    rows = [("s00", base)]
    # 3 flips in blocks {0,1,2}: worst-case h=3, block 3 agrees -> must pair
    rows.append(("s01", base ^ (1 << 2) ^ (1 << 17) ^ (1 << 33)))
    # 4 flips, one per block: h=4, no block agrees -> banding cannot see it
    rows.append(("s02", base ^ (1 << 2) ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)))
    # random extras
    for k in range(3, 40):
        rows.append((f"s{k:02d}", int(rng.integers(-(1 << 63), 1 << 63))))
    import pandas as pd
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["sid", "sig"]).astype({"sig": "int64"})
    )
    got = hamming_sig_pairs(sdf, "sid", "sig", max_hamming=3).toPandas()
    got_pairs = {(a, b) for a, b in zip(got.id_a, got.id_b)}

    # brute force: ALL pairs at h<=3 must be found (none missed by banding)
    sig = dict(rows)
    ids = sorted(sig)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1") <= 3:
                brute.add((a, b))
    assert got_pairs == brute
    assert ("s00", "s01") in got_pairs          # worst-case h=3 found
    assert ("s00", "s02") not in got_pairs      # h=4: beyond the guarantee
    ham01 = got[(got.id_a == "s00") & (got.id_b == "s01")].hamming.iloc[0]
    assert ham01 == 3


def test_hamming_sig_pairs_wide_budget_complete(spark):
    """max_hamming > 3 widens the banding (h+1 blocks) instead of silently
    losing recall: every pair at h<=5 must be found, verified vs brute
    force, including a worst-case 5-flip spread across 5 distinct blocks."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.dedup import (
        hamming_sig_pairs,
    )

    rng = np.random.default_rng(7)
    base = int(rng.integers(0, 1 << 63))
    # 6 blocks at h=5: widths 11,11,11,11,10,10 (offsets 0,11,22,33,44,54).
    # Flip one bit in each of blocks 0-4 -> only block 5 agrees.
    rows = [("w00", base),
            ("w01", base ^ (1 << 0) ^ (1 << 11) ^ (1 << 22)
             ^ (1 << 33) ^ (1 << 44))]
    for k in range(2, 40):
        rows.append((f"w{k:02d}", int(rng.integers(-(1 << 63), 1 << 63))))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["sid", "sig"]).astype({"sig": "int64"})
    )
    got = hamming_sig_pairs(sdf, "sid", "sig", max_hamming=5).toPandas()
    got_pairs = {(a, b) for a, b in zip(got.id_a, got.id_b)}
    sig = dict(rows)
    ids = sorted(sig)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1") <= 5:
                brute.add((a, b))
    assert got_pairs == brute
    assert ("w00", "w01") in got_pairs


def test_hamming_sig_pairs_rejects_invalid_budget(spark):
    import pytest

    from biomass_processing_pipeline_spark.operators.dedup import (
        hamming_sig_pairs,
    )

    sdf = spark.createDataFrame(
        pd.DataFrame({"sid": ["a"], "sig": pd.array([1], dtype="int64")})
    )
    with pytest.raises(ValueError, match="max_hamming"):
        hamming_sig_pairs(sdf, "sid", "sig", max_hamming=64)
    with pytest.raises(ValueError, match="max_hamming"):
        hamming_sig_pairs(sdf, "sid", "sig", max_hamming=-1)


def test_hamming_sig_pairs_keeps_edge_per_scope(spark):
    """The same (id_a, id_b) pair occurring in TWO scopes keeps one edge
    per scope — dropping one would corrupt the other scope's components
    (ids here are not scope-qualified, the generic-caller case)."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        hamming_sig_pairs,
    )

    pdf = pd.DataFrame({
        "sid": ["a", "b", "a", "b"],
        "sig": pd.array([8, 9, 8, 9], dtype="int64"),
        "tile": ["T1", "T1", "T2", "T2"],
    })
    got = hamming_sig_pairs(
        spark.createDataFrame(pdf), "sid", "sig",
        max_hamming=1, scope_col="tile",
    ).toPandas().sort_values("tile").reset_index(drop=True)
    assert len(got) == 2
    assert list(got.tile) == ["T1", "T2"]
    assert set(zip(got.id_a, got.id_b)) == {("a", "b")}


def test_scoped_components_preserves_id_type(spark):
    """Long ids must come back as longs with NUMERIC min-rep ordering:
    {9, 10} -> rep 9 (string coercion would pick '10' < '9')."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        scoped_components,
    )

    pairs = spark.createDataFrame(pd.DataFrame({
        "scope": ["s", "s"],
        "id_a": pd.array([9, 10], dtype="int64"),
        "id_b": pd.array([10, 11], dtype="int64"),
    }))
    got = scoped_components(pairs, "scope")
    types = {f.name: f.dataType.simpleString() for f in got.schema.fields}
    assert types == {"doc_id": "bigint", "rep_id": "bigint"}
    pdf = got.toPandas().set_index("doc_id")
    assert set(pdf.index) == {9, 10, 11}
    assert (pdf.rep_id == 9).all()


def test_phash_dedup_groups_null_scope_rows_survive(spark):
    """NULL-scope rows must not vanish: they form their own scope group
    (and never join a real scope's components)."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )

    pdf = pd.DataFrame({
        "image_id": ["n0", "n1", "t0", "t1"],
        "phash": pd.array([100, 101, 100, 101], dtype="int64"),
        "tile": [None, None, "T1", "T1"],
    })
    got = phash_dedup_groups(
        spark.createDataFrame(pdf), "image_id", "phash",
        max_hamming=1, scope_col="tile",
    ).toPandas().set_index("image_id")
    assert set(got.index) == {"n0", "n1", "t0", "t1"}  # nobody dropped
    assert got.loc["n0"].rep_id == "n0" and got.loc["n1"].rep_id == "n0"
    assert got.loc["t0"].rep_id == "t0" and got.loc["t1"].rep_id == "t0"
    assert (got.group_size == 2).all()


def test_phash_dedup_groups_null_sig_rows_are_singletons(spark):
    """A NULL signature (a quarantined/undecodable image) is an UNKNOWN
    hash: the row must come back as its OWN singleton group — not vanish
    at the sig equi-join, and not be grouped as an 'exact dup' of every
    other unknown. Real-sig grouping must be unaffected, scoped and
    unscoped alike."""
    from biomass_processing_pipeline_spark.operators.dedup import (
        phash_dedup_groups,
    )

    pdf = pd.DataFrame({
        "image_id": ["a0", "a1", "u0", "u1", "b0"],
        "phash": pd.array([100, 101, None, None, 900], dtype="Int64"),
        "tile": ["T1", "T1", "T1", "T2", "T1"],
    })
    for kwargs in ({}, {"scope_col": "tile"}):
        got = (phash_dedup_groups(spark.createDataFrame(pdf), "image_id",
                                  "phash", max_hamming=1, **kwargs)
               .toPandas().set_index("image_id"))
        assert set(got.index) == {"a0", "a1", "u0", "u1", "b0"}
        assert got.loc["u0"].rep_id == "u0" and got.loc["u0"].group_size == 1
        assert got.loc["u1"].rep_id == "u1" and got.loc["u1"].group_size == 1
        assert got.loc["a0"].rep_id == "a0" and got.loc["a1"].rep_id == "a0"
        assert got.loc["a0"].group_size == 2
        assert got.loc["b0"].rep_id == "b0" and got.loc["b0"].group_size == 1


def test_minhash_empty_and_singleton_corpora(spark):
    """Degenerate inputs flow through both refine plans without error:
    an empty corpus and a single-doc corpus each produce zero pairs with
    the full (id_a, id_b, jaccard) schema."""
    empty = spark.createDataFrame([], schema="doc_id long, text string")
    one = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": ["only document here"]})
    )
    for docs in (empty, one):
        for kw in ({}, {"refine_broadcast_elems": 0}):
            got = minhash_lsh_pairs(docs, "text", "doc_id", **kw).toPandas()
            assert len(got) == 0
            assert list(got.columns) == ["id_a", "id_b", "jaccard"]


def test_minhash_refine_gate_docs_and_pin(spark, monkeypatch):
    """The broadcast-refine gate bounds BOTH totals: shingle elements AND
    doc count (the driver collect + id->offset dict pay O(n_docs), so a
    many-tiny-doc corpus must take the join refine even when its elements
    fit), and a pinned join refine (refine_broadcast_elems=0) never
    touches the broadcast path. Results are identical on every route."""
    import biomass_processing_pipeline_spark.operators.dedup as dd

    docs = _docs(spark)
    calls = []
    real = dd._refine_broadcast

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dd, "_refine_broadcast", spy)

    def run(**kw):
        return dd.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.3, **kw
        ).toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    base = run()  # tiny fixture passes both bounds -> broadcast refine
    assert calls == [1]

    calls.clear()
    by_docs = run(refine_broadcast_docs=1)  # doc bound alone forces join
    assert calls == []
    pd.testing.assert_frame_equal(base, by_docs)

    calls.clear()
    pinned = run(refine_broadcast_elems=0)  # pin skips gate AND measure job
    assert calls == []
    pd.testing.assert_frame_equal(base, pinned)
    assert len(base) > 0


def test_minhash_partitioning_independent(spark):
    """Same pairs and identical jaccard values whatever the input
    partitioning (1 vs 13 partitions) — no partition-local assumption in
    banding, hot-bucket chunking, size prune, or the broadcast refine."""
    docs = _docs(spark)
    a = minhash_lsh_pairs(
        docs.coalesce(1), "text", "doc_id", threshold=0.3
    ).toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = minhash_lsh_pairs(
        docs.repartition(13), "text", "doc_id", threshold=0.3
    ).toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_fnv_vectorized_kernels_match_scalar_reference():
    """The two vectorized FNV-1a kernels (fixed-width window matrix and
    ragged zero-padded sweep) must produce the SAME values as the scalar
    per-byte reference for arbitrary byte strings — the DuckDB oracle
    twins embed these exact values, so a divergence would break every
    minhash/simhash hash-green check. Includes empty strings and
    full-range bytes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biomass_processing_pipeline_spark.operators.dedup import (
        _fnv_matrix,
        _fnv_ragged,
        hash_bytes_np,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=40), min_size=0,
                    max_size=30))
    def ragged(tokens):
        got = _fnv_ragged(tokens)
        exp = hash_bytes_np(np.array(tokens, dtype=object)) if tokens else \
            np.empty(0, dtype=np.int64)
        assert list(got) == list(exp)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 16), st.integers(0, 2**31 - 1))
    def matrix(n, k, seed):
        rng = np.random.default_rng(seed)
        mat = rng.integers(0, 256, size=(n, k), dtype=np.uint8)
        got = _fnv_matrix(mat)
        exp = hash_bytes_np(np.array([bytes(row) for row in mat],
                                     dtype=object))
        assert list(got) == list(exp)

    ragged()
    matrix()


def test_connected_components_randomized_vs_union_find(spark):
    """Randomized CC fuzz: Erdos-Renyi-ish sparse graphs, chains, stars
    and cliques over shuffled long ids — both the log-round FastSV
    (`dedup_components`) and the per-scope Arrow union-find
    (`scoped_components`) must equal a pure-Python union-find reference:
    every vertex labeled with its component's MIN id. Seeded; failures
    reproduce."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.dedup import (
        dedup_components,
        scoped_components,
    )

    def uf_reference(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp: dict[int, list] = {}
        for v in list(parent):
            comp.setdefault(find(v), []).append(v)
        return {v: min(vs) for vs in comp.values() for v in vs}

    rng = np.random.default_rng(42)
    for case in range(6):
        n = int(rng.integers(8, 60))
        ids = rng.permutation(10_000)[:n].astype("int64")  # sparse id space
        kind = case % 3
        if kind == 0:  # sparse random graph
            m = int(rng.integers(n // 2, 2 * n))
            ea = ids[rng.integers(0, n, size=m)]
            eb = ids[rng.integers(0, n, size=m)]
        elif kind == 1:  # chain + isolated star
            ea = np.concatenate([ids[:-1], ids[:1].repeat(min(5, n - 1))])
            eb = np.concatenate([ids[1:], ids[1:min(5, n - 1) + 1]])
        else:  # two cliques bridged by one edge
            h = n // 2
            ca = [(ids[i], ids[j]) for i in range(h) for j in range(i + 1, h)]
            cb = [(ids[i], ids[j]) for i in range(h, n)
                  for j in range(i + 1, n)]
            both = ca + cb + [(ids[0], ids[-1])]
            ea = np.array([a for a, _ in both], dtype="int64")
            eb = np.array([b for _, b in both], dtype="int64")
        mask = ea != eb  # CC over proper edges; self-loops add nothing
        edges = list(zip(ea[mask].tolist(), eb[mask].tolist()))
        if not edges:
            continue
        exp = uf_reference(edges)

        pairs = spark.createDataFrame(
            pd.DataFrame({"id_a": [a for a, _ in edges],
                          "id_b": [b for _, b in edges]})
        )
        got = dedup_components(pairs, max_iters=25).toPandas()
        assert got.set_index("doc_id")["rep_id"].to_dict() == exp, \
            f"FastSV mismatch, case {case}"

        # same graph through the scoped path (one scope) must agree too
        sgot = scoped_components(
            pairs.withColumn("scope", F.lit("s")), "scope"
        ).toPandas()
        assert sgot.set_index("doc_id")["rep_id"].to_dict() == exp, \
            f"scoped union-find mismatch, case {case}"


def test_shingle_batch_matches_per_doc_reference():
    """The batch-vectorized shingle kernel must produce the IDENTICAL
    sorted-unique hash lists as the per-doc reference
    (np.unique(_fnv_matrix(sliding windows))) for arbitrary strings —
    empty, shorter than k, exactly k, repeated content, unicode
    multi-byte, and fuzz batches."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biomass_processing_pipeline_spark.operators.dedup import (
        _fnv_matrix,
        _shingle_batch,
        hash_bytes_np,
    )

    def per_doc(texts, k):
        out = []
        for t in texts:
            b = np.frombuffer((t or "").lower().encode(), dtype=np.uint8)
            if len(b) < k:
                out.append(
                    [int(hash_bytes_np(np.array([bytes(b)], dtype=object))[0])]
                )
                continue
            w = np.lib.stride_tricks.sliding_window_view(b, k)
            out.append(np.unique(_fnv_matrix(w)).tolist())
        return out

    fixed = ["", "ab", "abcde", "abcdef", "ABCDE", "aaaaaaaaaa",
             "héllo wörld ünïcode", None, "abcde" * 50, "xy"]
    assert _shingle_batch(fixed, 5) == per_doc(fixed, 5)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=60), min_size=0,
                    max_size=20),
           st.integers(2, 8))
    def fuzz(texts, k):
        assert _shingle_batch(texts, k) == per_doc(texts, k)

    fuzz()


def test_exact_dedup_null_content_rows_keep_themselves(spark):
    """NULL content is UNKNOWN, not identical: md5(NULL)=NULL must not
    collapse every quarantined doc into one keep row (a downstream dedup
    delete would wipe all but one of them)."""
    from biomass_processing_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")],
        "doc_id long, text string")
    got = exact_dedup(df, "text", "doc_id").toPandas().set_index("keep_id")
    assert set(got.index) == {1, 3, 4, 5}
    assert got.loc[1, "n_copies"] == 2
    assert (got.loc[[3, 4], "n_copies"] == 1).all()
    assert got.loc[5, "n_copies"] == 1


def test_null_text_docs_never_pair_but_empty_docs_do(spark):
    """NULL text is unknown content: shingled as '' every quarantined doc
    would pair as a jaccard-1.0 dup of every other NULL doc and of
    genuinely empty docs. NULL-text rows must produce NO pairs in any
    text near-dup generator; two REAL empty strings are identical
    content and must still pair."""
    rows = [(0, BASE), (1, BASE), (2, None), (3, None), (4, ""), (5, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    mh = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).toPandas()
    mp = set(zip(mh.id_a, mh.id_b))
    assert (0, 1) in mp and (4, 5) in mp
    assert not any(2 in p or 3 in p for p in mp)

    sp = simhash_pairs(docs, "text", "doc_id", max_hamming=0).toPandas()
    ss = set(zip(sp.id_a, sp.id_b))
    assert (0, 1) in ss and (4, 5) in ss
    assert not any(2 in p or 3 in p for p in ss)

    ng = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).toPandas()
    np_ = set(zip(ng.id_a, ng.id_b))
    assert (0, 1) in np_ and (4, 5) in np_
    assert not any(2 in p or 3 in p for p in np_)

    tk = jaccard_topk(docs, "text", "doc_id", k=2, query_mod=2).toPandas()
    assert 2 not in set(tk.query_id) and 2 not in set(tk.target_id)
    assert 3 not in set(tk.target_id)


def test_corpus_line_dedup_closed_form(spark):
    """C4 segment dedup goldens: first (doc, pos) occurrence wins
    globally, empty segments are formatting (always survive), NULL and
    empty text report the pinned zero/NULL contract."""
    import pandas as pd

    from biomass_processing_pipeline_spark.operators.dedup import (
        corpus_line_dedup,
    )

    df = spark.createDataFrame(pd.DataFrame(
        [(1, "x\ny\nx"), (2, "y\nz"), (3, "\nx"), (4, None), (5, "")],
        columns=["doc_id", "text"],
    ))
    got = corpus_line_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert got.clean_text.tolist()[:3] == ["x\ny", "z", ""]
    assert pd.isna(got.loc[4, "clean_text"])
    assert got.loc[5, "clean_text"] == ""
    assert got.n_kept.tolist() == [2, 1, 0, 0, 0]
    assert got.n_dropped.tolist() == [1, 1, 1, 0, 0]


def test_corpus_line_dedup_global_property(spark):
    """Every distinct non-empty segment survives EXACTLY once across the
    whole corpus, in its first-(doc, pos) home — identical at 1 and 13
    partitions."""
    from collections import Counter

    import pandas as pd

    from biomass_processing_pipeline_spark.operators.dedup import (
        corpus_line_dedup,
    )

    docs = [
        (i, "\n".join(f"seg{(i * 3 + j * j) % 17}" for j in range(5)))
        for i in range(50)
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    base = None
    for parts in (1, 13):
        got = (
            corpus_line_dedup(df.repartition(parts))
            .toPandas().set_index("doc_id").sort_index()
        )
        kept = Counter(
            seg for t in got.clean_text.dropna() for seg in t.split("\n")
            if seg
        )
        all_segs = {
            seg for _, t in docs for seg in t.split("\n") if seg
        }
        assert set(kept) == all_segs and set(kept.values()) == {1}
        # first-occurrence rule: doc 0 keeps all its 5 (distinct) segments
        assert got.loc[0, "n_kept"] == len(
            {f"seg{(0 + j * j) % 17}" for j in range(5)}
        )
        cur = got.reset_index().values.tolist()
        if base is None:
            base = cur
        else:
            assert cur == base
