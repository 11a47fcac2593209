"""mix_sample: deterministic temperature-mixture sampling goldens."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.sampling import (
    mix_sample,
    rate_to_copies,
    sample_hash_col,
)

_P = 2147483647


def _ref_copies(key: int, rate: float, seed: int = 42) -> int:
    base, thr = rate_to_copies(rate)
    h = ((key % (1 << 31)) * 2654435761 + seed) % _P * 2246822519 % _P
    return base + (1 if h < thr else 0)


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k", "grp"]))


RATES = {"A": 2.0, "B": 0.5, "C": 0.0, "D": 3.75}


def test_mix_sample_closed_form(spark):
    """Exact per-row copy counts vs the pure-Python reference, incl. the
    edge classes: integer rate (always 2 copies), pure Bernoulli,
    rate 0 (row vanishes), fractional >1, a group missing from the map
    (default 1.0 -> exactly one copy), and a NULL group (matches no
    `when` arm -> default)."""
    rows = [(i, g) for i in range(40) for g in ("A", "B", "C", "D")]
    rows += [(100, "other"), (101, None)]
    got = (
        mix_sample(_df(spark, rows), "grp", RATES, key_col="k")
        .groupBy("k", "grp").agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("sample_copy")).alias("copies"),
        )
        .toPandas()
    )
    seen = {(r.k, r.grp): (r.n, list(r.copies)) for r in got.itertuples()}
    for k, g in rows:
        rate = RATES.get(g, 1.0) if g is not None else 1.0
        n = _ref_copies(k, rate)
        if n == 0:
            assert (k, g) not in seen, (k, g)
        else:
            # copy index is dense 0..n-1 (the with-replacement contract)
            assert seen[(k, g)] == (n, list(range(n))), (k, g)
    # the fixture actually exercised both Bernoulli outcomes of B and D
    b_counts = {seen.get((k, "B"), (0,))[0] for k, g in rows if g == "B"}
    d_counts = {seen.get((k, "D"), (0,))[0] for k, g in rows if g == "D"}
    assert b_counts == {0, 1} and d_counts == {3, 4}


def test_mix_sample_partitioning_and_growth_stable(spark):
    """The keep/replicate decision is a pure function of (key, rate):
    identical at 1 vs 13 partitions, and unchanged for surviving keys
    when OTHER rows are added (checkpoint-resume stability)."""
    rows = [(i, "B" if i % 3 else "D") for i in range(200)]

    def run(data, parts):
        return (
            mix_sample(_df(spark, data).repartition(parts), "grp", RATES,
                       key_col="k")
            .groupBy("k").count().toPandas()
            .set_index("k")["count"].to_dict()
        )

    base = run(rows, 1)
    assert run(rows, 13) == base
    grown = run(rows + [(1000 + i, "A") for i in range(50)], 4)
    assert {k: n for k, n in grown.items() if k < 1000} == base


def test_mix_sample_rate_statistics(spark):
    """Hash uniformity sanity: a 0.5-rate group keeps ~half of 20k keys
    (binomial 3-sigma band), and a 2.6-rate group emits ~2.6x."""
    rows = [(i, "half") for i in range(20_000)]
    n_half = mix_sample(
        _df(spark, rows), "grp", {"half": 0.5}, key_col="k"
    ).count()
    assert abs(n_half - 10_000) < 3 * math.sqrt(20_000 * 0.25)
    n_up = mix_sample(
        _df(spark, rows), "grp", {"half": 2.6}, key_col="k"
    ).count()
    assert abs(n_up - 52_000) < 3 * math.sqrt(20_000 * 0.6 * 0.4)


def test_mix_sample_negative_keys(spark):
    """pmod keeps negative keys in [0, P) — deterministic, never an ANSI
    error, and matching the pure-Python wrap."""
    rows = [(-i, "B") for i in range(1, 300)]
    got = (
        mix_sample(_df(spark, rows), "grp", RATES, key_col="k")
        .groupBy("k").count().toPandas().set_index("k")["count"].to_dict()
    )
    for k, _ in rows:
        assert got.get(k, 0) == _ref_copies(k, 0.5), k
    hs = (
        _df(spark, rows)
        .select(sample_hash_col(F.col("k")).alias("h"))
        .agg(F.min("h"), F.max("h")).head()
    )
    assert 0 <= hs[0] and hs[1] < _P


def test_mix_sample_null_key(spark):
    """A NULL key is unknown identity: exactly floor(rate) copies, never
    the Bernoulli extra — deterministic, no ANSI error."""
    df = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([None, None, 7], dtype="Int64"),
                      "grp": ["D", "B", "D"]})
    )
    got = (
        mix_sample(df, "grp", RATES, key_col="k")
        .groupBy("grp", F.col("k").isNull().alias("null_key"))
        .count().toPandas()
    )
    seen = {(r.grp, r.null_key): r.count
            for r in got.itertuples(index=False)}
    # NULL D -> floor(3.75) = 3 copies; NULL B -> floor(0.5) = 0 (absent)
    assert seen.get(("D", True)) == 3
    assert ("B", True) not in seen
    assert seen.get(("D", False)) == _ref_copies(7, 3.75)


def test_rate_to_copies_validates():
    with pytest.raises(ValueError):
        rate_to_copies(-0.1)
    assert rate_to_copies(1.0) == (1, 0)
    assert rate_to_copies(0.0) == (0, 0)
    assert rate_to_copies(2.5) == (2, (_P - 1) // 2)


def test_pack_offsets_closed_form(spark):
    """Hand-computed packing layout: exclusive prefix starts, a doc
    straddling a 512-token chunk boundary, zero-token and NULL-count
    docs keeping their start but occupying no chunk; tiny bucket_size
    forces the two-level scan through its multi-bucket path."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        pack_offsets,
    )

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "n_tokens": pd.array([5, 0, 600, None, 7], dtype="Int64"),
    }))
    got = (
        pack_offsets(df, "n_tokens", "doc_id", budget=512, bucket_size=2)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.n_tokens.tolist() == [5, 0, 600, 0, 7]
    assert got.start_tok.tolist() == [0, 5, 5, 605, 605]
    first = [None if pd.isna(v) else int(v) for v in got.first_chunk]
    last = [None if pd.isna(v) else int(v) for v in got.last_chunk]
    assert first == [0, None, 0, None, 1]
    assert last == [0, None, 1, None, 1]  # doc 2 straddles chunks 0-1


def test_pack_offsets_matches_single_scan(spark):
    """The two-level distributed scan equals the plain ordered cumsum on
    a 500-doc corpus (sparse, shuffled-magnitude ids), identically at 1
    and 13 partitions."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.sampling import (
        pack_offsets,
    )

    ids = [i * 13 + (i % 7) for i in range(500)]  # sparse, irregular
    toks = [(i * i * 37) % 900 for i in range(500)]
    pdf = pd.DataFrame({"doc_id": ids, "n_tokens": toks}).sort_values(
        "doc_id"
    )
    pdf["start_tok"] = pdf.n_tokens.cumsum() - pdf.n_tokens
    pdf["first_chunk"] = np.where(
        pdf.n_tokens > 0, pdf.start_tok // 512, -1
    )
    pdf["last_chunk"] = np.where(
        pdf.n_tokens > 0, (pdf.start_tok + pdf.n_tokens - 1) // 512, -1
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "n_tokens": toks})
    )
    for parts in (1, 13):
        got = (
            pack_offsets(df.repartition(parts), "n_tokens", "doc_id",
                         budget=512, bucket_size=64)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert got.doc_id.tolist() == pdf.doc_id.tolist()
        assert got.start_tok.tolist() == pdf.start_tok.tolist()
        gf = got.first_chunk.fillna(-1).astype(int).tolist()
        gl = got.last_chunk.fillna(-1).astype(int).tolist()
        assert gf == pdf.first_chunk.tolist()
        assert gl == pdf.last_chunk.tolist()


def test_pack_offsets_validates_eagerly(spark):
    """budget/bucket_size <= 0 raise ValueError at CALL time (module
    convention, rate_to_copies precedent) — not an ANSI divide-by-zero
    SparkException deep inside the executed plan (ADVICE r05)."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        pack_offsets,
    )

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "n_tokens": [3]}))
    with pytest.raises(ValueError, match="budget"):
        pack_offsets(df, "n_tokens", "doc_id", budget=0)
    with pytest.raises(ValueError, match="bucket_size"):
        pack_offsets(df, "n_tokens", "doc_id", budget=8, bucket_size=0)


def test_pack_offsets_deep_levels_match_cumsum(spark):
    """Forced-tiny buckets (bucket_size=4 over 256 level-1 buckets -> a
    64-row level-2 table) drive BOTH recursion levels of
    _exclusive_prefix; result equals the plain ordered cumsum exactly
    (VERDICT r05 #4: no single-task window over the full corpus at any
    n)."""
    from biomass_processing_pipeline_spark.operators.sampling import (
        pack_offsets,
    )

    n = 1024
    ids = list(range(n))
    toks = [(i * 31) % 97 for i in range(n)]
    exp = pd.DataFrame({"doc_id": ids, "n_tokens": toks})
    exp["start_tok"] = exp.n_tokens.cumsum() - exp.n_tokens
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "n_tokens": toks}))
    got = (
        pack_offsets(df.repartition(7), "n_tokens", "doc_id",
                     budget=64, bucket_size=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.start_tok.tolist() == exp.start_tok.tolist()


def test_mix_sample_thousand_groups(spark):
    """1,000-group rate table (VERDICT r05 #6): the map-literal lookup
    handles wide mixes without a 1,000-deep when-chain; per-row copies
    still equal the pure-Python reference."""
    rates = {f"g{j}": (j % 7) * 0.5 for j in range(1000)}
    rows = [(i, f"g{i % 1000}") for i in range(3000)]
    got = (
        mix_sample(_df(spark, rows), "grp", rates, key_col="k")
        .groupBy("k", "grp").count().toPandas()
        .set_index("k")["count"].to_dict()
    )
    for i in range(3000):
        exp = _ref_copies(i, rates[f"g{i % 1000}"])
        assert got.get(i, 0) == exp, i
