import pandas as pd
from pyspark.sql import functions as F

from biomass_processing_pipeline_spark.operators.text import (
    doc_stats,
    fingerprint_udf,
    langid_df,
    quality_cols,
)


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_quality_ratios(spark):
    df = _df(spark, [(1, "the cat and the dog!! 123")])
    out = quality_cols(df).toPandas().iloc[0]
    n = len("the cat and the dog!! 123")
    assert out.n_tokens == 6
    assert abs(out.alpha_ratio - 15 / n) < 1e-6
    assert abs(out.digit_ratio - 3 / n) < 1e-6
    assert abs(out.punct_ratio - 2 / n) < 1e-6
    assert abs(out.stopword_ratio - 3 / 6) < 1e-6  # the, and, the
    assert 0.0 <= out.quality_score <= 1.0


def test_langid_heuristic(spark):
    df = _df(spark, [
        (1, "the house is big and the garden is green"),
        (2, "das haus ist nicht klein und der garten"),
        (3, "le chat est dans la maison et les arbres"),
        (4, "el perro es una mascota que vive por aqui"),
        (5, "zzz qqq xxx"),
    ])
    got = langid_df(df).toPandas().set_index("doc_id").lang_guess
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "es" and got[5] == "unknown"


def test_fingerprint_shift_robust(spark):
    base = "some long document content that stays mostly identical over time"
    df = _df(spark, [(1, base), (2, "PREFIX " + base), (3, "totally other words")])
    out = df.select(
        "doc_id", fingerprint_udf()(F.col("text")).alias("fp")
    ).toPandas().set_index("doc_id").fp
    s1, s2, s3 = set(out[1]), set(out[2]), set(out[3])
    # k-min sketch overlap: prefixed copy keeps most entries, stranger none
    assert len(s1 & s2) >= len(s1) * 0.6
    assert not (s1 & s3)


def test_doc_stats_on_driver_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = doc_stats(docs).toPandas()
    assert len(out) == docs.count()
    assert (out.n_tokens > 0).all()
    distinct_fps = {tuple(fp) for fp in out.fingerprint}
    assert len(distinct_fps) > len(out) * 0.9


def test_fingerprint_edge_docs_match_oracle(spark):
    """Contract edges the sf fixtures never exercise, pinned engine ==
    DuckDB twin: (a) docs SHORTER than the 8-byte window keep the
    whole-string sequential hash (incl. the empty string's [0]); (b) NULL
    text is unknown content — NULL fingerprint, ZERO exploded rows (it
    sketches nothing, and must not share the empty-string sketch with
    genuinely empty docs); (c) a normal doc sanity-anchors the join."""
    import duckdb

    from biomass_processing_pipeline_spark.queries import SQL_DOC_FINGERPRINT

    rows = [(1, ""), (2, "a"), (3, "1234567"), (4, None),
            (5, "a much longer document with plenty of windows in it")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        df.select("doc_id",
                  F.explode(fingerprint_udf()(F.col("text"))).alias("fp_hash"))
        .toPandas().sort_values(["doc_id", "fp_hash"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = (
        con.execute(SQL_DOC_FINGERPRINT).df()
        .sort_values(["doc_id", "fp_hash"]).reset_index(drop=True)
    )
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.fp_hash.tolist() == exp.fp_hash.tolist()
    # NULL doc emits nothing; empty doc emits exactly [0]
    assert 4 not in set(got.doc_id)
    assert got[got.doc_id == 1].fp_hash.tolist() == [0]


def test_decontaminate_exact_counts(spark):
    """Closed-form decontamination: hand-computed distinct-gram and
    hit-gram counts, incl. the three edge classes — repeated grams count
    once (DISTINCT), a doc too short for one n-gram reports 0/0/false,
    and NULL text (unknown content) likewise evidences nothing."""
    from biomass_processing_pipeline_spark.operators.text import decontaminate

    train = _df(spark, [
        (1, "a b c d e"),          # {a b c, b c d, c d e}; hit: c d e
        (2, "x y z w"),            # {x y z, y z w}; no hits
        (3, "c d e c d e c d e"),  # distinct {c d e, d e c, e c d}; 1 hit
        (4, "p q"),                # < n words
        (5, None),                 # NULL text
    ])
    ev = _df(spark, [(100, "c d e f"), (101, "m n o")])
    got = (
        decontaminate(train, ev, n=3)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.n_grams.tolist() == [3, 2, 3, 0, 0]
    assert got.n_hit_grams.tolist() == [1, 0, 1, 0, 0]
    assert got.contaminated.tolist() == [True, False, True, False, False]


def test_decontaminate_matches_bruteforce(spark):
    """Deterministic pseudo-corpus vs a pure-Python set reference: per-doc
    distinct 4-gram counts and eval-overlap counts match exactly."""
    from biomass_processing_pipeline_spark.operators.text import decontaminate

    vocab = [f"w{i}" for i in range(7)]
    docs = [
        (i, " ".join(vocab[(i * j * j + j) % 7] for j in range(20)))
        for i in range(40)
    ]
    train = [(i, t) for i, t in docs if i % 5 != 0]
    ev = [(i, t) for i, t in docs if i % 5 == 0]

    def grams(t, n=4):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    eval_set = set().union(*[grams(t) for _, t in ev])
    got = (
        decontaminate(_df(spark, train), _df(spark, ev), n=4)
        .toPandas().set_index("doc_id").sort_index()
    )
    for i, t in train:
        g = grams(t)
        assert got.loc[i, "n_grams"] == len(g)
        assert got.loc[i, "n_hit_grams"] == len(g & eval_set)
        assert bool(got.loc[i, "contaminated"]) == bool(g & eval_set)


def test_repetition_stats_closed_form(spark):
    """Hand-computed Gopher repetition metrics, incl. the edge classes:
    duplicate lines weighted by count and by chars, empty lines ignored,
    a single-line doc exercising only the n-gram leg, NULL text (unknown
    content) and empty text both reporting zeros/false."""
    from biomass_processing_pipeline_spark.operators.text import (
        repetition_stats,
    )

    df = _df(spark, [
        (1, "aa\nbb\naa\n\ncc"),   # lines aa,bb,aa,cc; no word bigrams
        (2, "x y x y x y"),         # 1 line; bigrams {x y:3, y x:2}
        (3, "l1\nl1\nl1\nl1"),      # 4 identical lines
        (4, None),
        (5, ""),
    ])
    got = repetition_stats(df).toPandas().set_index("doc_id").sort_index()
    assert got.n_lines.tolist() == [4, 1, 4, 0, 0]
    assert got.dup_line_frac.tolist() == [0.25, 0.0, 0.75, 0.0, 0.0]
    assert got.dup_line_char_frac.tolist() == [0.25, 0.0, 0.75, 0.0, 0.0]
    assert got.top_ngram_frac.tolist() == [0.0, 0.6, 0.0, 0.0, 0.0]
    # doc 2 trips top-ngram (0.6 > 0.2), doc 3 trips dup-line (0.75 > 0.3)
    assert got.repetitive.tolist() == [False, True, True, False, False]


def test_repetition_stats_matches_bruteforce(spark):
    """Deterministic pseudo-corpus (multi-line, skewed word repeats) vs a
    pure-Python reference, computed identically at 1 and 13 input
    partitions (partitioning independence)."""
    from collections import Counter

    from biomass_processing_pipeline_spark.operators.text import (
        repetition_stats,
    )

    vocab = [f"w{i}" for i in range(5)]
    docs = [
        (i, "\n".join(
            " ".join(vocab[(i + j * k * k) % 5] for k in range(2 + j % 4))
            for j in range(1 + i % 7)
        ))
        for i in range(60)
    ]

    def ref(t):
        lines = [ln for ln in t.split("\n") if ln]
        lc = Counter(lines)
        n_lines = sum(lc.values())
        nd = len(lc)
        tot = sum(c * len(ln) for ln, c in lc.items())
        dup = sum((c - 1) * len(ln) for ln, c in lc.items())
        words = t.split(" ")
        gc = Counter(
            " ".join(words[i:i + 2]) for i in range(len(words) - 1)
        )
        dl = round((n_lines - nd) / n_lines, 6) if n_lines else 0.0
        tg = (round(max(gc.values()) / sum(gc.values()), 6) if gc else 0.0)
        return (
            n_lines, dl,
            round(dup / tot, 6) if tot else 0.0, tg,
            dl > 0.30 or tg > 0.20,
        )

    for parts in (1, 13):
        got = (
            repetition_stats(_df(spark, docs).repartition(parts))
            .toPandas().set_index("doc_id").sort_index()
        )
        for i, t in docs:
            r = ref(t)
            row = got.loc[i]
            assert (
                row.n_lines, row.dup_line_frac, row.dup_line_char_frac,
                row.top_ngram_frac, bool(row.repetitive),
            ) == r, (i, t)


def test_unigram_logprob_closed_form(spark):
    """Hand-computed add-1 unigram scores against a separate reference
    corpus, incl. the unseen-token smoothing path; NULL and empty text
    report n_tokens 0 with a NULL score (unknown content has no
    likelihood), never a fake 0.0."""
    import math

    from biomass_processing_pipeline_spark.operators.text import (
        unigram_logprob,
    )

    ref = _df(spark, [(10, "a a b"), (11, "b c")])  # a:2 b:2 c:1, N=5 V=3
    df = _df(spark, [(1, "a c x"), (2, None), (3, "")])
    got = (
        unigram_logprob(df, ref=ref)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.n_tokens.tolist() == [3, 0, 0]
    exp1 = -(math.log(3 / 8) + math.log(2 / 8) + math.log(1 / 8)) / 3
    assert abs(got.loc[1, "avg_neg_logp"] - round(exp1, 6)) < 1e-9
    assert pd.isna(got.loc[2, "avg_neg_logp"])
    assert pd.isna(got.loc[3, "avg_neg_logp"])


def test_unigram_logprob_self_ref_ranking(spark):
    """Self-trained model: a doc of corpus-common words scores LOWER
    (more likely) than a doc of rare words — the CCNet head/tail split —
    and the scores are partitioning-independent."""
    from biomass_processing_pipeline_spark.operators.text import (
        unigram_logprob,
    )

    rows = [(i, "common words everywhere " * 3) for i in range(20)]
    rows += [(100, "common words everywhere common words everywhere"),
             (101, "zxq vvk jjy pqw nnm rrt")]
    a = (
        unigram_logprob(_df(spark, rows))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert a.loc[100, "avg_neg_logp"] < a.loc[101, "avg_neg_logp"]
    b = (
        unigram_logprob(_df(spark, rows).repartition(13))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert a.equals(b)


def test_scrub_pii_closed_form(spark):
    """Pattern-family goldens incl. the ordering contracts: an
    email-embedded phone is consumed by the email rule (never
    half-eaten), dotted quads go to <IP> not <PHONE>, 'g'-style
    replacement hits every occurrence, NULL text stays NULL with NULL
    counts (nothing scrubbed, nothing proven clean)."""
    from biomass_processing_pipeline_spark.operators.text import scrub_pii

    df = _df(spark, [
        (1, "write bob.smith+x@corp.example.org or sue@ex.io now"),
        (2, "server 192.168.1.100 and 10.0.0.1 up"),
        (3, "call +44 7700 900123 today"),
        (4, "+15558675309@relay.com routes calls"),
        (5, None),
        (6, "no pii here at all"),
    ])
    got = scrub_pii(df).toPandas().set_index("doc_id").sort_index()
    assert got.loc[1, "clean_text"] == "write <EMAIL> or <EMAIL> now"
    assert got.loc[1, "n_email"] == 2
    assert got.loc[2, "clean_text"] == "server <IP> and <IP> up"
    assert (got.loc[2, "n_ip"], got.loc[2, "n_phone"]) == (2, 0)
    assert got.loc[3, "clean_text"] == "call <PHONE> today"
    assert got.loc[3, "n_phone"] == 1
    # email wins over phone on the shared prefix (apply order contract)
    assert got.loc[4, "clean_text"] == "<EMAIL> routes calls"
    assert (got.loc[4, "n_email"], got.loc[4, "n_phone"]) == (1, 0)
    assert pd.isna(got.loc[5, "clean_text"])
    assert pd.isna(got.loc[5, "n_email"])
    assert got.loc[6, "clean_text"] == "no pii here at all"
    assert (
        got.loc[6, ["n_email", "n_ip", "n_phone"]].tolist() == [0, 0, 0]
    )


def test_lm_quality_split_closed_form(spark):
    """Exact tertile buckets on a known score ladder (cuts at the
    numpy-linear-interpolation values the percentile parity pins);
    NULL score -> NULL bucket (unknown quality is not a tier)."""
    import numpy as np

    from biomass_processing_pipeline_spark.operators.text import (
        lm_quality_split,
    )

    scores = [float(i) for i in range(1, 10)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(1, 10)) + [99],
        "avg_neg_logp": pd.array(scores + [None], dtype="Float64"),
    }))
    got = lm_quality_split(df).toPandas().set_index("doc_id").sort_index()
    c1 = round(float(np.percentile(scores, 100 / 3)), 6)
    c2 = round(float(np.percentile(scores, 200 / 3)), 6)
    exp = ["head" if s <= c1 else "middle" if s <= c2 else "tail"
           for s in scores]
    assert got.bucket.tolist()[:9] == exp
    assert exp.count("head") == 3 and exp.count("tail") == 3
    assert got.loc[99, "bucket"] is None or pd.isna(got.loc[99, "bucket"])


def test_langid_and_mix_sample_twin_parity_on_edge_rows(spark):
    """Contract edges the sf fixtures never exercise, pinned engine ==
    DuckDB twin (the round-5 review findings): (a) NULL text -> NULL
    lang_guess in BOTH engines (the twin's bare ELSE would misfile it
    'es'); (b) negative doc_ids hash through the same pmod wrap in both
    engines (DuckDB's sign-following % would otherwise always draw the
    Bernoulli extra)."""
    import duckdb

    from biomass_processing_pipeline_spark.operators.sampling import (
        mix_sample,
    )
    from biomass_processing_pipeline_spark.operators.text import langid_df
    from biomass_processing_pipeline_spark.queries import (
        _MIX_RATES, SQL_LANGID, _sql_mix_sample,
    )

    rows = [(-9, "the house and the garden"), (-4, None),
            (-1, "zzz qqq"), (3, "the cat is here"), (8, None)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    con = duckdb.connect()
    con.register("documents", pdf)

    lang_got = (
        langid_df(df).select("doc_id", "lang_guess").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    lang_exp = (
        con.execute(SQL_LANGID).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert lang_got.doc_id.tolist() == lang_exp.doc_id.tolist()
    assert [None if pd.isna(v) else v for v in lang_got.lang_guess] == \
        [None if pd.isna(v) else v for v in lang_exp.lang_guess]
    assert pd.isna(lang_got.set_index("doc_id").loc[-4, "lang_guess"])

    mix_got = (
        mix_sample(langid_df(df).select("doc_id", "lang_guess"),
                   "lang_guess", _MIX_RATES, key_col="doc_id")
        .toPandas().sort_values(["doc_id", "sample_copy"])
        .reset_index(drop=True)
    )
    mix_exp = (
        con.execute(_sql_mix_sample()).df()
        .sort_values(["doc_id", "sample_copy"]).reset_index(drop=True)
    )
    assert mix_got.doc_id.tolist() == mix_exp.doc_id.tolist()
    assert mix_got.sample_copy.tolist() == mix_exp.sample_copy.tolist()
