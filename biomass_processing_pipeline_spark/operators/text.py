"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting — all over the
``documents`` table, native column expressions wherever possible (the
regexp/length math is JVM-side; only the rolling-hash fingerprint needs an
Arrow UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TOKEN_RE = r"[A-Za-z0-9]+"

# tiny stopword lexicons for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "une"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace/alnum token count (BPE-ish regex tokenizer stand-in)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def quality_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha / stopword ratios + a composite score
    (the reference's plausibility-score pattern: bucketed factor means,
    crop/forest confidence at analyzers/*_v3.py)."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    tokens = token_count_col(t)
    stop_hits = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|and|of|to|in|is|that|with)\b"), 0
        )
    )
    out = (
        df.withColumn("n_chars_m", n)
        .withColumn("n_tokens", tokens)
        .withColumn("alpha_ratio", F.round(alpha / F.greatest(n, F.lit(1)), 6))
        .withColumn("digit_ratio", F.round(digits / F.greatest(n, F.lit(1)), 6))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(tokens, F.lit(1)), 6),
        )
        .withColumn(
            "avg_token_len",
            F.round(alpha / F.greatest(tokens, F.lit(1)), 6),
        )
    )
    score = (
        F.when(F.col("alpha_ratio") > 0.6, 0.4).otherwise(
            F.col("alpha_ratio") * 0.4 / 0.6
        )
        + F.when(F.col("stopword_ratio") > 0.05, 0.3).otherwise(
            F.col("stopword_ratio") * 6.0
        )
        + F.when(
            (F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 9), 0.3
        ).otherwise(0.1)
    )
    return out.withColumn("quality_score", F.round(score, 6))


def langid_df(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: count per-language stopword hits with
    native regexp, argmax with deterministic tie order (en>de>fr>es ties by
    listing order via greatest+when chain)."""
    t = F.lower(F.col(text_col))
    hits = {
        lang: F.size(
            F.regexp_extract_all(
                t, F.lit(r"\b(" + "|".join(words) + r")\b"), 0
            )
        )
        for lang, words in STOPWORDS.items()
    }
    df2 = df.select(id_col, *[h.alias(f"hits_{lang}") for lang, h in hits.items()])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    guess = F.when(best == 0, F.lit("unknown"))
    for lang in STOPWORDS:  # first max wins, dict order = priority
        guess = guess.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return df2.withColumn("lang_guess", guess)


def fingerprint_udf(window: int = 8, n_min: int = 8):
    """Rolling (Rabin-Karp) hash fingerprint: the ``n_min`` smallest
    distinct window hashes — a k-min sketch (winnowing/MOSS style).

    Compared by *overlap*, not equality: a shifted/prefixed copy keeps
    most of its window set, so most sketch entries survive; unrelated
    docs share (w.h.p.) none. Single-value min collides too often on
    small-vocabulary corpora and k-combined values break shift
    robustness — the set is the right signature.

    NULL text is UNKNOWN content (the dedup-wide rule): it gets a NULL
    fingerprint — ``explode`` consumers emit zero rows for it, and it can
    never sketch-overlap anything — instead of silently sharing the
    empty-string sketch with genuinely empty docs and every other
    quarantined doc. A real empty string keeps its whole-string hash:
    empty == empty is identical content.
    """

    @pandas_udf(T.ArrayType(T.LongType()))
    def fingerprint(text: pd.Series) -> pd.Series:
        base = np.uint64(257)
        mod = np.uint64((1 << 61) - 1)
        out = []
        with np.errstate(over="ignore"):
            for t in text:
                if pd.isna(t):  # Arrow may hand NULL as None or NaN
                    out.append(None)
                    continue
                b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
                if len(b) < window:
                    h = np.uint64(0)
                    for x in b:
                        h = (h * base + x) % mod
                    out.append([int(np.int64(h))])
                    continue
                # vectorized rolling hash: powers of base over the window
                pw = np.empty(window, dtype=np.uint64)
                pw[window - 1] = np.uint64(1)
                for j in range(window - 2, -1, -1):
                    pw[j] = (pw[j + 1] * base) % mod
                n_win = len(b) - window + 1
                idx = np.arange(window)[None, :] + np.arange(n_win)[:, None]
                hashes = (b[idx] * pw[None, :] % mod).sum(axis=1) % mod
                kmin = np.unique(hashes)[:n_min]
                out.append(kmin.astype(np.int64).tolist())
        return pd.Series(out)

    return fingerprint


def doc_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """token counts + quality + fingerprint in one projection."""
    q = quality_cols(df.select(id_col, text_col), text_col)
    return q.withColumn("fingerprint", fingerprint_udf()(F.col(text_col))).drop(
        text_col
    )


def word_ngrams_col(text: Column, n: int) -> Column:
    """Word ``n``-grams as ``array<string>`` — native ``split`` +
    ``sequence`` + ``slice``/``array_join``, no UDF (the whole expression
    stays inside whole-stage codegen).

    Docs shorter than ``n`` words produce an EMPTY array, and so does
    NULL text: unknown content can never evidence an n-gram match — the
    dedup-wide NULL rule (ARCHITECTURE.md cross-plan semantics (e)).
    The ``when`` guard is load-bearing: ``sequence(1, size-n+1)`` with a
    negative stop would generate a DESCENDING sequence, not an empty one.
    """
    words = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Unigram language-model scoring (the CCNet perplexity-filter shape,
    reduced to the model that needs no external artifact): score every
    doc by its average negative log-probability under an add-``alpha``
    smoothed unigram LM trained on ``ref`` (defaults to the corpus
    itself). Low = looks like the reference distribution; high =
    gibberish, boilerplate alphabets, wrong language — the head/middle/
    tail quality split.

    -> ``(id, n_tokens, avg_neg_logp)`` per input doc, with
    ``avg_neg_logp = round(-mean(ln((c_w + alpha) / (N + alpha * V))), 6)``
    in nats (c_w = reference count of token w, N = reference token count,
    V = reference vocabulary size; unseen tokens take c_w = 0, which is
    what the smoothing is for). Docs with no tokens — NULL text included
    (unknown content has no likelihood, the pinned NULL rule) — report
    ``n_tokens = 0`` with a NULL score, never a fake 0.0.

    A reference with no tokens at all (empty corpus, or all-NULL text)
    has no model: every scored doc gets a NULL score (the (N, V) row
    aggregates to NULL/0 and the NULL propagates through ``ln``) — the
    SQL twin's SUM-over-empty does the same, so the engines agree by
    construction rather than by a guard.

    Scale shape: the model is two aggregates (token counts + one
    (N, V) row); the scoring join is a plain hash equi-join on the token
    — the 100 TB-standard fact-dim join (vocabularies are zipfian and
    collapse under the partial agg; AQE broadcasts when small). Log
    determinism across engines rides the same round-6 contract as the
    Shannon-entropy oracle (ln both sides, one final round).
    """
    ref = df if ref is None else ref

    def _tokens(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ", -1)).alias("_tok"),
        ).where(F.length("_tok") > 0)

    counts = _tokens(ref).groupBy("_tok").agg(F.count("*").alias("_c"))
    model_size = counts.agg(
        F.sum("_c").alias("_n"), F.count("*").alias("_v")
    )
    scored = (
        _tokens(df)
        .join(counts, "_tok", "left")
        .crossJoin(model_size)
        .withColumn(
            "_lp",
            F.log(
                (F.coalesce("_c", F.lit(0)) + F.lit(alpha))
                / (F.col("_n") + F.lit(alpha) * F.col("_v"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(-F.avg("_lp"), 6).alias("avg_neg_logp"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_neg_logp",
        )
    )


# PII scrub patterns: kept to the regex subset where Java (Spark) and
# RE2 (DuckDB/at-scale engines) agree — no backrefs, no lookaround, no
# lazy quantifiers. Applied in list order; replacement tokens contain no
# digits or '@', so a later pattern can never match inside an earlier
# replacement.
#
# RECALL/PRECISION NOTE (ADVICE r05): the default phone pattern is
# deliberately recall-biased and WILL over-match legitimate numeric
# runs — any >= 9 chars of digits/spaces/hyphens ("2020 2021 2022",
# ID columns, table rows) rewrites to <PHONE>, and adjacent numbers
# separated by single spaces merge into one scrub (no upper length
# bound). The DuckDB oracle twin embeds the identical literal, so
# parity holds by construction; callers scrubbing prose corpora where
# year lists matter should pass a stricter ``patterns`` override (e.g.
# cap the run length or drop the space from the class). Changing the
# DEFAULT changes scrubbed corpora and the oracle twin in lockstep —
# do both or neither.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """PII pattern scrub (the C4-style cleaning stage): replace every
    occurrence of each ``(name, regex, token)`` pattern and count what
    was scrubbed -> ``(id, clean_text, n_<name>...)`` per doc.

    Order matters and is the caller's contract: patterns apply in list
    order against the PROGRESSIVELY scrubbed text (the default tokens
    are engineered so later patterns cannot match inside earlier
    replacements — e.g. the IP rule runs before the looser phone rule so
    dotted quads are never half-eaten as phone digits). Counts are
    measured on the text each pattern actually saw. NULL text stays
    NULL with NULL counts (unknown content — nothing was scrubbed and
    nothing was proven clean; ``regexp_extract_all`` of NULL is NULL,
    never 0).

    Map-only: native ``regexp_replace``/``regexp_extract_all`` inside
    whole-stage codegen, zero exchanges, trivially resumable — the
    100 TB shape for a full-corpus rewrite pass.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    cur = F.col(text_col)
    counts = []
    for name, rx, token in pats:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(rx), 0)).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, rx, token)
    return df.select(F.col(id_col), cur.alias("clean_text"), *counts)


def lm_quality_split(
    scored: DataFrame,
    score_col: str = "avg_neg_logp",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail split: bucket docs by exact corpus
    tertiles of their LM score (low negative-logprob = most like the
    reference distribution = ``head``). -> ``(id, score, bucket)``.

    The cuts are ONE tiny aggregate (exact interpolated percentile, the
    engine/oracle parity the ``percentiles`` query pins) broadcast back
    onto the corpus — no corpus-wide sort, no single-partition ranking
    window (an NTILE over 10^12 rows would be exactly that trap). Both
    the scores (round-6 by ``unigram_logprob``) and the cuts (round-6
    here) live on the same decimal lattice, so the boundary compare is
    engine-stable. A NULL score (a token-less/NULL doc — unscoreable)
    gets a NULL bucket: unknown quality is not a quality tier.
    """
    third = 1.0 / 3
    cuts = scored.agg(
        F.round(F.percentile(score_col, third), 6).alias("_c1"),
        F.round(F.percentile(score_col, 2 * third), 6).alias("_c2"),
    )
    s = F.col(score_col)
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        s.alias(score_col),
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(s <= F.col("_c1"), "head")
        .when(s <= F.col("_c2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    line_sep: str = "\n",
    dup_line_max: float = 0.30,
    top_ngram_max: float = 0.20,
) -> DataFrame:
    """Within-document repetition filter (the Gopher/MassiveText quality
    rules): how much of a single document is itself repeated — the
    crawl-pathology signal (boilerplate, scraped menus, keyword stuffing)
    that cross-document dedup never sees.

    -> one row per input doc:
    ``(id, n_lines, dup_line_frac, dup_line_char_frac, top_ngram_frac,
    repetitive)`` where

    - ``n_lines`` counts non-empty ``line_sep``-separated segments,
    - ``dup_line_frac`` is the fraction of those that are repeats of an
      earlier identical segment (1 - distinct/total),
    - ``dup_line_char_frac`` weights the same repeats by characters
      (Gopher's "fraction of characters in duplicate lines"),
    - ``top_ngram_frac`` is the share of the doc's word ``n``-grams taken
      by its single most frequent ``n``-gram,
    - ``repetitive`` flags docs past either threshold (computed on the
      6-dec-rounded fractions so the flag is reproducible bit-for-bit by
      the SQL oracle twin).

    NULL text is UNKNOWN content (the dedup-wide rule): it reports
    0 / 0.0 / 0.0 / 0.0 / false rather than vanishing — same contract as
    ``decontaminate``. Docs with fewer than ``n`` words report
    ``top_ngram_frac`` 0. ``line_sep`` is a plain string treated as a
    literal separator (keep it free of regex metacharacters — it feeds
    ``split``'s pattern, same convention as ``word_ngrams_col``'s space).

    Scale shape: three partial-aggregated groupBys on slim
    ``(doc_id, segment)`` rows — the explodes never shuffle whole docs,
    the per-doc merges are map-side combinable, and the final assembly is
    two left joins on the doc key. No UDFs anywhere; the whole plan stays
    inside whole-stage codegen.
    """
    t = F.col(text_col)
    lines = df.select(
        F.col(id_col), F.explode(F.split(t, line_sep, -1)).alias("_line")
    ).where(F.length("_line") > 0)
    per_line = lines.groupBy(id_col, "_line").agg(F.count("*").alias("_c"))
    per_doc_l = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("_n_lines"),
        F.count("*").alias("_nd"),
        F.sum(F.col("_c") * F.length("_line")).alias("_tot_ch"),
        F.sum((F.col("_c") - 1) * F.length("_line")).alias("_dup_ch"),
    )
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams_col(t, n)).alias("_gram")
    )
    per_doc_g = (
        grams.groupBy(id_col, "_gram")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_mx"), F.sum("_c").alias("_tot"))
    )

    def _frac(num, den):
        return F.round(
            F.when(den > 0, num / den.cast("double")).otherwise(F.lit(0.0)), 6
        )

    out = (
        df.select(id_col)
        .join(per_doc_l, id_col, "left")
        .join(per_doc_g, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_n_lines", F.lit(0)).alias("n_lines"),
            _frac(F.col("_n_lines") - F.col("_nd"),
                  F.coalesce("_n_lines", F.lit(0))).alias("dup_line_frac"),
            _frac(F.col("_dup_ch"),
                  F.coalesce("_tot_ch", F.lit(0))).alias("dup_line_char_frac"),
            _frac(F.col("_mx"),
                  F.coalesce("_tot", F.lit(0))).alias("top_ngram_frac"),
        )
    )
    return out.withColumn(
        "repetitive",
        (F.col("dup_line_frac") > dup_line_max)
        | (F.col("top_ngram_frac") > top_ngram_max),
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with an evaluation/benchmark set (the GPT-3 appendix-C
    / PaLM eval-overlap rule, re-expressed relationally).

    -> one row per ``train`` doc:
    ``(id, n_grams, n_hit_grams, contaminated)`` where ``n_grams`` counts
    the doc's DISTINCT n-grams and ``n_hit_grams`` those that occur
    anywhere in the eval set. Docs too short for one n-gram (or NULL
    text) report 0/0/false rather than vanishing.

    Scale shape (100 TB corpus vs benchmark-sized eval set): the eval
    distinct-gram table is tiny (benchmarks are thousands of docs), so it
    BROADCASTS and the contamination probe is a map-side semi-join; the
    train side's n-gram explode never shuffles raw text — the only
    exchanges carry slim ``(doc_id, gram)`` rows for the per-doc distinct
    + counts, both partial-aggregated. No UDFs anywhere on the path.
    """
    tg = train.select(
        F.col(id_col),
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"),
    ).distinct()
    eg = eval_docs.select(
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram")
    ).distinct()
    per_doc = tg.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        tg.join(F.broadcast(eg), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
        )
        .withColumn("contaminated", F.col("n_hit_grams") > 0)
    )
