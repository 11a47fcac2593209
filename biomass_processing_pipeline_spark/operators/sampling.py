"""Deterministic training-mix sampling.

Building a training mixture from a 100 TB corpus means re-weighting
groups (languages, sources, quality buckets): downsample the
over-represented ones, upsample the scarce ones with replacement (the
CC-100 / PaLM temperature-sampling recipe). At that scale the sampler
must be

- **map-only**: the keep/replicate decision is a pure function of the
  row's key — zero exchanges, no RNG state, nothing to shuffle;
- **deterministic and engine-portable**: re-running a failed partition
  (or the whole job, or a SQL oracle) reproduces the identical sample —
  so no ``rand()``, no murmur3, just modular arithmetic on the key;
- **exact in integer space**: the Bernoulli comparison is ``h < thr``
  on two ints (the threshold precomputed in Python), so no float
  rounding can flip a row between engines.

ANSI-mode safe: the key folds into [0, 2^31) before the multiplies and
both hash multipliers are < 2^32, so every product stays under 2^63 —
no bigint-overflow tricks (CLAUDE.md rule; cells.py's shift
discipline).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Two-round multiplicative hash modulo the Mersenne prime 2^31 - 1.
# ONE round is not enough: for a dense key range 0..N-1 a single
# ``k*a + s`` is an arithmetic stride — with a small multiplier every
# small key lands BELOW any mid-range threshold (a 0.5-rate group would
# keep 100% of the first ~22k keys). Two wrapping multiplies scramble
# magnitude. Multipliers < 2^32 keep every product under 2^63
# (operands are < 2^31), so ANSI mode never overflows.
_P = 2147483647
_A1 = 2654435761  # Knuth's 2^32 golden-ratio multiplier
_A2 = 2246822519  # xxHash PRIME32_2


def sample_hash_col(key: Column, seed: int = 42) -> Column:
    """Uniform-ish int in [0, P):
    ``h = ((pmod(key, 2^31) * A1 + seed) mod P) * A2 mod P``.

    ``pmod`` keeps negative keys well-defined (SQL ``%`` follows the
    dividend's sign — an oracle twin over negative keys must wrap with
    the same pmod arithmetic, e.g. ``((k % m) + m) % m``)."""
    k = F.pmod(key.cast("long"), F.lit(1 << 31))
    h1 = F.pmod(k * F.lit(_A1) + F.lit(seed), F.lit(_P))
    return F.pmod(h1 * F.lit(_A2), F.lit(_P))


def rate_to_copies(rate: float) -> tuple[int, int]:
    """rate -> (base copies, integer Bernoulli threshold): every row
    keeps ``base = floor(rate)`` copies plus one more iff
    ``hash < thr = floor(frac(rate) * P)``. Exposed so oracles/tests
    embed the identical literals."""
    if rate < 0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    base = math.floor(rate)
    return base, math.floor((rate - base) * _P)


def pack_offsets(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    bucket_size: int = 65536,
) -> DataFrame:
    """GPT-style corpus packing layout: documents are concatenated in
    ``order_col`` order and chunked into fixed ``budget``-token training
    windows; each doc learns where it landed ->
    ``(order_col, n_tokens, start_tok, first_chunk, last_chunk)`` with
    ``start_tok`` the doc's exclusive global token prefix sum and the
    chunk ids integer-divisions of its token span (a doc may straddle
    chunks — that IS the packed-pretraining contract). ``order_col``
    must be numeric and unique: it defines both the concatenation order
    and the determinism of the layout.

    The global prefix sum is the part Spark has no scalable primitive
    for — ``Window.orderBy`` with no partition key collapses the corpus
    into ONE task. This runs the classic two-level scan instead:
    (1) docs bucket by ``order_col div bucket_size`` (order-aligned by
    construction, no sort); (2) per-bucket token sums — one partial-agg
    shuffle of ``n/bucket_size`` slim rows — take THEIR exclusive prefix
    sum on the tiny bucket table (the only ordered window, over
    ``n/bucket_size`` rows; at 10^12 docs pick ``bucket_size`` so that
    table stays small, or apply the same trick one level deeper);
    (3) the bucket offsets broadcast back and a per-bucket ordered
    window finishes the scan in parallel. Zero-token docs — NULL token
    counts included (unknown content occupies no tokens, the pinned
    rule) — keep their ``start_tok`` but report NULL chunk ids: they
    occupy no window.
    """
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    base = df.select(
        F.col(order_col),
        toks.alias("_t"),
        # integer div truncation is monotone in order_col, which is all
        # the bucketing needs (order-aligned, exact — no double rounding)
        F.expr(
            f"cast({order_col} as long) div {int(bucket_size)}"
        ).alias("_b"),
    )
    bsums = base.groupBy("_b").agg(F.sum("_t").alias("_bs"))
    w_b = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bsums.select(
        "_b", F.coalesce(F.sum("_bs").over(w_b), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.join(F.broadcast(boff), "_b").select(
        order_col, "_t",
        (F.col("_boff") + F.sum("_t").over(w_in) - F.col("_t"))
        .alias("start_tok"),
    )
    b = int(budget)
    return cum.select(
        F.col(order_col),
        F.col("_t").alias("n_tokens"),
        "start_tok",
        F.when(F.col("_t") > 0, F.expr(f"start_tok div {b}"))
        .alias("first_chunk"),
        F.when(
            F.col("_t") > 0, F.expr(f"(start_tok + _t - 1) div {b}")
        ).alias("last_chunk"),
    )


def mix_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group mixture sampling -> the input rows
    replicated ``n`` times each with a copy index ``sample_copy``
    (0..n-1), where ``n = floor(rate) + Bernoulli(frac(rate))`` for the
    row's group rate. ``rate <= 1`` downsamples, ``rate > 1`` upsamples
    with replacement; rows drawing ``n = 0`` vanish (their ``sequence``
    is empty, so ``explode`` emits nothing — no separate filter scan).

    Groups absent from ``rates`` take ``default_rate``; a NULL group is
    "absent" too (a ``when`` chain on NULL matches nothing). The
    decision hashes ``key_col`` only — adding/removing OTHER groups or
    rows never changes whether a given row survives (stable under
    incremental corpus growth, the checkpoint-resume property).

    A NULL key is an UNKNOWN identity (the pinned NULL rule): it cannot
    be hashed, so the row takes exactly ``floor(rate)`` copies and never
    draws the Bernoulli extra (``h < thr`` is NULL -> the ``when`` falls
    to 0) — deterministic, never an error, never a phantom extra copy.
    """
    g = F.col(group_col)
    base_n: Column = F.lit(rate_to_copies(default_rate)[0])
    thr: Column = F.lit(rate_to_copies(default_rate)[1])
    for grp, rate in rates.items():
        b, t = rate_to_copies(rate)
        base_n = F.when(g == grp, F.lit(b)).otherwise(base_n)
        thr = F.when(g == grp, F.lit(t)).otherwise(thr)
    h = sample_hash_col(F.col(key_col), seed)
    n = base_n + F.when(h < thr, F.lit(1)).otherwise(F.lit(0))
    # sequence(0, -1) would be DESCENDING, not empty (the word_ngrams_col
    # trap) — guard n >= 1 and let explode drop the empty arrays
    copies = F.when(n >= 1, F.sequence(F.lit(0), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("sample_copy", F.explode(copies))
