"""Deduplication suite for large-scale training-data pipelines.

Four families, all expressed so the expensive comparisons ride on Spark
joins/aggregations (no driver-side loops):

- **exact**: md5 over normalized content -> groupBy -> keep min id. One
  shuffle on the hash; at 10^12 rows this is the canonical hash-partition
  dedup.
- **MinHash + LSH**: char-k shingles hashed in one Arrow UDF (numpy) ->
  n_hashes minhash signature via (a*x+b) mod p permutations -> banding ->
  self-join on (band_idx, band_hash) -> exact-Jaccard refine with native
  ``array_intersect``/``array_union`` on the shingle-hash arrays. The
  band join is an equi-join on a high-cardinality key — sort-merge/shuffle
  friendly and skew-salted if a band bucket explodes.
- **SimHash**: 64-bit signature from token hashes; candidate pairs via
  4x16-bit block banding (two signatures within Hamming distance<=3 share
  a block by pigeonhole); refine on exact Hamming distance with
  ``bit_count(xor)``.
- **n-gram Jaccard**: exact all-pairs similarity over an inverted shingle
  index (explode -> self-join -> count/union arithmetic) — the quadratic
  fallback; use on candidate subsets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative per identical content (md5 key)."""
    h = df.select(F.col(id_col), F.md5(F.col(content_col)).alias("_h"))
    return h.groupBy("_h").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def _fnv_matrix(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the rows of a (n, k) uint8 matrix — one
    column-sweep of uint64 vector ops instead of a per-byte Python loop
    (same math as hash_bytes_np for identical byte strings)."""
    with np.errstate(over="ignore"):
        h = np.full(mat.shape[0], 1469598103934665603, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for col in range(mat.shape[1]):
            h = (h ^ mat[:, col].astype(np.uint64)) * prime
        return (h & np.uint64(_MERSENNE)).astype(np.int64)


def _shingle_udf(k: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def shingles(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            b = np.frombuffer((t or "").lower().encode(), dtype=np.uint8)
            if len(b) < k:
                out.append(
                    [int(hash_bytes_np(np.array([bytes(b)], dtype=object))[0])]
                )
                continue
            # k-byte shingles via a strided window view (char==byte for
            # ASCII corpora; shingling is defined over BYTES)
            windows = np.lib.stride_tricks.sliding_window_view(b, k)
            out.append(np.unique(_fnv_matrix(windows)).tolist())
        return pd.Series(out)

    return shingles


def hash_bytes_np(arr: np.ndarray) -> np.ndarray:
    """Stable 61-bit polynomial hash of byte strings (numpy object array).

    Deterministic across executors/partitions (unlike Python's builtin
    ``hash`` which is salted per process).
    """
    out = np.empty(len(arr), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i, b in enumerate(arr):
            h = np.uint64(1469598103934665603)
            for byte in b:
                h = (h ^ np.uint64(byte)) * np.uint64(1099511628211)
            out[i] = np.int64(h & np.uint64(_MERSENNE))
    return out


def _minhash_udf(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash(shingles: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for sh in shingles:
                x = np.asarray(sh, dtype=np.uint64)
                # (a*x + b) mod p per permutation; min over shingles
                sig = (
                    (a.astype(np.uint64)[:, None] * x[None, :]
                     + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
                ).min(axis=1)
                out.append(sig.astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def with_shingles(df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    return df.withColumn("shingles", _shingle_udf(k)(F.col(text_col)))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs with exact Jaccard >= threshold
    among LSH candidates (id_a < id_b)."""
    rows_per_band = n_hashes // bands
    sh = with_shingles(df.select(id_col, text_col), text_col, shingle_k)
    sig = sh.withColumn("sig", _minhash_udf(n_hashes)(F.col("shingles")))
    banded = sig.select(
        F.col(id_col), "shingles",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band_idx, "
                f"hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band})) as band_hash))"
            )
        ).alias("bh"),
    ).select(id_col, "shingles", "bh.band_idx", "bh.band_hash")
    # consumed as BOTH sides of the self-join -> compute signatures once
    banded = banded.localCheckpoint(eager=False)

    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"),
        "band_idx", "band_hash",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"),
        "band_idx", "band_hash",
    )
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = cand.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def _simhash_udf():
    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            tokens = (t or "").lower().split()
            if not tokens:
                out[i] = 0
                continue
            hs = hash_bytes_np(np.array([w.encode() for w in tokens], dtype=object))
            bits = ((hs.astype(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int32)
            vote = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for bpos in np.nonzero(vote > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return simhash


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """-> (id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Complete for max_hamming <= 3 by pigeonhole over 4 16-bit blocks.
    """
    sig = df.select(id_col, _simhash_udf()(F.col(text_col)).alias("sig"))
    blocks = sig.select(
        id_col, "sig",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "b -> struct(b as blk, shiftright(sig, b * 16) & 65535 as blk_val))"
            )
        ).alias("b"),
    ).select(id_col, "sig", "b.blk", "b.blk_val")
    left = blocks.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "blk", "blk_val"
    )
    right = blocks.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "blk", "blk_val"
    )
    cand = (
        left.join(right, ["blk", "blk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    )
    return ham.where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def jaccard_topk(
    df: DataFrame, text_col: str, id_col: str, k: int = 3,
    query_mod: int = 25, shingle_k: int = 5,
) -> DataFrame:
    """Top-k most-similar docs (exact n-gram Jaccard, 6-dec rounded) for
    each query doc (``id % query_mod == 0``): inverted shingle index ->
    intersection counts -> window rank. SQL-oracle-able."""
    from pyspark.sql import Window

    sh = with_shingles(df.select(id_col, text_col), text_col, shingle_k)
    inv = sh.select(
        F.col(id_col), F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    q = inv.where(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col("n_sh").alias("nq"), "shingle"
    )
    t = inv.select(
        F.col(id_col).alias("target_id"), F.col("n_sh").alias("nt"), "shingle"
    )
    inter = (
        q.join(t, "shingle")
        .where(F.col("query_id") != F.col("target_id"))
        .groupBy("query_id", "target_id", "nq", "nt")
        .agg(F.count("*").alias("ni"))
    )
    scored = inter.withColumn(
        "jaccard",
        F.round(F.col("ni") / (F.col("nq") + F.col("nt") - F.col("ni")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("target_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "target_id", "jaccard", "rank")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold: float = 0.5, shingle_k: int = 5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted index (explode ->
    self-join on shingle -> pair counts; |union| = |A|+|B|-|inter|)."""
    sh = with_shingles(df.select(id_col, text_col), text_col, shingle_k)
    sized = sh.select(id_col, F.size("shingles").alias("n_sh"), "shingles")
    inv = sized.select(
        id_col, "n_sh", F.explode("shingles").alias("shingle")
    )
    a = inv.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = inv.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
