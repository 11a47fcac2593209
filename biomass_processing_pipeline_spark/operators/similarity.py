"""Similarity search over an embedding column (``array<float>``).

- :func:`brute_force_topk` — exact cosine top-k via native array math
  (``zip_with`` + ``aggregate``: JVM-side, no Python). The baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: sign-bit signature
  in one Arrow UDF, equi-join on (table, bucket) across T hash tables,
  refine exact cosine on candidates only. The 10^12-scale path: candidate
  generation is an equi-join, refine touches a tiny fraction of pairs.
- :func:`ivf_topk` — IVF: k-means-style centroids from a deterministic
  driver-side sample, assign via Arrow UDF argmax, probe the n_probe
  nearest centroid lists only (partition-pruned candidate scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine_col(a: str, b: str) -> F.Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return dot / F.sqrt(na * nb)


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, target_id, cosine, rank): exact top-k cosine neighbors
    of each query among all of ``emb`` (self excluded). Ranks by the
    6-decimal-rounded cosine with id tiebreak (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    t = emb.select(F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec"))
    j = (
        q.crossJoin(t)
        .where(F.col("query_id") != F.col("target_id"))
        .withColumn("cosine", F.round(_cosine_col("q_vec", "t_vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("target_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "target_id", "cosine", "rank")
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocked: bool = False,
    n_bits: int = 10,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    ``blocked=False``: exact all-pairs (JVM-native array math) — the
    correctness baseline, quadratic; use on candidate subsets.
    ``blocked=True``: the 100 TB path — random-hyperplane LSH buckets
    (union over ``n_tables``) generate candidates via an equi-join, exact
    cosine refines. High-cosine pairs land in the same bucket in >= 1
    table w.h.p. (miss prob ~(1 - (1 - theta/pi)^n_bits)^n_tables);
    recall is tested, not certain."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if not blocked:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        def banded(df: DataFrame, prefix: str) -> DataFrame:
            parts = []
            for t in range(n_tables):
                s = _sign_sig_udf(dim, n_bits, t)
                parts.append(df.select(
                    F.col(id_col).alias(f"id_{prefix}"),
                    F.col(vec_col).alias(f"v_{prefix}"),
                    F.lit(t).alias("table"),
                    s(F.col(vec_col)).alias("bucket"),
                ))
            u = parts[0]
            for o in parts[1:]:
                u = u.unionByName(o)
            return u

        cand = (
            banded(emb, "a").join(banded(emb, "b"), ["table", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "v_a", "v_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    scored = cand.withColumn("cosine", F.round(_cosine_col("v_a", "v_b"), 6))
    return scored.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


def _sign_sig_udf(dim: int, n_bits: int, table: int, seed: int = 42):
    rng = np.random.default_rng(seed * 1000 + table)
    planes = rng.standard_normal((n_bits, dim))

    @pandas_udf(T.LongType())
    def sig(vec: pd.Series) -> pd.Series:
        m = np.vstack(vec.to_numpy())
        bits = (m @ planes.T) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for b in range(n_bits):
            out |= bits[:, b].astype(np.int64) << b
        return pd.Series(out)

    return sig


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_bits: int = 10, n_tables: int = 8, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets, union over n_tables,
    exact-cosine refine on candidates. Recall grows with n_tables."""
    def banded(df: DataFrame, prefix: str) -> DataFrame:
        out = []
        for t in range(n_tables):
            s = _sign_sig_udf(dim, n_bits, t)
            out.append(
                df.select(
                    F.col(id_col).alias(f"{prefix}_id"),
                    F.col(vec_col).alias(f"{prefix}_vec"),
                    F.lit(t).alias("table"),
                    s(F.col(vec_col)).alias("bucket"),
                )
            )
        u = out[0]
        for o in out[1:]:
            u = u.unionByName(o)
        return u

    qb = banded(queries, "q")
    tb = banded(emb, "t")
    cand = (
        qb.join(tb, ["table", "bucket"])
        .where(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id", "q_vec", "t_vec")
        .dropDuplicates(["q_id", "t_id"])
    )
    scored = cand.withColumn("cosine", F.round(_cosine_col("q_vec", "t_vec"), 6))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("t_id").alias("target_id"),
            "cosine", "rank",
        )
    )


def train_centroids(
    emb: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample: int = 2000, iters: int = 5, seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic driver-side Lloyd iterations on a fixed sample.

    The sample is PARTITIONING-STABLE: a hash-mod filter on the id column
    + sort (``limit`` without order depends on partition scheduling and
    would make "deterministic centroids" a lie across cluster layouts).
    At 10^12 scale this would be a Spark-side kmeans|| — the centroid
    table is tiny either way; training cost is amortized across runs.
    """
    pdf = (
        emb.select(id_col, vec_col)
        .where(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), 997)
               < max(1, 997 * sample // max(emb.count(), 1)))
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    if len(pdf) < n_centroids:  # tiny tables: take everything, ordered
        pdf = emb.select(id_col, vec_col).orderBy(id_col).limit(sample).toPandas()
    m = np.vstack(pdf[vec_col].to_numpy())
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=n_centroids, replace=False)]
    for _ in range(iters):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
    return cent


def ivf_topk(
    emb: DataFrame, queries: DataFrame, centroids: np.ndarray, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", n_probe: int = 4,
) -> DataFrame:
    """IVF probe: targets live in their nearest-centroid list; queries scan
    their n_probe nearest lists (candidate pruning via equi-join)."""
    cent = centroids

    @pandas_udf(T.IntegerType())
    def assign1(vec: pd.Series) -> pd.Series:
        m = np.vstack(vec.to_numpy())
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vec: pd.Series) -> pd.Series:
        m = np.vstack(vec.to_numpy())
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    t = emb.select(
        F.col(id_col).alias("t_id"), F.col(vec_col).alias("t_vec"),
        assign1(F.col(vec_col)).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.explode(probe(F.col(vec_col))).alias("list_id"),
    )
    cand = q.join(t, "list_id").where(F.col("q_id") != F.col("t_id"))
    scored = cand.withColumn("cosine", F.round(_cosine_col("q_vec", "t_vec"), 6))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("t_id").alias("target_id"),
            "cosine", "rank",
        )
    )
