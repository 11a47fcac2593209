"""Similarity search over an embedding column (``array<float>``).

- :func:`brute_force_topk` — exact cosine top-k via native array math
  (``zip_with`` + ``aggregate``: JVM-side, no Python). The baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: sign-bit signature
  in one Arrow UDF, equi-join on (table, bucket) across T hash tables,
  refine exact cosine on candidates only. The 10^12-scale path: candidate
  generation is an equi-join, refine touches a tiny fraction of pairs.
- :func:`ivf_topk` — IVF: distributed deterministic Lloyd centroids
  (hash-fraction sample, per-partition vector-sum partials), assign via
  Arrow UDF argmin, probe the n_probe nearest centroid lists only
  (partition-pruned candidate scan).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_D6 = Decimal("0.000001")


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
    # try_divide: a zero-norm vector has no defined cosine -> NULL (which
    # every downstream threshold/rank filter excludes). Plain `/` THROWS
    # under Spark 4's default ANSI mode — one degenerate row would
    # otherwise kill the whole job. nanvl: a NaN/inf ELEMENT inside a
    # vector makes the ratio NaN (NaN dot / NaN norm, or inf/inf) — and
    # Spark ORDERS NaN above every double and evaluates `NaN >= t` as
    # true, so an un-masked NaN would outrank every real neighbor and
    # match every threshold. Map it to NULL so all four consumers
    # (brute-force rank, dup threshold, LSH refine, IVF probe) exclude
    # it — exactly the matmul fast path's non-finite mask.
    return F.nanvl(
        F.try_divide(dot, F.sqrt(na * nb)), F.lit(None).cast("double")
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    broadcast_elems: int = 16_000_000, broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """-> (query_id, target_id, cosine, rank): exact top-k cosine neighbors
    of each query among all of ``emb`` (self excluded). Ranks by the
    6-decimal-rounded cosine with id tiebreak (deterministic).

    Two plans (the kNN local-index / minhash CSR-refine pattern):

    - **broadcast matmul** (target side <= ``broadcast_elems`` floats AND
      <= ``broadcast_rows`` rows — BOTH bounds, the collect and the id
      dict pay O(rows) regardless of element count): targets pack ONCE
      into an (N, dim) float64 matrix broadcast to the workers; each
      Arrow batch of queries scores all targets in one BLAS matmul and
      selects top-k locally — map-only, no crossJoin rows, no per-element
      lambda evaluation. Ranking ties are resolved on the 6-decimal
      ROUNDED cosine exactly as the window plan does.
    - **crossJoin + native array math** (the fallback): JVM-side
      ``zip_with``/``aggregate`` per pair + window top-k. Quadratic rows —
      the correctness baseline; pin with ``broadcast_elems=0``.

    Both plans order by (rounded cosine desc, target_id asc); a parity
    test pins them row-identical. Degenerate (zero-norm) vectors have no
    defined cosine: pairs involving one NEVER match, in BOTH plans (the
    crossJoin plan filters the NaN ratio, the matmul plan masks it) — a
    zero-norm QUERY yields zero output rows, a zero-norm TARGET is
    excluded from every ranking.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    t = emb.select(F.col(id_col).alias("target_id"), F.col(vec_col).alias("t_vec"))
    if broadcast_elems > 0:
        n_t, dim, dim_min = emb.agg(
            F.count(vec_col), F.max(F.size(vec_col)), F.min(F.size(vec_col)),
        ).head() or (0, 0, 0)
        # the packed matrix needs a rectangular target side. NULL targets
        # are semantics-free to drop (a NULL vector has a defined cosine
        # with nothing, in either plan) — filter them off the packed side
        # rather than forfeiting the map-only plan for the whole corpus
        # because one upstream-quarantined row exists. RAGGED corpora
        # (dim_min != dim among non-NULL rows) still route to the
        # crossJoin plan: two equal-length off-dim vectors DO have a
        # defined cosine there, which a modal-dim filter would lose.
        if (n_t or 0) and n_t * (dim or 0) <= broadcast_elems and (
            n_t <= broadcast_rows
        ) and (dim_min or 0) == (dim or 0):
            return _topk_matmul_broadcast(
                q, t.where(F.col("t_vec").isNotNull()), k
            )
    j = (
        q.crossJoin(t)
        .where(F.col("query_id") != F.col("target_id"))
        .withColumn("cosine", F.round(_cosine_col("q_vec", "t_vec"), 6))
        # zero-norm vectors: try_divide -> NULL cosine — drop, matching
        # the matmul plan's mask (a degenerate pair never ranks)
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("target_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "target_id", "cosine", "rank")
    )


def _spark_round6(a: np.ndarray) -> np.ndarray:
    """Exactly Spark's ``round(x, 6)`` on doubles: HALF_UP on the SHORTEST
    DECIMAL REPR (java ``BigDecimal.valueOf`` = ``Double.toString``), which
    ``repr(float)`` reproduces bit-for-bit. NOT ``np.round`` — numpy rounds
    the binary value half-even, so e.g. 2.5e-06 -> 2e-06 under numpy but
    3e-06 under Spark. Deduped before the per-value Decimal hop, so a
    mass-tie corpus (all-identical vectors) costs one conversion, not N."""
    uniq, inv = np.unique(a, return_inverse=True)
    out = np.fromiter(
        (float(Decimal(repr(v)).quantize(_D6, rounding=ROUND_HALF_UP))
         for v in uniq.tolist()),
        dtype=np.float64, count=len(uniq),
    )
    return out[inv]


def _topk_matmul_broadcast(q: DataFrame, t: DataFrame, k: int) -> DataFrame:
    """Map-only exact top-k: targets as a broadcast (N, dim) float64 matrix,
    one BLAS matmul per query chunk, local (rounded-cosine desc, id asc)
    selection. Bit-identical rows to the crossJoin window plan: the BLAS
    scores only SELECT a candidate band — raw top-k plus a 1.1e-6 safety
    margin (6-dec rounding moves a double by <= 5e-7 and fold-vs-BLAS
    summation order by ~1 ulp, so no row outside the band can enter the
    rounded top-k) — and the band is then RE-SCORED with the HOF fold's
    exact arithmetic: per-element double products summed strictly left to
    right (``np.cumsum`` is a sequential scan, bit-identical to
    ``aggregate(..., acc + x)``), divided by ``sqrt(na * nb)`` in that
    exact expression shape, then :func:`_spark_round6` + id tiebreak. A
    blocked-BLAS dot that lands 1 ulp across a HALF_UP half-boundary
    therefore cannot flip the emitted 6th decimal vs the window plan."""
    t_pdf = t.toPandas()
    ids = t_pdf["target_id"].to_numpy()
    mat = (
        np.vstack(t_pdf["t_vec"].to_numpy()).astype(np.float64)
        if len(t_pdf) else np.empty((0, 0), np.float64)
    )
    t_norm = np.sqrt((mat * mat).sum(axis=1))
    # sequential-fold sum of squares per target (the HOF nb), for the
    # band re-score — cumsum's last column IS the left-to-right fold
    t_n2_seq = (
        np.cumsum(mat * mat, axis=1)[:, -1]
        if mat.shape[1] else np.zeros(len(ids))
    )
    id_pos = {v: i for i, v in enumerate(ids)}
    bc = q.sparkSession.sparkContext.broadcast(
        {"ids": ids, "mat": mat, "t_norm": t_norm, "t_n2_seq": t_n2_seq,
         "id_pos": id_pos}
    )
    out_schema = T.StructType([
        T.StructField("query_id", q.schema["query_id"].dataType),
        T.StructField("target_id", t.schema["target_id"].dataType),
        T.StructField("cosine", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ])

    def gen(batches):
        d = bc.value
        ids, mat, t_norm, t_n2_seq, id_pos = (
            d["ids"], d["mat"], d["t_norm"], d["t_n2_seq"], d["id_pos"],
        )
        n_t = len(ids)
        # bound the B x N score block to ~32 MB whatever the target count
        step = max(1, 4_000_000 // max(n_t, 1))
        for pdf in batches:
            if len(pdf) == 0 or n_t == 0:
                continue
            dim = mat.shape[1]
            qv_all = pdf["q_vec"].to_numpy()
            # NULL / ragged query vectors: the crossJoin plan gives them a
            # NULL cosine against every target (zero output rows for that
            # query) — skip them here for the same result instead of
            # letting np.vstack kill the task
            q_ok = np.fromiter(
                (v is not None and len(v) == dim for v in qv_all),
                dtype=bool, count=len(qv_all),
            )
            if not q_ok.any():
                continue
            qids_all = pdf["query_id"].to_numpy()[q_ok]
            qm_all = np.vstack(qv_all[q_ok]).astype(np.float64)
            for s in range(0, len(qids_all), step):
                qids = qids_all[s:s + step]
                qm = qm_all[s:s + step]
                q_norm = np.sqrt((qm * qm).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    scores = (
                        (qm @ mat.T) / (q_norm[:, None] * t_norm[None, :])
                    )
                # zero-norm query/target -> NaN: mask to -inf so the
                # selection below excludes it, exactly as the crossJoin
                # plan's isnan filter does. (A NULL ELEMENT inside a
                # vector also lands here as NaN — the HOF plan's NULL
                # product excludes exactly the same pairs.)
                scores[~np.isfinite(scores)] = -np.inf
                oq, ot, oc, orank = [], [], [], []
                for i in range(len(qids)):
                    row = scores[i]
                    self_pos = id_pos.get(qids[i])
                    if self_pos is not None:
                        row = row.copy()
                        row[self_pos] = -np.inf
                    kk = min(k, n_t)
                    if n_t > kk:
                        part = np.argpartition(-row, kk - 1)
                        kth = row[part[kk - 1]]
                        # 1.1e-6 band: any row the ROUNDED ordering could
                        # still admit (rounding displaces <= 5e-7 + ulp)
                        cand = np.flatnonzero(row >= kth - 1.1e-6)
                    else:
                        cand = np.arange(n_t)
                    cand = cand[row[cand] > -np.inf]
                    if cand.size:
                        # exact re-score of the band with the HOF fold's
                        # arithmetic: sequential-order dot and norms,
                        # dot / sqrt(na * nb) in that expression shape
                        # + 0.0: the fold starts at literal 0.0, so its
                        # zero is always +0.0; cumsum's can be -0.0
                        prod = qm[i][None, :] * mat[cand]
                        dots = np.cumsum(prod, axis=1)[:, -1] + 0.0
                        q_n2 = np.cumsum(qm[i] * qm[i])[-1]
                        with np.errstate(divide="ignore", invalid="ignore"):
                            exact = dots / np.sqrt(q_n2 * t_n2_seq[cand])
                        keep = np.isfinite(exact)
                        cand, exact = cand[keep], exact[keep]
                    else:
                        exact = row[cand]
                    r6 = _spark_round6(exact)
                    sortp = np.lexsort((ids[cand], -r6))[:kk]
                    order = cand[sortp]
                    m = len(order)
                    oq.append(np.repeat(qids[i], m))
                    ot.append(ids[order])
                    oc.append(r6[sortp])
                    orank.append(np.arange(1, m + 1, dtype=np.int32))
                if oq:
                    yield pd.DataFrame({
                        "query_id": np.concatenate(oq),
                        "target_id": np.concatenate(ot),
                        "cosine": np.concatenate(oc),
                        "rank": np.concatenate(orank),
                    })

    return q.mapInPandas(gen, schema=out_schema)


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
        cand_ids = (
            _banded_slim(emb, id_col, vec_col, "id_a", dim, n_bits, n_tables)
            .join(_banded_slim(emb, id_col, vec_col, "id_b", dim, n_bits,
                               n_tables),
                  ["table", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        # vectors join back onto CANDIDATES only — the banded self-join
        # above shuffles 3 longs/row, never the embeddings
        # (dedup.minhash_lsh_pairs pattern; at 768-dim x 10^12 rows a
        # vector-fat band shuffle would be the dominant job cost)
        cand = cand_ids.join(a, "id_a").join(b, "id_b")
    scored = cand.withColumn("cosine", F.round(_cosine_col("v_a", "v_b"), 6))
    return scored.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


# hyperplane matrices are deterministic in (seed, table) — cache per
# executor process so repeated Arrow batches (and repeated queries in one
# session) never regenerate them
_PLANES_CACHE: dict[tuple, np.ndarray] = {}


def _all_planes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    key = (dim, n_bits, n_tables, seed)
    p = _PLANES_CACHE.get(key)
    if p is None:
        p = _PLANES_CACHE[key] = np.stack([
            np.random.default_rng(seed * 1000 + t).standard_normal((n_bits, dim))
            for t in range(n_tables)
        ])
    return p


def _clean_vec_rows(vals: np.ndarray, dim: int):
    """Row-wise quarantine mask for an Arrow batch of vectors: a row is
    CLEAN iff the vector is non-NULL, exactly ``dim`` long, and every
    element is finite (a NULL element arrives from Arrow as NaN). Returns
    ``(ok_mask, packed_float64_matrix_of_clean_rows)``. Shared by the LSH
    signature, IVF assign and IVF probe kernels so one poisoned row
    quarantines instead of crashing ``np.vstack`` or — worse — riding
    into a centroid sum."""
    ok = np.fromiter(
        (v is not None and len(v) == dim for v in vals),
        dtype=bool, count=len(vals),
    )
    if not ok.any():
        return ok, np.empty((0, dim), np.float64)
    m = np.vstack(vals[ok]).astype(np.float64)
    finite = np.isfinite(m).all(axis=1)
    if not finite.all():
        ok[np.flatnonzero(ok)[~finite]] = False
        m = m[finite]
    return ok, m


def _buckets_udf(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    """ONE Arrow pass emitting every table's bucket: array<long> indexed by
    table (posexplode downstream). Replaces n_tables separate UDF
    invocations (8 Arrow transfers of the corpus -> 1). Poisoned rows
    (NULL / ragged / non-finite vectors) emit a NULL bucket array —
    posexplode drops them, so they simply never band (their cosine is
    undefined: they could never survive the refine anyway)."""
    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vec: pd.Series) -> pd.Series:
        planes = _all_planes(dim, n_bits, n_tables, seed)
        vals = vec.to_numpy()
        ok, m = _clean_vec_rows(vals, dim)
        weights = np.left_shift(
            np.ones(n_bits, dtype=np.int64), np.arange(n_bits, dtype=np.int64)
        )
        out = np.empty((len(m), n_tables), dtype=np.int64)
        for t in range(n_tables):
            # per-table matmul keeps the float summation order identical
            # to the legacy per-table UDF: same sign bits, same buckets
            out[:, t] = ((m @ planes[t].T) > 0) @ weights
        res = np.full(len(vals), None, dtype=object)
        res[np.flatnonzero(ok)] = list(out)
        return pd.Series(res)

    # deterministic in fact, but flagged nondeterministic so Catalyst's
    # generate-pushdown (size(bks) > 0) can't DUPLICATE the Arrow eval —
    # without this the corpus crosses into Python twice per side
    return buckets.asNondeterministic()


def _banded_slim(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str,
    dim: int, n_bits: int, n_tables: int, seed: int = 42,
) -> DataFrame:
    """Slim banded table (id, table, bucket) — 3 longs/row into the band
    exchange; vectors stay behind and join back by id post-candidate."""
    b = df.select(
        F.col(id_col).alias(id_alias),
        _buckets_udf(dim, n_bits, n_tables, seed)(F.col(vec_col)).alias("bks"),
    )
    return b.select(
        id_alias, F.posexplode("bks").alias("table", "bucket")
    )


def lsh_candidates(
    emb: DataFrame, queries: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_bits: int = 10, n_tables: int = 8, dim: int = 64,
) -> DataFrame:
    """-> (q_id, t_id): distinct bucket-collision candidate pairs across
    the n_tables hash tables (the non-SQL-expressible half of lsh_topk —
    the oracle freezes this set and refines it with exact SQL cosine)."""
    return (
        _banded_slim(queries, id_col, vec_col, "q_id", dim, n_bits, n_tables)
        .join(_banded_slim(emb, id_col, vec_col, "t_id", dim, n_bits,
                           n_tables),
              ["table", "bucket"])
        .where(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id")
        .dropDuplicates(["q_id", "t_id"])
    )


def cosine_refine_topk(
    cand_ids: DataFrame, emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Shared exact-cosine refine: (q_id, t_id) candidates + vectors joined
    back by id -> 6-dec-rounded cosine -> per-query top-k (target-id
    tiebreak). SQL-expressible given the candidate set — the oracle path
    for every ANN variant."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    t = emb.select(F.col(id_col).alias("t_id"), F.col(vec_col).alias("t_vec"))
    scored = (
        cand_ids.join(q, "q_id").join(t, "t_id")
        .withColumn("cosine", F.round(_cosine_col("q_vec", "t_vec"), 6))
        # a zero-norm/poisoned vector scores NULL (_cosine_col contract):
        # it must never hold a top-k slot — same exclusion brute_force_topk
        # applies, so LSH/IVF and brute force agree on such inputs
        .where(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"), F.col("t_id").alias("target_id"),
            "cosine", "rank",
        )
    )


def lsh_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_bits: int = 10, n_tables: int = 8, dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets across n_tables hash
    tables (one signature UDF pass + posexplode), slim (id, table, bucket)
    candidate equi-join, exact-cosine refine with vectors joined back onto
    candidates only. Recall grows with n_tables."""
    cand_ids = lsh_candidates(emb, queries, id_col, vec_col,
                              n_bits, n_tables, dim)
    return cosine_refine_topk(cand_ids, emb, queries, k, id_col, vec_col)


def _sq_dists(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(batch x lists) squared distances via ||a||^2 - 2ab + ||b||^2.

    The naive broadcast form ``((m[:,None,:] - cent[None,:,:])**2).sum(2)``
    materializes a batch x lists x dim float64 tensor — 1.6 GB per 4096-row
    Arrow batch at 768-dim x 64 lists, which thrashes every executor
    worker at once. The matmul expansion peaks at batch x lists."""
    return (
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )


def _assign_udf(centroids: np.ndarray):
    """argmin-distance list assignment against broadcast centroids.
    Poisoned rows (NULL / ragged / non-finite vectors) get a NULL
    list_id — the downstream equi-join never matches it, so they
    quarantine instead of landing in an arbitrary list (``np.argmin``
    returns the FIRST NaN index on a NaN distance row)."""
    cent = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(T.IntegerType())
    def assign1(vec: pd.Series) -> pd.Series:
        vals = vec.to_numpy()
        ok, m = _clean_vec_rows(vals, cent.shape[1])
        out = pd.Series([None] * len(vals), dtype="Int32")
        if len(m):
            out.iloc[np.flatnonzero(ok)] = (
                _sq_dists(m, cent).argmin(axis=1).astype(np.int32)
            )
        return out

    return assign1


def _probe_udf(centroids: np.ndarray, n_probe: int):
    """n_probe nearest centroid lists per query vector. Poisoned query
    rows (NULL / ragged / non-finite) get a NULL list array — explode
    drops them, yielding zero result rows for that query, exactly the
    brute-force plans' quarantine semantics."""
    cent = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vec: pd.Series) -> pd.Series:
        vals = vec.to_numpy()
        ok, m = _clean_vec_rows(vals, cent.shape[1])
        res = np.full(len(vals), None, dtype=object)
        if len(m):
            order = np.argsort(_sq_dists(m, cent), axis=1)[:, :n_probe]
            res[np.flatnonzero(ok)] = [
                row.astype(np.int32).tolist() for row in order
            ]
        return pd.Series(res)

    return probe


def train_centroids(
    emb: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample_permille: int = 100, iters: int = 5, seed: int = 42,
    id_col: str = "vec_id", tol: float = 0.0, dim: int | None = None,
) -> np.ndarray:
    """DISTRIBUTED, deterministic Lloyd training (Spark-side; no
    driver-resident sample matrix, no sizing ``count()`` pass).

    - training set: partitioning-stable hash-threshold sample — a fixed
      FRACTION (``sample_permille``/1000), so corpus size is never
      queried; at 10^12 rows lower the fraction instead of collecting
    - init: ``n_centroids`` seed rows in (hash, id) order — a global sort
      of the tiny projected sample, deterministic across partitionings
    - per iteration: assign via the SAME argmin UDF the probe path uses
      (centroids ride the closure/broadcast); the centroid update is a
      PER-PARTITION vector-sum partial aggregation in one Arrow pass —
      each partition emits at most ``n_centroids`` ``(list_id, n,
      sum_vec)`` rows, so the driver receives O(partitions x centroids)
      slim rows instead of a rows x dim element-wise shuffle (at 768-dim
      the old posexplode update was the dominant training cost). Partials
      are combined in sorted order and the updated centroids ROUNDED to
      9 decimals so distributed float summation order cannot leak into
      the result (partitioning-independence is tested)
    - ``tol`` > 0 stops early once the max centroid movement of an
      iteration falls below it (movement of deterministic rounded
      centroids — the early exit is itself deterministic)
    - empty lists keep their previous centroid; a sample smaller than
      ``n_centroids`` falls back to training on the full table
    - poisoned vectors (NULL vector, or any NULL/NaN/inf element)
      QUARANTINE from training: one NaN element in a sampled vector (or a
      seed) would make a NaN centroid, and ``np.argmin`` returns the
      first-NaN index, funneling EVERY vector into the poisoned list on
      the next iteration — at corpus scale a single bad row would
      otherwise destroy the whole index. With ``dim`` given, wrong-length
      (ragged/truncated) vectors quarantine the same way; without it they
      raise loudly in the seed/partial ``np.vstack`` (a mixed-dim corpus
      with no declared dim is a config error, not dirty data).
    """
    dirty = lambda x: (  # noqa: E731 — tiny HOF predicate
        x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    ok_vec = F.col(vec_col).isNotNull() & ~F.exists(F.col(vec_col), dirty)
    if dim is not None:
        ok_vec = ok_vec & (F.size(F.col(vec_col)) == F.lit(dim))
    clean = emb.select(id_col, vec_col).where(ok_vec)
    train = clean.where(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1000))
        < F.lit(sample_permille)
    )
    seeds = (
        train
        .orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)),
                        F.lit(1 << 31)),
                 F.col(id_col))
        .limit(n_centroids)
        .toPandas()
    )
    if len(seeds) < n_centroids:  # tiny tables: train on everything clean
        train = clean
        seeds = (
            train
            .orderBy(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)),
                            F.lit(1 << 31)),
                     F.col(id_col))
            .limit(n_centroids)
            .toPandas()
        )
    cent = np.vstack(seeds[vec_col].to_numpy()).astype(np.float64)

    def _partials(batches):
        # one slim row per (partition, non-empty list): the whole
        # partition's vectors fold into n_centroids running sums
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            lids = pdf["list_id"].to_numpy()
            for lid in np.unique(lids):
                mask = lids == lid
                s = m[mask].sum(axis=0)
                k = int(lid)
                if k in sums:
                    sums[k] += s
                    counts[k] += int(mask.sum())
                else:
                    sums[k] = s
                    counts[k] = int(mask.sum())
        if sums:
            order = sorted(sums)
            yield pd.DataFrame({
                "list_id": order,
                "n": [counts[k] for k in order],
                "s": [sums[k] for k in order],
            })

    for _ in range(iters):
        assigned = train.select(
            _assign_udf(cent)(F.col(vec_col)).alias("list_id"),
            F.col(vec_col).alias("v"),
        )
        parts = assigned.mapInPandas(
            _partials, schema="list_id int, n long, s array<double>"
        ).toPandas()
        new = cent.copy()
        # deterministic driver combine: partials added in sorted order
        rows = sorted(
            ((int(r.list_id), int(r.n), np.asarray(r.s, dtype=np.float64))
             for r in parts.itertuples(index=False)),
            key=lambda t: (t[0], t[1], tuple(t[2])),
        )
        acc: dict[int, tuple[np.ndarray, int]] = {}
        for lid, n, s in rows:
            if lid in acc:
                acc[lid] = (acc[lid][0] + s, acc[lid][1] + n)
            else:
                acc[lid] = (s, n)
        for lid, (s, n) in acc.items():
            new[lid] = s / n
        new = np.round(new, 9)
        moved = float(np.max(np.abs(new - cent))) if len(cent) else 0.0
        cent = new
        if tol > 0 and moved < tol:
            break
    return cent


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """-> (t_id, list_id): each target vector's inverted-list id."""
    return emb.select(
        F.col(id_col).alias("t_id"),
        _assign_udf(centroids)(F.col(vec_col)).alias("list_id"),
    )


def ivf_probe(
    queries: DataFrame, centroids: np.ndarray, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """-> (q_id, list_id): one row per (query, probed list)."""
    return queries.select(
        F.col(id_col).alias("q_id"),
        F.explode(
            _probe_udf(centroids, n_probe)(F.col(vec_col))
        ).alias("list_id"),
    )


def ivf_candidates(
    emb: DataFrame, queries: DataFrame, centroids: np.ndarray,
    n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """-> (q_id, t_id): targets in any of the query's n_probe nearest
    lists (slim two-column assignment tables into the equi-join; each pair
    appears at most once since a target lives in exactly one list)."""
    return (
        ivf_probe(queries, centroids, n_probe, id_col, vec_col)
        .join(ivf_assign(emb, centroids, id_col, vec_col), "list_id")
        .where(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id")
    )


def ivf_topk(
    emb: DataFrame, queries: DataFrame, centroids: np.ndarray, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", n_probe: int = 4,
) -> DataFrame:
    """IVF probe: targets live in their nearest-centroid list; queries scan
    their n_probe nearest lists (candidate pruning via equi-join). The
    list assignment tables are slim (two ints/longs per row); vectors join
    onto candidates by id."""
    cand = ivf_candidates(emb, queries, centroids, n_probe, id_col, vec_col)
    return cosine_refine_topk(cand, emb, queries, k, id_col, vec_col)


def semdedup_groups(
    emb: DataFrame,
    assign: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding corpus, connect
    within-cluster pairs whose cosine clears ``threshold``, keep ONE doc
    per connected component (min-id representative — the repo-wide tie
    rule).

    ``assign``: the ``(t_id, list_id)`` cluster table (``ivf_assign``
    output; pass a FROZEN copy for reproducible pipelines — the oracle
    does). -> ``(id, rep_id, is_kept)``, one row per input vector;
    vectors with no in-cluster near-dup keep themselves, and so do
    NULL / zero-norm / non-finite vectors (NULL ``list_id`` never
    equi-joins; a NULL cosine never clears the threshold — the pinned
    unknown-matches-nothing rule).

    Scale shape: the candidate self-join carries two longs per row
    (vectors join back onto surviving candidates only, the
    ``cosine_dup_pairs`` pattern), within-cluster pair count is bounded
    by ``n_centroids`` at training time (more lists = smaller clusters =
    fewer pairs — SemDeDup's own epsilon-ball economics), and the
    component pass is ``scoped_components``' single Arrow union-find per
    cluster: edges never cross a cluster, so no driver rounds.
    """
    from biomass_processing_pipeline_spark.operators.dedup import (
        scoped_components,
    )

    a = assign.select(F.col("t_id").alias("id_a"), "list_id")
    b = assign.select(F.col("t_id").alias("id_b"), "list_id")
    cand = a.join(b, "list_id").where(F.col("id_a") < F.col("id_b"))
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(_cosine_col("v_a", "v_b"), 6))
        .where(F.col("cosine") >= threshold)
        .select("list_id", "id_a", "id_b")
    )
    comp = scoped_components(pairs, "list_id")
    return (
        emb.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("rep_id", "doc_id").alias("rep_id"),
        )
        .withColumn("is_kept", F.col(id_col) == F.col("rep_id"))
    )
