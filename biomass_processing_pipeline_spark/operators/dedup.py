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
  friendly; buckets above ``hot_bucket_threshold`` go through a chunked
  self-join that spreads their quadratic work over ``hot_chunks`` tasks.
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
    """Keep the min-id representative per identical content (md5 key).

    NULL content is UNKNOWN content, not identical content: each NULL row
    keeps itself (n_copies=1). Left in the groupBy, md5(NULL)=NULL would
    collapse every quarantined/unfetched document into ONE keep row — a
    dedup pass downstream would then delete all but one of them.

    One scan, one shuffle: NULL hashes key on an id-qualified sentinel
    (``N\\x00<id>`` — md5 output is 32 hex chars, so the prefix cannot
    collide) instead of a filter+union split, which would read and md5
    the 10^12-row corpus TWICE."""
    h = df.select(F.col(id_col), F.md5(F.col(content_col)).alias("_h"))
    k = F.coalesce(
        F.col("_h"), F.concat(F.lit("N\x00"), F.col(id_col).cast("string"))
    )
    return (
        h.groupBy(k.alias("_k"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select(
            F.when(F.col("_k").startswith("N\x00"), F.lit(None))
            .otherwise(F.col("_k")).alias("_h"),
            "keep_id", "n_copies",
        )
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


def _shingle_batch(texts: list, k: int) -> list:
    """Sorted-unique k-byte shingle hashes per doc, vectorized ACROSS the
    whole batch: one flat byte buffer, boundary-masked window starts, a
    single ``_fnv_matrix`` sweep over every window of every doc, then
    per-doc sorted dedup via one lexsort + adjacent-diff (identical
    values and order to the per-doc ``np.unique(_fnv_matrix(windows))``
    it replaces — windows never cross doc boundaries). Docs shorter than
    ``k`` keep the whole-string hash fallback."""
    enc = [(t or "").lower().encode() for t in texts]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    out: list = [None] * len(enc)
    long_idx = np.flatnonzero(lens >= k)
    short_idx = np.flatnonzero(lens < k)
    if len(short_idx):
        # one batched sweep for ALL short docs — not a 1-element
        # hash_bytes_np call per doc (a many-tiny-doc corpus would
        # otherwise degenerate back to per-row Python overhead)
        short_h = hash_bytes_np(
            np.array([enc[i] for i in short_idx], dtype=object)
        )
        for i, h in zip(short_idx, short_h):
            out[i] = [int(h)]
    if len(long_idx) == 0:
        return out
    flat = np.frombuffer(b"".join(enc[i] for i in long_idx), dtype=np.uint8)
    dlens = lens[long_idx]
    offs = np.zeros(len(long_idx), dtype=np.int64)
    np.cumsum(dlens[:-1], out=offs[1:])
    n_win = dlens - k + 1
    # valid window starts: each doc's [off, off + len - k] span
    starts = np.repeat(offs, n_win) + (
        np.arange(int(n_win.sum())) - np.repeat(np.cumsum(n_win) - n_win, n_win)
    )
    windows = np.lib.stride_tricks.sliding_window_view(flat, k)[starts]
    hashes = _fnv_matrix(windows)
    doc = np.repeat(np.arange(len(long_idx)), n_win)
    order = np.lexsort((hashes, doc))
    d_s, h_s = doc[order], hashes[order]
    keep = np.empty(len(d_s), dtype=bool)
    keep[0] = True
    keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u, h_u = d_s[keep], h_s[keep]
    bounds = np.searchsorted(d_u, np.arange(1, len(long_idx)))
    for i, part in zip(long_idx, np.split(h_u, bounds)):
        out[i] = part.tolist()
    return out


def _shingle_udf(k: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def shingles(text: pd.Series) -> pd.Series:
        return pd.Series(_shingle_batch(list(text), k))

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


def minhash_coeffs(n_hashes: int, seed: int = 42):
    """The (a, b) permutation constants — exposed so the DuckDB oracle can
    embed the identical values."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _minhash_band_udf(n_hashes: int, bands: int, seed: int = 42):
    """shingle-set -> array of ``bands`` band hashes: minhash signature via
    (a*x+b) mod p permutations, then an FNV fold over each band's rows.

    The fold replaces Spark's murmur3 ``hash(slice(sig, ...))`` with
    arithmetic a SQL oracle can replicate exactly (uint64 wrap + low-61
    mask); the join key stays one long per (band, doc)."""
    a, b = minhash_coeffs(n_hashes, seed)
    rows = n_hashes // bands

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_bands(shingles: pd.Series) -> pd.Series:
        out = []
        prime = np.uint64(1099511628211)
        offset = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):
            for sh in shingles:
                x = np.asarray(sh, dtype=np.uint64)
                sig = (
                    (a.astype(np.uint64)[:, None] * x[None, :]
                     + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
                ).min(axis=1)
                band_vals = sig.reshape(bands, rows)
                h = np.full(bands, offset, dtype=np.uint64)
                for col in range(rows):
                    h = (h ^ band_vals[:, col]) * prime
                out.append((h & np.uint64(_MERSENNE)).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash_bands


def with_shingles(df: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Adds sorted-unique shingle hashes AND drops NULL-text rows: NULL
    is unknown content, not empty content — shingled as "" every
    quarantined/unfetched doc would share one shingle set and pair as a
    jaccard-1.0 near-dup of every other NULL doc (and of genuinely empty
    docs). Unknown content pairs with nothing. A real empty string keeps
    its whole-string-hash shingle: empty == empty IS identical content."""
    return df.where(F.col(text_col).isNotNull()).withColumn(
        "shingles", _shingle_udf(k)(F.col(text_col))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 5,
    hot_bucket_threshold: int = 20_000,
    hot_chunks: int = 16,
    refine_broadcast_elems: int = 16_000_000,
    refine_broadcast_docs: int = 2_000_000,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) for pairs with exact Jaccard >= threshold
    among LSH candidates (id_a < id_b).

    Band-bucket skew salting: a degenerate band value shared by B docs
    produces B^2 candidates in ONE join task. A census over the banded
    table (map-side-combinable count) finds buckets above
    ``hot_bucket_threshold``; their pairs are generated through a chunked
    self-join — the probe side is split into ``hot_chunks`` hash chunks
    and the build side explodes over chunk ids, spreading each hot
    bucket's quadratic work across ``hot_chunks`` tasks while emitting
    every pair exactly once. Cold buckets keep the plain equi-join.

    Exact-Jaccard refine, two plans (selected by the measured total
    shingle-element count, the kNN ``local_index_threshold`` pattern):

    - **broadcast refine** (corpus shingle store <= ``refine_broadcast_elems``
      longs AND <= ``refine_broadcast_docs`` docs — the driver collect and
      the id->offset dict pay O(n_docs) regardless of element count, so a
      many-tiny-doc corpus must fail the gate too; ~128 MB packed at the
      element default — ordinary Spark broadcast
      size; each Python worker holds one copy): the doc -> sorted-unique
      shingle arrays ship ONCE as a packed CSR broadcast; one mapInPandas
      over the SLIM (id_a, id_b, n_a, n_b) candidate stream counts each
      intersection with two vector ops (searchsorted + equality) — no
      KB-array join, no per-pair hash-set builds. Measured 11.5 s ->
      ~0.6 s on the 662k-candidate sf0.1 refine.
    - **join refine** (the at-scale fallback): shingle arrays shuffle onto
      the candidate pairs (array duplication ~ pairs-per-doc) and
      ``array_intersect`` refines JVM-side. |A∪B| is always the exact
      arithmetic |A|+|B|-|A∩B| (arrays are np.unique-distinct), so both
      plans produce bit-identical jaccard doubles.
    """
    # shingle arrays are BIG (~KBs per doc): materialize them once and keep
    # the banded self-join SLIM (id, band_idx, band_hash only — 3 longs);
    # the arrays join back onto the tiny candidate-pair set for the refine
    # instead of being duplicated x bands x 2 sides through the shuffle
    slim = df.select(id_col, text_col)
    # Everything below (shingle UDF, band UDF, the map side of the band
    # join) inherits the scan's split count. A small tier's documents
    # parquet collapses to one split, pinning the whole leg to one task
    # (measured: the sf0.1 shingle pass ran 0.65 s single-task vs ~0.1 s
    # fanned out). At fact scale the scan already has >= cores splits and
    # this is a no-op — the parcel_cover_distributed guard, same rationale.
    par = df.sparkSession.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    sh = with_shingles(slim, text_col, shingle_k).select(
        id_col, "shingles", F.size("shingles").alias("n_sh")
    ).localCheckpoint(eager=False)
    banded = sh.select(
        F.col(id_col),
        F.posexplode(
            _minhash_band_udf(n_hashes, bands)(F.col("shingles"))
        ).alias("band_idx", "band_hash"),
    )
    # consumed as BOTH sides of the self-join (and by the census)
    banded = banded.localCheckpoint(eager=False)

    hot = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > hot_bucket_threshold)
        .select("band_idx", "band_hash", F.lit(True).alias("_hot"))
    )
    marked = banded.join(F.broadcast(hot), ["band_idx", "band_hash"], "left")
    cold = marked.where(F.col("_hot").isNull())
    hotrows = marked.where(F.col("_hot").isNotNull())

    def _pairs(left_df: DataFrame, right_df: DataFrame,
               extra_key: list[str]) -> DataFrame:
        left = left_df.select(
            F.col(id_col).alias("id_a"), "band_idx", "band_hash", *extra_key,
        )
        right = right_df.select(
            F.col(id_col).alias("id_b"), "band_idx", "band_hash", *extra_key,
        )
        return (
            left.join(right, ["band_idx", "band_hash", *extra_key])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )

    cold_pairs = _pairs(cold, cold, [])
    # hot side: probe keeps its own chunk, build explodes over ALL chunks,
    # join adds chunk to the key -> each (a, b) pair appears exactly once
    # (via b's chunk) and the bucket fans out over hot_chunks tasks
    probe = hotrows.withColumn(
        "chunk", F.pmod(F.hash(F.col(id_col)), F.lit(hot_chunks))
    )
    build = hotrows.withColumn(
        "chunk",
        F.explode(F.sequence(F.lit(0), F.lit(hot_chunks - 1))),
    )
    hot_pairs = _pairs(build, probe, ["chunk"])

    cand = cold_pairs.unionByName(hot_pairs).dropDuplicates(["id_a", "id_b"])
    # SIZE-RATIO prune before the heavy array join: J(A,B) <= min/max
    # (|A∩B| <= min, |A∪B| >= max), so pairs whose shingle-count ratio
    # falls below the threshold provably cannot pass the final filter —
    # dropped on two slim int columns instead of refined on KB arrays.
    # The 1e-9 slack keeps the bound conservative for non-dyadic
    # thresholds (t*max rounds once in double); borderline survivors just
    # take the exact refine.
    cand = (
        cand.join(sh.select(F.col(id_col).alias("id_a"),
                            F.col("n_sh").alias("n_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"),
                        F.col("n_sh").alias("n_b")), "id_b")
        .where(
            F.least("n_a", "n_b")
            >= F.lit(threshold) * F.greatest("n_a", "n_b") - F.lit(1e-9)
        )
    )
    # plan gate: skip the measuring job entirely when the caller pinned the
    # join refine (refine_broadcast_elems <= 0 can never pass); otherwise
    # ONE agg measures both bounds. The doc-count bound matters as much as
    # the element bound: the driver collect + broadcast pay O(n_docs)
    # (id->index dict, per-doc list overhead), so a many-tiny-doc corpus
    # must not slip under a pure element ceiling.
    if refine_broadcast_elems > 0:
        total_elems, n_docs = sh.agg(
            F.sum("n_sh"), F.count("*")
        ).head() or (0, 0)
        if (total_elems or 0) <= refine_broadcast_elems and (
            n_docs or 0
        ) <= refine_broadcast_docs:
            return _refine_broadcast(cand, sh, id_col, threshold)
    # ONE set pass per pair: |A∪B| = |A| + |B| - |A∩B| exactly (shingle
    # arrays are np.unique-distinct), so array_union's second hash-set
    # build is pure arithmetic; int/int division promotes to double
    # exactly as size/size did — bit-identical jaccard values.
    jac = (
        cand.join(sh.select(F.col(id_col).alias("id_a"),
                            F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"),
                        F.col("shingles").alias("sh_b")), "id_b")
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("_i") / (F.col("n_a") + F.col("n_b") - F.col("_i")),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def _refine_broadcast(cand: DataFrame, sh: DataFrame, id_col: str,
                      threshold: float) -> DataFrame:
    """Exact-Jaccard refine against a packed CSR broadcast of the shingle
    store: ``cand`` is the SLIM (id_a, id_b, n_a, n_b) candidate stream,
    ``sh`` the (id, shingles sorted-unique, n_sh) table. Per pair,
    |A∩B| = number of probe hits of the SHORTER array in the longer one —
    exact for sorted-unique arrays. jaccard = I / (n_a + n_b - I) in
    float64: bit-identical to the join plan's int/int division.

    Round 6 (the VERDICT #5 vectorization + a parallelism fix): the old
    per-pair Python loop ran ~25 us/pair AND landed on whatever handful
    of partitions AQE left after the pair dedup (the slim stream is a few
    MB, so coalescing collapsed it to ~1-5 tasks — measured 3.0 s for a
    739k-pair refine). Now the stream is round-robin repartitioned to the
    core count, each task concatenates its Arrow batches and runs ONE
    ragged pass: pairs sorted by their longer doc, all shorter-side
    arrays gathered into one probe vector, one searchsorted + one
    reduceat per distinct longer doc. Python iterations drop from
    O(pairs) to O(distinct long docs per task); every remaining op is a
    whole-partition numpy call. (Legal repartition: the gate already
    bounds this plan to small corpora; the at-scale join refine is
    untouched.)"""
    pdf = sh.select(id_col, "shingles").toPandas()
    vals = np.concatenate([
        np.asarray(s, dtype=np.int64) for s in pdf["shingles"]
    ]) if len(pdf) else np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(s) for s in pdf["shingles"]), dtype=np.int64,
                       count=len(pdf))
    offs = np.zeros(len(pdf) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    index = {v: i for i, v in enumerate(pdf[id_col])}
    bc = cand.sparkSession.sparkContext.broadcast(
        {"vals": vals, "offs": offs, "index": index}
    )
    out_schema = T.StructType([
        cand.schema["id_a"], cand.schema["id_b"],
        T.StructField("jaccard", T.DoubleType()),
    ])

    def gen(batches):
        d = bc.value
        vals, offs, index = d["vals"], d["offs"], d["index"]
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf_b = pd.concat(parts, ignore_index=True) if len(parts) > 1 \
            else parts[0]
        m = len(pdf_b)
        ia = pdf_b["id_a"].to_numpy()
        ib = pdf_b["id_b"].to_numpy()
        na = pdf_b["n_a"].to_numpy(np.int64)
        nb = pdf_b["n_b"].to_numpy(np.int64)
        xa = np.fromiter((index[v] for v in ia), np.int64, count=m)
        xb = np.fromiter((index[v] for v in ib), np.int64, count=m)
        # probe the shorter side into the longer (same choice as the old
        # loop); group pairs by the longer doc so each distinct long doc
        # costs ONE searchsorted over its concatenated probes
        swap = lens[xb] < lens[xa]
        xs = np.where(swap, xb, xa)
        xl = np.where(swap, xa, xb)
        order = np.argsort(xl, kind="stable")
        xs_o, xl_o = xs[order], xl[order]
        ls = lens[xs_o]
        ends = np.cumsum(ls)
        starts = ends - ls
        inter_o = np.empty(m, dtype=np.int64)
        # process the sorted pair stream in ~2M-element blocks: the
        # ragged gather materializes a handful of element-sized arrays,
        # and an unbounded partition (the x10 tier puts ~45M probe
        # elements in one task) would allocate them as one-shot mmap
        # regions — fresh-page cost every call in this guest (the zonal
        # _CHUNK note). Blocks keep each transient ~16 MB and
        # heap-recycled; group boundaries may straddle blocks, which
        # just re-runs searchsorted on the same big array — harmless.
        blk_elems = 2_000_000
        p_start = 0
        while p_start < m:
            p_stop = int(np.searchsorted(
                ends, ends[p_start] - ls[p_start] + blk_elems, side="left"
            )) + 1
            p_stop = min(max(p_stop, p_start + 1), m)
            base_off = starts[p_start]
            ls_b = ls[p_start:p_stop]
            ends_b = ends[p_start:p_stop] - base_off
            starts_b = ends_b - ls_b
            total = int(ends_b[-1])
            # ragged gather of this block's shorter-side arrays
            flat = (np.arange(total) - np.repeat(starts_b, ls_b)
                    + np.repeat(offs[xs_o[p_start:p_stop]], ls_b))
            probe = vals[flat]
            xl_b = xl_o[p_start:p_stop]
            n_blk = p_stop - p_start
            bnds = np.flatnonzero(np.r_[True, xl_b[1:] != xl_b[:-1]])
            bnds = np.r_[bnds, n_blk]
            for g in range(len(bnds) - 1):
                p0, p1 = int(bnds[g]), int(bnds[g + 1])
                big = vals[offs[xl_b[p0]]:offs[xl_b[p0] + 1]]
                pr = probe[starts_b[p0]:ends_b[p1 - 1]]
                pos = np.searchsorted(big, pr)
                np.minimum(pos, len(big) - 1, out=pos)
                match = (big[pos] == pr).astype(np.int64)
                inter_o[p_start + p0:p_start + p1] = np.add.reduceat(
                    match, starts_b[p0:p1] - starts_b[p0])
            p_start = p_stop
        inter = np.empty(m, dtype=np.int64)
        inter[order] = inter_o
        jac = inter / (na + nb - inter)
        keep = jac >= threshold
        if keep.any():
            yield pd.DataFrame({
                "id_a": ia[keep], "id_b": ib[keep],
                "jaccard": jac[keep],
            })

    par = cand.sparkSession.sparkContext.defaultParallelism
    return cand.select("id_a", "id_b", "n_a", "n_b").repartition(
        par).mapInPandas(gen, schema=out_schema)


def _fnv_ragged(tokens: list) -> np.ndarray:
    """FNV-1a over a batch of variable-length byte strings, vectorized: one
    masked column sweep over a zero-padded (n_tokens, max_len) matrix —
    identical values to hash_bytes_np, no per-byte Python loop."""
    if not tokens:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64,
                       count=len(tokens))
    max_len = int(lens.max()) if len(lens) else 0
    flat = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    offs = np.zeros(len(tokens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    cols = np.arange(max_len)
    valid = cols[None, :] < lens[:, None]
    mat = np.zeros((len(tokens), max_len), dtype=np.uint8)
    idx = np.minimum(offs[:, None] + cols[None, :], max(len(flat) - 1, 0))
    mat[valid] = flat[idx[valid]]
    with np.errstate(over="ignore"):
        h = np.full(len(tokens), 1469598103934665603, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for col in range(max_len):
            m = valid[:, col]
            h[m] = (h[m] ^ mat[m, col].astype(np.uint64)) * prime
        return (h & np.uint64(_MERSENNE)).astype(np.int64)


def _simhash_udf():
    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        # tokenize the whole batch, hash every token in ONE vectorized
        # masked-FNV pass, then per-doc bit votes via reduceat — the only
        # Python loop left is the str.split per doc
        toks_per_doc = [(t or "").lower().split() for t in text]
        counts = np.fromiter((len(ts) for ts in toks_per_doc),
                             dtype=np.int64, count=len(toks_per_doc))
        flat_tokens = [w.encode() for ts in toks_per_doc for w in ts]
        hs = _fnv_ragged(flat_tokens).astype(np.uint64)
        signs = (2 * ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                      & np.uint64(1)).astype(np.int32) - 1)
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        out = np.zeros(len(text), dtype=np.int64)
        nonempty = counts > 0
        if nonempty.any():
            # reduceat needs strictly valid starts: restrict to non-empty docs
            votes = np.add.reduceat(signs, starts[nonempty], axis=0)
            powers = np.left_shift(
                np.uint64(1), np.arange(64, dtype=np.uint64)
            )
            sigs = ((votes > 0).astype(np.uint64) * powers[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[nonempty] = sigs.astype(np.int64)
        return pd.Series(out)

    return simhash


def hamming_sig_pairs(
    sig_df: DataFrame, id_col: str, sig_col: str = "sig",
    max_hamming: int = 3, scope_col: str | None = None,
) -> DataFrame:
    """(id, 64-bit sig) rows -> (id_a, id_b, hamming) pairs within
    ``max_hamming``: block-banding self-join + ``bit_count(xor)`` refine.
    The 64 bits split into ``max(4, max_hamming + 1)`` blocks, so two
    signatures within the Hamming budget agree on at least one block by
    pigeonhole — complete for EVERY ``max_hamming`` <= 63 (4x16 bits for
    the <= 3 default, narrower blocks beyond). ``shiftright`` is
    arithmetic but the width mask makes each block identical to the
    logical-shift value, so negative longs band correctly. ``scope_col``
    (optional) rides the band join key, so pairs only form inside a scope
    (e.g. a tile) — partition-local dedup at zero extra shuffle cost; the
    same (id_a, id_b) pair occurring in several scopes keeps one edge PER
    scope (scoped dedup, not global).
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming={max_hamming} out of range: banding needs "
            "max_hamming + 1 <= 64 non-empty blocks (0..63)"
        )
    n_blocks = max(4, max_hamming + 1)
    base_w, rem = divmod(64, n_blocks)
    specs, shift = [], 0
    for b in range(n_blocks):
        width = base_w + (1 if b < rem else 0)
        specs.append((b, shift, (1 << width) - 1))
        shift += width
    scope = [scope_col] if scope_col else []
    blocks = sig_df.select(
        id_col, sig_col, *scope,
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright(F.col(sig_col), s).bitwiseAND(
                    F.lit(m)).alias("blk_val"),
            )
            for b, s, m in specs
        ])).alias("b"),
    ).select(id_col, sig_col, *scope, "b.blk", "b.blk_val")
    left = blocks.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"),
        *scope, "blk", "blk_val",
    )
    right = blocks.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"),
        *scope, "blk", "blk_val",
    )
    cand = (
        left.join(right, [*scope, "blk", "blk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *scope, "sig_a", "sig_b")
        # scope rides the dedup key: the same id pair in two scopes is two
        # edges (dropping one would corrupt the other scope's components)
        .dropDuplicates([*scope, "id_a", "id_b"])
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    )
    return ham.where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming", *scope
    )


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """-> (id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Complete for max_hamming <= 3 by pigeonhole over 4 16-bit blocks.
    NULL-text rows are dropped (unknown content pairs with nothing —
    hashed as "" they would all share sig 0 and pair with each other);
    a real empty string keeps sig 0: empty == empty is identical content.
    """
    sig = df.where(F.col(text_col).isNotNull()).select(
        id_col, _simhash_udf()(F.col(text_col)).alias("sig")
    )
    return hamming_sig_pairs(sig, id_col, "sig", max_hamming)


def phash_dedup_groups(
    df: DataFrame,
    id_col: str = "image_id",
    sig_col: str = "phash",
    max_hamming: int = 3,
    scope_col: str | None = None,
    max_iters: int = 64,
) -> DataFrame:
    """Image near-dup grouping on a precomputed 64-bit perceptual hash ->
    (id, rep_id, group_size): every image mapped to the MIN-id
    representative of its Hamming<=``max_hamming`` connected component
    (within ``scope_col`` if given — e.g. per acquisition tile, the
    imagery-native scoping: repeated captures of the same tile are
    near-dups; cross-tile phash collisions are different places that
    merely look alike).

    Scale shape (the part that matters at 10^12 images): exact-duplicate
    mass is collapsed FIRST (groupBy on the signature — one shuffle), so
    the quadratic banding self-join and the connected-components edge list
    only ever see DISTINCT (scope, signature) vertices. A viral image with
    10^6 exact copies contributes ONE vertex, not 10^12/2 pairs; the final
    sig -> rep mapping rejoins per-image in a single hash equi-join on the
    signature. Pigeonhole banding is complete for every max_hamming (the
    band count widens with the budget), so the grouping equals
    brute-force all-pairs Hamming + min-reachable-id
    (oracled via a DuckDB recursive CTE in queries.py). A NULL signature
    (a quarantined/undecodable image) is an UNKNOWN hash: the row comes
    back as its own singleton group — never silently dropped, never
    grouped with other unknowns. With ``scope_col``
    components cannot cross scopes, so CC runs as ``scoped_components``
    (one Arrow union-find pass — near-threshold sig graphs are often
    chain-shaped, which the iterative CC pays O(diameter) driver rounds
    for); unscoped falls back to ``dedup_components`` with ``max_iters``.
    """
    # NULL signatures (e.g. an undecodable image whose phash was
    # quarantined to NULL) are UNKNOWN hashes: they can be dups of
    # nothing, so each must be its own singleton group. Keyed on the raw
    # sig they'd first be grouped as exact dups of each other (groupBy
    # keeps a NULL group) and then VANISH at the final sig equi-join
    # (NULL never matches NULL). Key the exact-collapse and the final
    # rejoin on a NULL-SAFE synthesized key instead — real sig as a
    # decimal string, NULL sig as an id-qualified sentinel ("N\x00<id>",
    # disjoint from any numeric string) — so unknown-sig rows ride the
    # main path as per-row singleton vertices, with no EXTRA filter+union
    # scan of the 10^12-image table on top of the collapse+rejoin pair. The
    # banding below still sees the raw NULL sig, emits NULL block keys,
    # and NULL never equi-joins: an unknown-sig vertex pairs with nothing.
    df = df.withColumn("_sk", F.coalesce(
        F.col(sig_col).cast("string"),
        F.concat(F.lit("N\x00"), F.col(id_col).cast("string")),
    ))
    if scope_col:
        # NULL scopes would silently vanish through the equi-joins below
        # (and concat_ws skips NULLs, colliding with the unscoped vid
        # encoding) — map the scope through an INJECTIVE non-null encoding
        # instead: NULL -> "n", value s -> "v" + s (disjoint prefixes).
        enc = F.when(
            F.col(scope_col).isNull(), F.lit("n")
        ).otherwise(F.concat(F.lit("v"), F.col(scope_col).cast("string")))
        df = df.withColumn("_scope", enc)
        scope = ["_scope"]
    else:
        scope = []
    sigs = df.groupBy(*scope, "_sk").agg(
        F.min(id_col).alias("sig_rep"), F.count("*").alias("n_exact"),
        # _sk determines the sig (all-equal within a group; all-NULL for
        # a sentinel group), so min() just surfaces it for the banding
        F.min(sig_col).alias(sig_col),
    )
    # vertex id: scope-qualified signature key (labels are internal — only
    # the component PARTITION matters, so any injective encoding works)
    vid = (
        F.concat_ws("|", F.col("_scope"), F.col("_sk"))
        if scope_col else F.col("_sk")
    )
    sigs = sigs.withColumn("vid", vid)
    pairs = hamming_sig_pairs(
        sigs.select(F.col("vid").alias("sid"), F.col(sig_col).alias("sig"),
                    *scope),
        "sid", "sig", max_hamming, scope_col="_scope" if scope_col else None,
    )
    if scope_col:
        comps = scoped_components(pairs, "_scope")
    else:
        comps = dedup_components(pairs, max_iters=max_iters)
    # consumed by BOTH the per-component aggregate and the sig->rep mapping
    # join: checkpoint so the banding join + union-find run ONCE, not once
    # per branch (sig-level rows only — tiny relative to the input)
    labeled = sigs.join(
        comps, sigs["vid"] == comps["doc_id"], "left"
    ).select(
        *scope, "_sk", "sig_rep", "n_exact",
        F.coalesce(F.col("rep_id"), F.col("vid")).alias("comp"),
    ).localCheckpoint(eager=False)
    grp = labeled.groupBy("comp").agg(
        F.min("sig_rep").alias("rep_id"),
        F.sum("n_exact").alias("group_size"),
    )
    sig2rep = labeled.join(grp, "comp").select(
        *scope, "_sk", "rep_id", "group_size"
    )
    base = df.select(id_col, "_sk", *scope) if scope_col else df.select(
        id_col, "_sk"
    )
    return base.join(sig2rep, [*scope, "_sk"]).select(
        id_col, "rep_id", "group_size"
    )


def scoped_components(
    pairs: DataFrame,
    scope_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components when edges NEVER cross ``scope_col`` (e.g.
    per-tile near-dup graphs): one shuffle on the scope key, then an exact
    union-find per scope inside ``applyInPandas`` -> (scope omitted)
    (doc_id, rep_id) with the component's MIN id as representative.

    This replaces ``dedup_components``' driver-round loop with a single
    Arrow pass — chain-shaped signature graphs that cost O(diameter)
    driver actions there are O(alpha) here. Scale: work and memory are
    per-scope (each task holds one scope's EDGE LIST, already collapsed to
    distinct signatures upstream); skewed scopes are bounded by the
    number of distinct sigs in the scope, not the image count.
    """
    # output ids keep the INPUT pair columns' type (hard-coding string
    # would silently coerce long ids, changing min-rep ordering: '10' < '9')
    id_type = pairs.schema[id_a].dataType
    out_schema = T.StructType([
        T.StructField("doc_id", id_type), T.StructField("rep_id", id_type),
    ])

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(pd.concat([pdf[id_a], pdf[id_b]], ignore_index=True))
        idx = {v: i for i, v in enumerate(ids)}
        parent = np.arange(len(ids))

        def find(i):
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:
                parent[i], i = root, parent[i]
            return root

        for a, b in zip(pdf[id_a], pdf[id_b]):
            ra, rb = find(idx[a]), find(idx[b])
            if ra != rb:
                parent[rb] = ra
        roots = np.fromiter((find(i) for i in range(len(ids))), dtype=np.int64,
                            count=len(ids))
        # min id per component (min-key rule, matching dedup_components)
        comp = pd.DataFrame({"doc_id": ids, "root": roots})
        rep = comp.groupby("root")["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": ids, "rep_id": rep})

    return pairs.select(scope_col, id_a, id_b).groupBy(scope_col).applyInPandas(
        _uf, schema=out_schema
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup pairs -> (doc_id, rep_id): connected components with the
    component's MIN id as canonical representative — the dedup endgame
    (keep one doc per duplicate cluster).

    LOG-round label convergence (the FastSV / Shiloach–Vishkin shape):
    each round every vertex u takes the min over {rep(u), rep(rep(u)),
    min over neighbors v of rep(rep(v))}, AND pushes that neighbor min
    onto its own parent label node rep(u) ("hooking" — link trees to
    each other through the grandparent, not just along edges). The
    shortcut halves every tree's depth per round while hooking merges
    trees, so a diameter-d component converges in O(log d) rounds — a
    10^6-long near-threshold signature chain costs ~20 driver rounds,
    not 300k (the previous min-propagation + single-hop compose was
    O(d/3)). Each round is a constant number of joins/aggs over the edge
    list and the label table — both hash-partitioned by vertex, the
    standard 10^12-scale CC dataflow, no driver-side graph.

    Every label is always the id of a reachable same-component vertex
    and only ever decreases, so the fixpoint is exactly the per-component
    min (oracled vs a recursive CTE). If labels still change when the
    budget is exhausted the result would be silently wrong, so raise
    instead. Rounds used by the last call are exposed as
    ``dedup_components.last_rounds`` (bench/test evidence). For graphs
    where a scope key bounds every component, ``scoped_components``
    replaces the loop with one Arrow pass.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=False)
    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "rep", F.col("id")
    ).localCheckpoint(eager=True)
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # grandparent: rep(rep(u)) — roots (rep not in the id column only
        # when it IS its own id) resolve via the left join's coalesce
        par = labels.select(
            F.col("id").alias("p_id"), F.col("rep").alias("p_rep")
        )
        g = labels.join(par, labels["rep"] == par["p_id"], "left").select(
            "id", "rep", F.coalesce("p_rep", "rep").alias("grand")
        )
        # min neighbor grandparent per vertex (one shuffle on the edges)
        gn = g.select(F.col("id").alias("n_id"), F.col("grand").alias("n_grand"))
        ngm = (
            sym.join(gn, sym["dst"] == gn["n_id"])
            .groupBy("src").agg(F.min("n_grand").alias("ngm"))
        )
        # hooking: push each vertex's neighbor-min onto its PARENT label
        # node (f[f[u]] <- min ngm[u]) — this is what links two deep trees
        # in one round instead of crawling the chain
        pmin = (
            g.join(ngm, g["id"] == ngm["src"])
            .groupBy(F.col("rep").alias("t_id"))
            .agg(F.min("ngm").alias("pmin"))
        )
        new = (
            g.join(ngm, g["id"] == ngm["src"], "left")
            .join(pmin, F.col("id") == F.col("t_id"), "left")
            # Spark's least() skips NULLs, so missing ngm/pmin fall away
            .select("id", F.least("rep", "grand", "ngm", "pmin").alias("rep"))
        )
        # EAGER: with eager=False the limit(1) convergence probe only
        # materializes the partitions it touches, so later rounds recompute
        # the rest through ever-deeper lineage (measured 100x round blowup)
        new_labels = new.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    dedup_components.last_rounds = rounds
    if not converged:
        raise RuntimeError(
            f"dedup_components did not converge in {max_iters} rounds "
            "(component diameter too large); raise max_iters"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("rep").alias("rep_id"))


def corpus_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact segment dedup (the C4 rule): every duplicated
    non-empty ``line_sep`` segment is removed EVERYWHERE except its
    first occurrence — "first" meaning the lexicographically smallest
    ``(doc id, position)`` across the whole corpus, so the result is a
    pure function of the data (partition- and arrival-order
    independent). Boilerplate navigation lines, license blurbs, and
    scraped menus repeated across millions of pages survive exactly
    once.

    -> one row per input doc: ``(id, clean_text, n_kept, n_dropped)``
    where ``clean_text`` is the doc rebuilt from its surviving segments
    in original order (empty segments are FORMATTING, not content: they
    always survive and never dedup against each other), and the counts
    cover non-empty segments. A doc whose every non-empty segment lost
    (and that has no empty segments) — and a NULL-text doc (unknown
    content, the pinned rule) — reports ``clean_text`` NULL with
    ``n_kept`` 0; NULL-text docs also report ``n_dropped`` 0, having
    evidenced no segments at all.

    Scale shape (10^12 docs is where this op is famous): one shuffle
    groups identical segments to elect the winner (partial-agg min on a
    slim struct), the FULL segment stream left-joins the winner set on
    the same segment key and carries a ``kept`` FLAG instead of
    filtering — so ONE doc-key groupBy computes the rebuilt text, the
    kept count, and the non-empty total together (no second corpus
    explode, no second doc-key shuffle, no union). No UDFs, no windows
    over the whole corpus, no driver state. A hyper-duplicated segment
    (a boilerplate line on 10^9 pages) is a hot join key on the winner
    probe — that join emits ONE row per copy and aggregates nothing,
    exactly the shape AQE's skew-split handles (session default); the
    election itself is safe (partial-agg min collapses the copies
    map-side). ``line_sep`` is a literal string (regex-free, the
    ``repetition_stats`` convention).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep, -1)).alias(
            "pos", "_line"
        ),
    )
    ne = lines.where(F.length("_line") > 0)
    winners = ne.groupBy("_line").agg(
        F.min(F.struct(id_col, "pos")).alias("_w")
    )
    nonempty = F.length("_line") > 0
    # empty segments never enter the winner table (they're formatting,
    # always kept); a non-empty segment is kept iff it IS its winner
    kept = F.when(
        ~nonempty, F.lit(True)
    ).otherwise(
        (F.col(id_col) == F.col(f"_w.{id_col}"))
        & (F.col("pos") == F.col("_w.pos"))
    )
    flagged = lines.join(winners, "_line", "left").select(
        id_col, "pos", "_line", nonempty.alias("_ne"), kept.alias("_kept")
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            line_sep,
            F.transform(
                # collect_list drops the NULLs the when() leaves for
                # non-kept rows; pos is unique per doc, so the struct
                # sort is a total order — the rebuild is deterministic
                F.array_sort(F.collect_list(
                    F.when(F.col("_kept"), F.struct("pos", "_line"))
                )),
                lambda s: s["_line"],
            ),
        ).alias("_built"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).alias("_kept_rows"),
        F.sum(
            F.when(F.col("_kept") & F.col("_ne"), 1).otherwise(0)
        ).alias("n_kept"),
        F.sum(F.when(F.col("_ne"), 1).otherwise(0)).alias("_n_ne"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            # every segment lost and none empty -> NULL, not "" (and a
            # NULL-text doc, absent from the explode, is NULL too)
            F.when(F.col("_kept_rows") > 0, F.col("_built"))
            .alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (
                F.coalesce("_n_ne", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_dropped"),
        )
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
