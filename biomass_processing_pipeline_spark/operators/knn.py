"""kNN nearest-plot lookup with cell-neighbor ring expansion (SURVEY.md
J2/W1/A5-A6).

Reference semantics: ``ST_DWithin(centroid, point, radius) ORDER BY
distance LIMIT 50`` per parcel (``/root/reference/src/config/
database_config_v3.py:104-114``) followed by distance-weighted aggregation
(``src/analyzers/forest_analyzer_v3.py:185-248``: weight = 1/(dist+0.01)).

Spark-first shape (two-phase, no driver loop):

1. TARGETS (the small side) get a ``cell_id`` and explode to their
   density-sized k-ring of cells (Arrow UDF -> ``explode``) — the
   reference's zone/band candidate ring (``coordinate_utils_v3.py:
   264-318``); Chebyshev symmetry makes "target ring contains point
   cell" equivalent to "point ring contains target cell", so the
   exploded side stays broadcastable and the candidate join is
   shuffle-free on the big side. Above a 2M-row guard the plan degrades
   to a shuffle equi-join on ``cell_id`` (the north_rule's sort-merge
   cell-cell matching) + window top-k;
2. distance is plain column math (degree euclidean, exactly the
   reference's ``distance_degrees``), pre-filtered to the ring's
   guaranteed radius JVM-side;
3. partition-local exact top-k in ONE mapInPandas pass (numpy lexsort
   segment math), emitting the per-point completeness evidence;
4. provably-incomplete points (ring disc did not contain their true
   top-k) take an exact brute-force window fallback, unioned in.

Correctness guarantee: a point with >= k candidates inside ring radius r
has its true top-k complete iff the k-th distance <= r * cell_width (the
ring covers that disc). Points violating the bound go through the exact
fallback, so results match brute force exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from biomass_processing_pipeline_spark import cells


def distance_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Euclidean degree distance (reference ``distance_degrees``).

    sqrt(dx*dx + dy*dy) with PLAIN multiplies: IEEE multiply and sqrt are
    correctly rounded in the JVM, numpy, and DuckDB alike, so every plan
    (local grid index, exploded ring, brute-force golden, SQL oracle)
    computes bit-identical distances and the rank-k target can never
    depend on which physical plan ran. Math.pow(x, 2) / np.hypot carry a
    1-ulp licence that would let plans disagree on engineered near-ties.
    """
    dx = lon1 - lon2
    dy = lat1 - lat2
    return F.sqrt(dx * dx + dy * dy)


def nan_attrs_as_null(df: DataFrame, cols: list[str]) -> list[Column]:
    """Select-list wrapper normalizing stored NaN in float columns to SQL
    NULL (non-float columns pass through — they cannot hold NaN).

    Why: the ONE RULE for unknown neighbor attributes is "drops from the
    numerator, never poisons" (ARCHITECTURE.md cross-plan semantics). The
    local-index kernel enforces it with an ``~np.isnan`` mask — which
    cannot tell a stored NaN from SQL NULL, so both quarantine. The
    distributed plans' ``F.sum`` skips NULL but PROPAGATES NaN: without
    this wrap, one NaN-valued attr row would poison a point's weighted
    mean (and a NaN category could win a mode vote) in the fallback plans
    only, making the answer depend on which physical plan ran."""
    out: list[Column] = []
    for c in cols:
        t = df.schema[c].dataType
        if isinstance(t, (T.DoubleType, T.FloatType)):
            out.append(F.nanvl(F.col(c), F.lit(None).cast(t)).alias(c))
        else:
            out.append(F.col(c))
    return out


def _valid_coords(df: DataFrame) -> DataFrame:
    """Drop rows with NULL/NaN coordinates before any kNN plan sees them.

    An undefined position has no defined neighbors (quarantined footprints
    now produce NULL lon/lat — sources/images.py); without this gate a
    NULL coordinate clamps into cell 0 via greatest()'s NULL-skip and a
    NaN poisons the numpy top-k (NaN distances sort last, the completeness
    proof never fires, and the brute-force fallback emits garbage ranks).
    Native scan-level filter: no shuffle, negligible at any scale."""
    return df.where(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
        & ~F.isnan("lon") & ~F.isnan("lat")
    )


def _build_target_index(targets: DataFrame, target_key: str, level: int,
                        attr_cols: list[str],
                        raw_cols: list[str] = ()) -> dict:
    """Collect the SMALL target side once and pack it into numpy arrays +
    a sorted-cell CSR grid index (targets sorted by linearized cell id, so
    one grid ROW of any Chebyshev ring is a contiguous slice found by two
    ``searchsorted`` calls). This is the kNN analogue of a broadcast hash
    join's build side: the dimension table ships to every executor ONCE
    and the probe side never shuffles — but unlike the exploded-ring join
    it costs O(n_targets) broadcast bytes instead of
    O(n_targets x ring_cells) join rows, and the candidate stream never
    crosses the JVM<->Arrow boundary at all.

    Lifetime of the ``sc.broadcast`` built from this index: the result
    DataFrame's closure is the only reference, so when the caller drops
    the result, driver GC releases the py4j handle and Spark's
    ContextCleaner evicts the executor blocks — the same collection
    discipline as SQL's managed broadcasts, bounded by live result
    DataFrames rather than by app lifetime.
    """
    return _pack_target_index(targets.toPandas(), target_key, level,
                              attr_cols, raw_cols)


def _pack_target_index(pdf: pd.DataFrame, target_key: str, level: int,
                       attr_cols: list[str],
                       raw_cols: list[str] = ()) -> dict:
    """Pure-pandas/numpy core of :func:`_build_target_index` (split out so
    the kernel property tests can fuzz the packed-index invariants without
    a SparkSession)."""
    lon = pdf["t_lon"].to_numpy(np.float64)
    lat = pdf["t_lat"].to_numpy(np.float64)
    w = 1 << level
    ix, iy = cells.ixy_np(lon, lat, level)
    lin = iy * w + ix
    order = np.argsort(lin, kind="stable")
    key = pdf[target_key].to_numpy()[order]
    # integer tie-rank: sorting by key_rank == sorting by key ascending,
    # valid for ANY key dtype (string plot ids sort lexicographically)
    key_rank = np.empty(len(key), dtype=np.int64)
    key_rank[np.argsort(key, kind="stable")] = np.arange(len(key))
    return {
        "W": w,
        "level": level,
        "cell_w": min((cells.LON_MAX - cells.LON_MIN) / w,
                      (cells.LAT_MAX - cells.LAT_MIN) / w),
        "lin": lin[order],
        "lon": lon[order],
        "lat": lat[order],
        "key": key,
        "key_rank": key_rank,
        "attrs": {a: pdf[a].to_numpy(np.float64)[order] for a in attr_cols},
        # dtype-preserving columns (e.g. integer mode categories)
        "raw": {c: pdf[c].to_numpy()[order] for c in raw_cols},
    }


def _gather_ring(t_lin: np.ndarray, w: int, pix: np.ndarray,
                 piy: np.ndarray, r: int) -> tuple[np.ndarray, np.ndarray]:
    """All (point_idx, target_idx) pairs with the target's cell inside the
    point's Chebyshev-radius-``r`` ring: one contiguous-slice lookup per
    grid row (2r+1 searchsorted rounds), CSR-expanded without a Python
    loop over points."""
    x_lo = np.clip(pix - r, 0, w - 1)
    x_hi = np.clip(pix + r, 0, w - 1)
    m = len(pix)
    pts, tgs = [], []
    for dy in range(-r, r + 1):
        row = piy + dy
        valid = (row >= 0) & (row < w)
        if not valid.any():
            continue
        base = np.where(valid, row, 0) * w
        s = np.searchsorted(t_lin, base + x_lo, side="left")
        e = np.searchsorted(t_lin, base + x_hi, side="right")
        s = np.where(valid, s, 0)
        e = np.where(valid, e, s)
        cnt = e - s
        tot = int(cnt.sum())
        if tot == 0:
            continue
        pt = np.repeat(np.arange(m), cnt)
        offs = np.cumsum(cnt) - cnt
        tg = np.arange(tot) - np.repeat(offs, cnt) + np.repeat(s, cnt)
        pts.append(pt)
        tgs.append(tg)
    if not pts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(pts), np.concatenate(tgs)


def _seg_topk(pt: np.ndarray, d: np.ndarray, tie: np.ndarray, kk: int,
              n_groups: int):
    """Exact per-group top-``kk`` under the total order (distance,
    tie-rank): returns (sel, rank, cnt, kth) where ``sel`` indexes the
    input arrays, ``cnt`` is each group's candidate count and ``kth`` its
    kk-th (or last) distance — the ring-completeness evidence.

    Bucket pre-prune (round 6): the 3-key lexsort over EVERY candidate was
    ~90% of the grid-kernel time (measured 25.9 s of a 29.2 s single-core
    pass at sf0.1 — ~260 candidates gathered per point for k=50). Before
    sorting, histogram distances into 256 buckets per group and drop every
    candidate strictly above the bucket where the group's cumulative count
    reaches ``kk``. The true top-kk can never be dropped (all candidates
    in buckets <= the boundary bucket are kept, ties at the k-th distance
    share its bucket), so the final lexsort sees ~kk + one bucket's worth
    of rows per group and the result — selection, ranks, ties — is
    IDENTICAL to sorting everything. ``cnt`` stays the PRE-prune count
    (the completeness evidence). Skipped when the input is already near
    the output size or distances are degenerate (dmax == 0)."""
    cnt = np.bincount(pt, minlength=n_groups)
    if len(pt) > 4 * n_groups and len(pt) > 2048:
        dmax = d.max() if len(d) else 0.0
        if dmax > 0:
            nb = 256
            # ceil-ish bucket index; dmax lands in bucket nb-1
            b = np.minimum((d * (nb / dmax)).astype(np.int64), nb - 1)
            counts2d = np.bincount(pt * nb + b, minlength=n_groups * nb)
            counts2d = counts2d.reshape(n_groups, nb)
            cum = np.cumsum(counts2d, axis=1)
            # first bucket where the group's cumulative count reaches kk
            # (argmax finds the first True; groups with cnt < kk keep all)
            reached = cum >= kk
            cut = np.where(
                reached.any(axis=1), np.argmax(reached, axis=1), nb - 1
            )
            keep = b <= cut[pt]
            pt, d, tie = pt[keep], d[keep], tie[keep]
            kept_idx = np.flatnonzero(keep)
        else:
            kept_idx = None
    else:
        kept_idx = None
    order = np.lexsort((tie, d, pt))
    pt_s = pt[order]
    d_s = d[order]
    cnt_kept = np.bincount(pt_s, minlength=n_groups)
    starts = np.concatenate(([0], np.cumsum(cnt_kept)[:-1]))
    rank = np.arange(len(pt_s), dtype=np.int64) - starts[pt_s] + 1
    take = rank <= kk
    n_clip = np.minimum(cnt, kk)
    kth = np.full(n_groups, np.inf)
    nz = cnt > 0
    kth[nz] = d_s[starts[nz] + n_clip[nz] - 1]
    sel = order[take] if kept_idx is None else kept_idx[order[take]]
    return sel, rank[take], cnt, kth


def _brute_pairs(plon: np.ndarray, plat: np.ndarray, idx: dict, kk: int,
                 chunk: int | None = None):
    """Exact top-kk against ALL targets, target-chunked so the distance
    block stays bounded; per-chunk winners pool into a final exact pass
    (any global top-kk element is top-kk in its own chunk under the same
    total order, so the pooling loses nothing — no argpartition tie
    hazards). ``chunk`` is auto-sized to a ~2e7-element distance block;
    the override exists for the pooling property test."""
    m = len(plon)
    n_t = len(idx["lon"])
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
             np.empty(0), np.empty(0, dtype=np.int64))
    if m == 0 or n_t == 0:
        return empty
    if chunk is None:
        chunk = max(int(kk), int(2e7 // max(m, 1)), 1)
    chunk = max(int(chunk), int(kk), 1)
    pool_pt, pool_tg, pool_d = [], [], []
    for s in range(0, n_t, chunk):
        e = min(n_t, s + chunk)
        # same sqrt(dx*dx + dy*dy) arithmetic as distance_deg: bit-parity
        # across plans (np.hypot is allowed to differ by 1 ulp)
        dx = idx["lon"][s:e][None, :] - plon[:, None]
        dy = idx["lat"][s:e][None, :] - plat[:, None]
        d = np.sqrt(dx * dx + dy * dy).ravel()
        pt = np.repeat(np.arange(m), e - s)
        tg = np.tile(np.arange(s, e), m)
        sel, _, _, _ = _seg_topk(pt, d, idx["key_rank"][tg], kk, m)
        pool_pt.append(pt[sel])
        pool_tg.append(tg[sel])
        pool_d.append(d[sel])
    pt = np.concatenate(pool_pt)
    tg = np.concatenate(pool_tg)
    d = np.concatenate(pool_d)
    sel, rank, _, _ = _seg_topk(pt, d, idx["key_rank"][tg], kk, m)
    return pt[sel], tg[sel], d[sel], rank


def _grid_topk_pairs(plon: np.ndarray, plat: np.ndarray, idx: dict, k: int,
                     r0: int):
    """EXACT top-k pairs for a batch of points against the broadcast grid
    index: ring gather at escalating Chebyshev radius (r0, 2r0, 4r0, ...)
    with the same completeness proof as the distributed plan (a point is
    done iff it found k candidates with k-th distance strictly inside the
    ring's guaranteed disc); points still unproven past the radius cap
    fall through to the chunked brute-force pass. Returns (pt, tg, dist,
    rank) with pt indexing the batch and tg the packed target arrays."""
    w = idx["W"]
    cw = idx["cell_w"]
    kk = min(k, len(idx["lon"]))
    m = len(plon)
    out = []
    if m == 0 or kk == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0), np.empty(0, dtype=np.int64))
    pix, piy = cells.ixy_np(plon, plat, idx["level"])
    active = np.arange(m)
    r = max(1, r0)
    r_cap = max(4 * max(1, r0), 32)
    while active.size:
        if r > r_cap or 2 * r + 1 >= w:
            bp, bt, bd, br = _brute_pairs(plon[active], plat[active], idx, kk)
            out.append((active[bp], bt, bd, br))
            break
        cp, ct = _gather_ring(idx["lin"], w, pix[active], piy[active], r)
        dx = idx["lon"][ct] - plon[active][cp]
        dy = idx["lat"][ct] - plat[active][cp]
        d = np.sqrt(dx * dx + dy * dy)
        sel, rank, cnt, kth = _seg_topk(
            cp, d, idx["key_rank"][ct], kk, active.size
        )
        # STRICT bound: a target at exactly r*cw could sit one cell past
        # the ring; < keeps the proof airtight (equality just escalates)
        complete = (cnt >= kk) & (kth < r * cw)
        cmask = complete[cp[sel]]
        out.append((active[cp[sel][cmask]], ct[sel][cmask], d[sel][cmask],
                    rank[cmask]))
        active = active[~complete]
        r *= 2
    pt = np.concatenate([o[0] for o in out])
    tg = np.concatenate([o[1] for o in out])
    dist = np.concatenate([o[2] for o in out])
    rank = np.concatenate([o[3] for o in out])
    return pt, tg, dist, rank


def _ring_udf(level: int, k: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def ring(cell: pd.Series) -> pd.Series:
        arr = cells.neighbors_np(cell.to_numpy(), level, k)
        # unique per row to drop clamped duplicates at grid edges
        return pd.Series([np.unique(row).tolist() for row in arr])

    return ring


def _local_topk(cand: DataFrame, k: int, point_key: str, target_key: str,
                extra_cols: list[str] | None = None) -> DataFrame:
    """Partition-local exact top-k (valid when all candidates of a point
    share its partition, i.e. after a broadcast candidate join). Emits
    per-row (_n, _dmax) — candidate count and k-th distance — for the
    ring-completion guard. One pandas pass, zero shuffles.
    ``extra_cols`` (e.g. target attributes) pass through untouched so a
    downstream JVM aggregation needs no second join."""
    extra_cols = extra_cols or []
    fields = {f.name: f for f in cand.schema.fields}
    schema = T.StructType([
        fields[point_key], fields[target_key],
        T.StructField("distance", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("_n", T.LongType()),
        T.StructField("_dmax", T.DoubleType()),
    ] + [fields[c] for c in extra_cols])

    def _topk(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        # pure numpy segment math (lexsort + run boundaries) — measured
        # faster than the equivalent pandas groupby/transform chain on
        # ~10^5-row partitions
        pt = pdf[point_key].to_numpy()
        dist = pdf["distance"].to_numpy()
        tgt = pdf[target_key].to_numpy()
        order = np.lexsort((tgt, dist, pt))
        pt_s, dist_s, tgt_s = pt[order], dist[order], tgt[order]
        new_grp = np.empty(len(pt_s), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = pt_s[1:] != pt_s[:-1]
        gid = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        counts = np.diff(np.append(starts, len(pt_s)))
        rank = (np.arange(len(pt_s)) - starts[gid] + 1).astype(np.int32)
        n_clip = np.minimum(counts, k)  # pre-limit count, clipped at k
        take = rank <= k
        dmax_g = dist_s[starts + n_clip - 1]  # k-th (or last) distance
        out = pd.DataFrame({
            point_key: pt_s[take],
            target_key: tgt_s[take],
            "distance": dist_s[take],
            "rank": rank[take],
            "_n": n_clip[gid][take],
            "_dmax": dmax_g[gid][take],
        })
        for c in extra_cols:
            out[c] = pdf[c].to_numpy()[order][take]
        yield out

    return cand.select(
        point_key, target_key, "distance", *extra_cols
    ).mapInPandas(_topk, schema=schema)


def _auto_level(r_needed: float) -> int:
    """Index level sized so a cell is ~r_needed/3: the ring-rounding
    overshoot stays <= (4/3)^2 in candidate count."""
    return int(np.clip(np.ceil(np.log2(540.0 / r_needed)), 4, 20))


def _target_stats(targets: DataFrame):
    """One slim agg job: target count + bbox (the inputs to density
    sizing). Shared by ``knn_join`` and ``knn_weighted_agg_fused`` so the
    sizing rule cannot silently diverge between the two entry points."""
    return targets.agg(
        F.count("*").alias("n"),
        F.min("lon").alias("x0"), F.max("lon").alias("x1"),
        F.min("lat").alias("y0"), F.max("lat").alias("y1"),
    ).collect()[0]


def _density_sizing(stats_row, k: int) -> tuple[int, float]:
    """-> (n_targets, r_needed): a guaranteed disc expected to hold ~1.5k
    targets, so the ring round completes almost every point (the reference
    sizes its search radius the same way — a fixed 0.1 deg default tuned
    to FIA plot density, processing_config_v3.py:23)."""
    n_targets = int(stats_row.n)
    area = max((stats_row.x1 - stats_row.x0) * (stats_row.y1 - stats_row.y0),
               1e-9)
    density = max(n_targets / area, 1e-9)
    return n_targets, float(np.sqrt(1.5 * k / (np.pi * density)))


def _ring_sizing(n_targets: int, r_needed: float,
                 level: int | None) -> tuple[int, float, int]:
    """-> (level, cell_w_deg, ring_k). Auto level: cell height ~
    r_needed/3 keeps the ring-rounding overshoot <= (4/3)^2 in candidate
    count while the ring table (targets x (2r+1)^2) stays broadcastable
    (shrunk until <= 2M rows); a caller-pinned level is honored as-is.
    The coverage guarantee must use the SMALLER cell dimension: the grid
    is 2^L x 2^L over a 360x180 extent, so cells are 2:1 rectangles and a
    ring of Chebyshev radius r only guarantees the disc of radius
    r * min(width, height) degrees."""
    if level is None:
        level = _auto_level(r_needed)
        while n_targets * (2 * max(1, int(np.ceil(
                r_needed / (180.0 / (1 << level))))) + 1) ** 2 > 2_000_000 \
                and level > 4:
            level -= 1
    cell_w_deg = min(
        (cells.LON_MAX - cells.LON_MIN) / (1 << level),
        (cells.LAT_MAX - cells.LAT_MIN) / (1 << level),
    )
    return level, cell_w_deg, max(1, int(np.ceil(r_needed / cell_w_deg)))


def _local_knn_join(points: DataFrame, targets: DataFrame, k: int,
                    level: int, point_key: str, target_key: str,
                    r_needed: float) -> DataFrame:
    """Map-only exact kNN: broadcast grid index + one mapInPandas over the
    points (see ``_build_target_index``). Zero joins, zero shuffles, zero
    JVM<->Arrow candidate traffic."""
    t_sel = targets.select(
        F.col(target_key),
        F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat"),
    )
    idx = _build_target_index(t_sel, target_key, level, [])
    r0 = max(1, int(np.ceil(r_needed / idx["cell_w"])))
    bc = points.sparkSession.sparkContext.broadcast(idx)
    schema = T.StructType([
        points.schema[point_key], targets.schema[target_key],
        T.StructField("distance", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ])

    def gen(batches):
        t = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            pt, tg, d, rank = _grid_topk_pairs(
                pdf["lon"].to_numpy(np.float64),
                pdf["lat"].to_numpy(np.float64), t, k, r0,
            )
            yield pd.DataFrame({
                point_key: pdf[point_key].to_numpy()[pt],
                target_key: t["key"][tg],
                "distance": d,
                "rank": rank.astype(np.int32),
            })

    return points.select(point_key, "lon", "lat").mapInPandas(gen, schema)


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    k: int = 50,
    level: int | None = None,
    point_key: str = "image_id",
    target_key: str = "plot_cn",
    init_ring: int | None = None,
    max_rounds: int = 4,  # kept for API compat; the 2-phase plan needs none
    broadcast_threshold: int = 2_000_000,
    local_index_threshold: int = 5_000_000,
) -> DataFrame:
    """points(point_key, lon, lat, cell_id) x targets(target_key, lon, lat)
    -> (point_key, target_key, distance, rank), rank 1..k. Exact
    (equal to brute force); ties broken by target_key ascending.

    Plan selection (in order):

    0. **local grid index** (targets <= ``local_index_threshold`` and no
       explicit ``level``/``init_ring`` override): the target side is
       collected ONCE and broadcast as packed numpy arrays with a
       sorted-cell CSR index; a single mapInPandas over the points runs
       the exact ring-escalation top-k per batch. Map-only — no join, no
       shuffle, no per-candidate Arrow row ever materialized. This is the
       broadcast-hash-join shape of the reference's fixed-radius plot
       query (``database_config_v3.py:104-114``) without the
       O(targets x ring_cells) exploded build side.
    1. **ring round**: targets explode to their density-sized k-ring
       (small side!) -> broadcast candidate join (shuffle-free on the big
       side) -> guard pre-filter -> partition-local exact top-k. A point is
       *provably complete* iff it found k neighbors within the ring's
       guaranteed radius. The round's output is localCheckpoint'ed: it is
       consumed twice (results + completeness) and must not recompute.
    2. **fallback**: the (few) unprovable points get an exact brute-force
       window over a cross join with all targets.

    NULL/NaN-coordinate rows (either side) are dropped up front — an
    undefined position has no defined neighbors (``_valid_coords``).
    """
    points, targets = _valid_coords(points), _valid_coords(targets)
    stats_row = _target_stats(targets)
    if int(stats_row.n) == 0:
        # kNN over zero targets = zero neighbor rows (the bbox stats below
        # are NULL and would raise in the density arithmetic)
        return points.sparkSession.createDataFrame([], T.StructType([
            points.schema[point_key], targets.schema[target_key],
            T.StructField("distance", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]))
    n_targets, r_needed = _density_sizing(stats_row, k)
    if (level is None and init_ring is None
            and n_targets <= local_index_threshold):
        return _local_knn_join(
            points, targets, k, _auto_level(r_needed), point_key,
            target_key, r_needed,
        )
    level, cell_w_deg, ring_k = _ring_sizing(n_targets, r_needed, level)
    if init_ring is not None:
        ring_k = init_ring
    guard = ring_k * cell_w_deg

    targets = targets.select(
        F.col(target_key),
        F.col("lon").alias("t_lon"),
        F.col("lat").alias("t_lat"),
        cells.cell_id_col(F.col("lon"), F.col("lat"), level).alias("t_cell"),
    )
    # point cells are derived HERE at the operator's own level (the
    # caller's cell_id column, if any, may be at a different level)
    # consumed by BOTH the candidate join and the straggler anti-join:
    # checkpoint so the (possibly UDF-derived) point coordinates are
    # computed once, not once per branch
    pts = points.select(point_key, "lon", "lat").withColumn(
        "p_cell", cells.cell_id_col(F.col("lon"), F.col("lat"), level)
    ).localCheckpoint(eager=False)
    ring = _ring_udf(level, ring_k)
    # ring expansion on the SMALL side: point's ring contains the target's
    # cell iff the target's ring contains the point's cell (Chebyshev
    # symmetry) — exploding targets x ring broadcasts, making the candidate
    # join shuffle-free on the big side.
    t_ring = targets.withColumn("ring_cell", F.explode(ring(F.col("t_cell"))))
    ring_rows = n_targets * (2 * ring_k + 1) ** 2
    broadcast_side = ring_rows <= broadcast_threshold
    if broadcast_side:
        t_ring = F.broadcast(t_ring)
    cand = (
        pts.join(t_ring, F.col("p_cell") == F.col("ring_cell"))
        .withColumn(
            "distance",
            distance_deg(F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")),
        )
        # beyond the guard radius a candidate can't be part of a provably
        # complete top-k; dropping them JVM-side leaves the completion set
        # unchanged and shrinks Arrow traffic ~10x
        .where(F.col("distance") <= F.lit(guard))
    )
    if broadcast_side:
        # broadcast join keeps every candidate of a point in the point's own
        # partition -> exact top-k partition-locally, zero shuffles
        topk = _local_topk(cand, k, point_key, target_key)
    else:
        w = Window.partitionBy(point_key).orderBy("distance", target_key)
        ranked = cand.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
        stats = ranked.groupBy(point_key).agg(
            F.count("*").alias("_n"), F.max("distance").alias("_dmax")
        )
        topk = ranked.join(stats, point_key).select(
            point_key, target_key, "distance", "rank", "_n", "_dmax"
        )
    # consumed twice below -> checkpoint once (auto-cleaned by the context
    # cleaner; unlike persist() this cannot leak across repeated calls)
    topk = topk.localCheckpoint(eager=False)

    # completeness is ROW-LOCAL (_n/_dmax are per-point constants carried on
    # every row) -> done needs no join at all
    complete_cond = (F.col("_n") >= k) & (F.col("_dmax") <= guard)
    complete_keys = topk.where(complete_cond).select(point_key).distinct()
    done = topk.where(complete_cond).select(
        point_key, target_key, "distance", "rank"
    )
    # exact fallback for the unprovable stragglers: brute-force window over
    # a cross join (tiny left side when the ring was sized right)
    stragglers = pts.join(F.broadcast(complete_keys), point_key, "left_anti")
    cand2 = stragglers.crossJoin(targets).withColumn(
        "distance",
        distance_deg(F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")),
    )
    w2 = Window.partitionBy(point_key).orderBy("distance", target_key)
    fallback = (
        cand2.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(point_key, target_key, "distance", "rank")
    )
    return done.unionByName(fallback)


def _local_fused(points: DataFrame, targets: DataFrame, attrs: list[str],
                 k: int, level: int, point_key: str, target_key: str,
                 eps: float, mode_attr: str | None,
                 r_needed: float) -> DataFrame:
    """Map-only fused kNN + weighted agg: the exact top-k AND the
    1/(d+eps)-weighted aggregation (A5 means, optional A6 mode) happen in
    the SAME numpy pass over each point batch — one output row per point
    leaves the worker; the points x k stream never exists anywhere."""
    extra = [mode_attr] if mode_attr else []
    t_sel = targets.select(
        F.col(target_key),
        F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat"),
        *attrs, *extra,
    )
    idx = _build_target_index(t_sel, target_key, level, list(attrs),
                              raw_cols=extra)
    r0 = max(1, int(np.ceil(r_needed / idx["cell_w"])))
    bc = points.sparkSession.sparkContext.broadcast(idx)
    fields = [
        points.schema[point_key],
        T.StructField("sum_w", T.DoubleType()),
        T.StructField("n_neighbors", T.LongType()),
    ] + [T.StructField(f"w_{a}", T.DoubleType()) for a in attrs]
    if mode_attr:
        fields.append(T.StructField(
            f"mode_{mode_attr}", targets.schema[mode_attr].dataType))
    schema = T.StructType(fields)

    def gen(batches):
        t = bc.value
        if len(t["lon"]) == 0:
            return
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            pt, tg, d, _ = _grid_topk_pairs(
                pdf["lon"].to_numpy(np.float64),
                pdf["lat"].to_numpy(np.float64), t, k, r0,
            )
            wgt = 1.0 / (d + eps)
            sum_w = np.bincount(pt, weights=wgt, minlength=m)
            cols = {
                point_key: pdf[point_key].to_numpy(),
                "sum_w": sum_w,
                "n_neighbors": np.bincount(pt, minlength=m).astype(np.int64),
            }
            for a in attrs:
                av = t["attrs"][a][tg]
                ok = ~np.isnan(av)
                # NULL attrs contribute nothing to the numerator while the
                # denominator keeps EVERY neighbor's weight — identical to
                # the distributed plans' sum(w*attr)/sum(w) where F.sum
                # skips the NULL products; a point whose top-k attrs are
                # all NULL gets NULL, never 0/sum_w. (The packed index
                # cannot tell a stored NaN from SQL NULL; both quarantine.)
                num = np.bincount(pt[ok], weights=wgt[ok] * av[ok],
                                  minlength=m)
                n_ok = np.bincount(pt[ok], minlength=m)
                col = pd.array(num / sum_w, dtype="Float64")
                col[n_ok == 0] = pd.NA
                cols[f"w_{a}"] = col
            if mode_attr:
                cat = t["raw"][mode_attr][tg]
                okc = ~pd.isna(cat)
                # NULL categories never nominate a winner (the distributed
                # plan's max skips them); all-NULL top-k -> NULL mode
                uq, code = np.unique(cat[okc], return_inverse=True)
                if len(uq):
                    votes = np.bincount(
                        pt[okc] * len(uq) + code, weights=wgt[okc],
                        minlength=m * len(uq),
                    ).reshape(m, len(uq))
                    # argmax returns the FIRST max -> ties take the smaller
                    # category (uq is sorted ascending), the A6 rule
                    winner = uq[np.argmax(votes, axis=1)]
                    voted = votes.sum(axis=1) > 0
                else:
                    winner = np.zeros(m)
                    voted = np.zeros(m, dtype=bool)
                mcol = pd.Series(winner, dtype="object")
                mcol[~voted] = None
                cols[f"mode_{mode_attr}"] = mcol
            yield pd.DataFrame(cols)

    return points.select(point_key, "lon", "lat").mapInPandas(gen, schema)


def knn_weighted_agg_fused(
    points: DataFrame,
    targets: DataFrame,
    attrs: list[str],
    k: int = 50,
    level: int | None = None,
    point_key: str = "image_id",
    target_key: str = "plot_cn",
    eps: float = 0.01,
    broadcast_threshold: int = 2_000_000,
    mode_attr: str | None = None,
    local_index_threshold: int = 5_000_000,
) -> DataFrame:
    """Fused kNN + distance-weighted aggregation: semantically identical to
    ``distance_weighted_agg(knn_join(...), targets, attrs)`` but the
    aggregation happens INSIDE the partition-local top-k pandas pass, so
    the points x k intermediate (10M+ rows at bench scale) is never
    materialized, checkpointed, or shuffled — output is one row per point,
    produced map-side. Stragglers fall back through the exact path.

    ``mode_attr``: optional NUMERIC target category column; adds a
    ``mode_{mode_attr}`` column = the A6 weighted MODE (argmax of summed
    1/(d+eps) weights, ties to the smaller category —
    forest_analyzer_v3.py:644-680) computed in the SAME candidate pass via
    a two-level (point, cat) -> point aggregation: the per-cat partials
    (~points x n_cats rows) carry both the mode vote and the weighted-mean
    sums, so the points x k stream still never materializes.
    """
    # ---- phase 1 setup: the SHARED sizing helpers knn_join uses ----
    # (incl. the NULL/NaN coordinate gate — see _valid_coords)
    points, targets = _valid_coords(points), _valid_coords(targets)
    stats_row = _target_stats(targets)
    if int(stats_row.n) == 0:
        # zero targets -> zero aggregate rows (NULL bbox stats would raise
        # in the density arithmetic below)
        fields = [points.schema[point_key],
                  T.StructField("sum_w", T.DoubleType()),
                  T.StructField("n_neighbors", T.LongType())]
        fields += [T.StructField(f"w_{a}", T.DoubleType()) for a in attrs]
        if mode_attr:
            fields.append(T.StructField(
                f"mode_{mode_attr}", targets.schema[mode_attr].dataType))
        return points.sparkSession.createDataFrame([], T.StructType(fields))
    n_targets, r_needed = _density_sizing(stats_row, k)
    if level is None and n_targets <= local_index_threshold:
        return _local_fused(
            points, targets, attrs, k, _auto_level(r_needed), point_key,
            target_key, eps, mode_attr, r_needed,
        )
    level, cell_w_deg, ring_k = _ring_sizing(n_targets, r_needed, level)
    guard = ring_k * cell_w_deg

    t_sel = targets.select(
        F.col(target_key),
        F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat"),
        cells.cell_id_col(F.col("lon"), F.col("lat"), level).alias("t_cell"),
    )
    # consumed by BOTH the candidate join and the straggler anti-join:
    # checkpoint so the (possibly UDF-derived) point coordinates are
    # computed once, not once per branch
    pts = points.select(point_key, "lon", "lat").withColumn(
        "p_cell", cells.cell_id_col(F.col("lon"), F.col("lat"), level)
    ).localCheckpoint(eager=False)
    ring = _ring_udf(level, ring_k)
    t_ring = t_sel.withColumn("ring_cell", F.explode(ring(F.col("t_cell"))))
    # same guard as knn_join: an explicit `level` arg or the level-4 floor
    # can make the exploded ring table arbitrarily large — only broadcast
    # when it provably fits, else shuffle-join + window top-k
    ring_rows = n_targets * (2 * ring_k + 1) ** 2
    broadcast_side = ring_rows <= broadcast_threshold
    if broadcast_side:
        t_ring = F.broadcast(t_ring)
    # the candidate stream stays SLIM (key, target, distance): target
    # attrs ride a tiny broadcast join onto the points x k TOP-K output
    # instead — measured ~30% faster than carrying them through the
    # ~points x 75 Arrow transfer into the pandas pass
    cand = (
        pts.join(t_ring, F.col("p_cell") == F.col("ring_cell"))
        .withColumn("distance", distance_deg(
            F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")))
        .where(F.col("distance") <= F.lit(guard))
        .select(point_key, target_key, "distance")
    )

    # top-k stays the single pandas pass (partition-local when broadcast,
    # window otherwise); the weighted aggregation is JVM hash-agg with
    # map-side partial combine — measured faster than aggregating in
    # pandas (multiple per-attr groupbys cost more than the tiny shuffle
    # of pre-combined partials), and no points x k checkpoint either way.
    if broadcast_side:
        # broadcast co-location: every candidate of a point shares its
        # partition -> exact top-k map-side. _n >= k iff the pre-limit
        # candidate count reached k.
        topk = _local_topk(cand, k, point_key, target_key)
        complete = ((F.min("_n") >= k)
                    & (F.max("distance") <= F.lit(guard))).alias("complete")
    else:
        # shuffle fallback (huge ring table): exact top-k via window.
        # count(*) >= k iff the pre-limit candidate count was >= k.
        w = Window.partitionBy(point_key).orderBy("distance", target_key)
        topk = cand.withColumn("_rank", F.row_number().over(w)).where(
            F.col("_rank") <= k
        )
        complete = ((F.count("*") >= k)
                    & (F.max("distance") <= F.lit(guard))).alias("complete")
    # attrs join on the points x k output: the targets dim is tiny and
    # broadcast, the groupBy partial-combines map-side before ONE small
    # shuffle of ~points rows
    extra = [mode_attr] if mode_attr else []
    # nan_attrs_as_null: a stored NaN attr/category is UNKNOWN — same
    # quarantine as NULL, matching the local kernel's isnan mask
    topk = topk.join(
        F.broadcast(targets.select(
            target_key, *nan_attrs_as_null(targets, [*attrs, *extra])
        )), target_key
    )
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    if mode_attr is None:
        agg = topk.groupBy(point_key).agg(
            F.sum(wcol).alias("sum_w"),
            F.count("*").alias("n_neighbors"),
            complete,
            *[(F.sum(wcol * F.col(a)) / F.sum(wcol)).alias(f"w_{a}")
              for a in attrs],
        ).select(
            point_key, "sum_w", "n_neighbors", "complete",
            *[f"w_{a}" for a in attrs]
        )
    else:
        # two-level agg: per-(point, cat) partials feed BOTH the weighted
        # means (sum_w / sum_wx re-summed per point) and the mode argmax
        per_cat = topk.groupBy(point_key, mode_attr).agg(
            F.sum(wcol).alias("_w"),
            F.count("*").alias("_cnt"),
            F.max("distance").alias("_dmax"),
            *([F.min("_n").alias("_nmin")] if broadcast_side else []),
            *[F.sum(wcol * F.col(a)).alias(f"_ws_{a}") for a in attrs],
        )
        if broadcast_side:
            complete2 = ((F.min("_nmin") >= k)
                         & (F.max("_dmax") <= F.lit(guard))).alias("complete")
        else:
            complete2 = ((F.sum("_cnt") >= k)
                         & (F.max("_dmax") <= F.lit(guard))).alias("complete")
        # argmax: max struct orders by (weight, -cat) -> ties take the
        # smaller category, the documented A6 tie rule. NULL categories
        # are excluded from the vote (the F.when -> NULL struct is skipped
        # by max): they still count toward sum_w / the means, but can
        # never win; a point whose cats are ALL NULL gets a NULL mode —
        # same rule as the local kernel and weighted_mode.
        mode_col = F.max(F.when(F.col(mode_attr).isNotNull(), F.struct(
            F.col("_w"), (-F.col(mode_attr)).alias("_neg"),
            F.col(mode_attr).alias("_cat"),
        )))["_cat"].alias(f"mode_{mode_attr}")
        agg = per_cat.groupBy(point_key).agg(
            F.sum("_w").alias("sum_w"),
            F.sum("_cnt").alias("n_neighbors"),
            complete2,
            mode_col,
            *[(F.sum(f"_ws_{a}") / F.sum("_w")).alias(f"w_{a}")
              for a in attrs],
        ).select(
            point_key, "sum_w", "n_neighbors", "complete",
            *[f"w_{a}" for a in attrs], f"mode_{mode_attr}",
        )
    agg = agg.localCheckpoint(eager=False)
    done = agg.where(F.col("complete")).drop("complete")
    complete_keys = agg.where(F.col("complete")).select(point_key)
    stragglers = pts.join(F.broadcast(complete_keys), point_key, "left_anti")
    # exact fallback: brute-force kNN + relational weighted agg
    fb_knn = _bruteforce_topk(stragglers, t_sel, k, point_key, target_key)
    fb = distance_weighted_agg(
        fb_knn, targets, attrs, point_key=point_key, target_key=target_key,
        eps=eps,
    )
    if mode_attr is not None:
        from biomass_processing_pipeline_spark.operators.forest import (
            weighted_mode,
        )

        fb_mode = weighted_mode(
            fb_knn, targets, mode_attr, point_key=point_key,
            target_key=target_key, eps=eps,
        ).select(point_key,
                 F.col("dominant_type").alias(f"mode_{mode_attr}"))
        # left: a straggler whose top-k cats are ALL NULL has no
        # weighted_mode row — it keeps a NULL mode, same as the main path
        fb = fb.join(fb_mode, point_key, "left")
    return done.unionByName(fb.select(*done.columns))


def _bruteforce_topk(pts: DataFrame, t_sel: DataFrame, k: int,
                     point_key: str, target_key: str) -> DataFrame:
    cand = pts.crossJoin(t_sel.select(target_key, "t_lon", "t_lat")).withColumn(
        "distance",
        distance_deg(F.col("lon"), F.col("lat"), F.col("t_lon"), F.col("t_lat")),
    )
    w = Window.partitionBy(point_key).orderBy("distance", target_key)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(point_key, target_key, "distance", "rank")
    )


def distance_weighted_agg(
    knn: DataFrame,
    targets: DataFrame,
    attrs: list[str],
    point_key: str = "image_id",
    target_key: str = "plot_cn",
    eps: float = 0.01,
) -> DataFrame:
    """A5: per point, weighted mean of target attrs, weight 1/(dist+eps)
    (reference ``forest_analyzer_v3.py:185-248``). Plain relational aggs —
    partial/final map-side combine for free. Stored-NaN attrs quarantine
    to NULL first (``nan_attrs_as_null``) so F.sum's NULL-skip applies the
    same unknown-drops-from-the-numerator rule as the local kernel."""
    j = knn.join(
        targets.select(target_key, *nan_attrs_as_null(targets, attrs)),
        target_key,
    )
    wcol = 1.0 / (F.col("distance") + F.lit(eps))
    aggs = [F.sum(wcol).alias("sum_w"), F.count("*").alias("n_neighbors")]
    for a in attrs:
        aggs.append((F.sum(wcol * F.col(a)) / F.sum(wcol)).alias(f"w_{a}"))
    return j.groupBy(point_key).agg(*aggs)
