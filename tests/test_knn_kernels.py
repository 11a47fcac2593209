"""Property tests for the pure-numpy kNN grid-index kernels (no Spark).

The local-index fast path's exactness rests on three numpy kernels
(`_gather_ring`, `_seg_topk`, `_grid_topk_pairs`) and their completeness
proof (a point's top-k is final iff its k-th distance is STRICTLY inside
the gathered Chebyshev ring's guaranteed disc). The Spark-level tests
check parity on fixed fixtures; these fuzz the kernels across random
levels / cluster shapes / duplicate coordinates / boundary-exact points,
where the proof's edge cases live (ties at ring radius, grid-edge
clamping, escalation-to-brute fallback, k >= n_targets).

Reference semantics (mirrors the reference's 2-phase candidate-ring
nearest-tile lookup, coordinate_utils_v3.py:264-318): exact top-k by
(distance, target_key) ascending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from biomass_processing_pipeline_spark import cells
from biomass_processing_pipeline_spark.operators.knn import (
    _brute_pairs,
    _gather_ring,
    _grid_topk_pairs,
    _pack_target_index,
    _seg_topk,
)

# A coarse lattice of candidate coordinates inside one fixture-like
# sub-extent. Includes values EXACTLY on cell boundaries for levels <= 8
# (multiples of 360/2^8 = 1.40625 deg), which is where floor()-based cell
# assignment and the strict ring bound interact.
_LON_CHOICES = np.round(np.arange(-100.0, -95.0, 0.3515625), 7)
_LAT_CHOICES = np.round(np.arange(38.0, 42.0, 0.3515625), 7)


def _mk_index(tlon: np.ndarray, tlat: np.ndarray, level: int) -> dict:
    keys = np.array([f"t{i:04d}" for i in range(len(tlon))])
    pdf = pd.DataFrame({"tk": keys, "t_lon": tlon, "t_lat": tlat})
    return _pack_target_index(pdf, "tk", level, [])


def _ref_topk(plon, plat, tlon, tlat, kk):
    """Brute-force oracle: per point, full distance vector, exact top-kk
    under (distance, key-index). Keys are f"t{i:04d}" so key order ==
    index order, matching key_rank in the packed index."""
    out = []
    for i in range(len(plon)):
        dx = tlon - plon[i]
        dy = tlat - plat[i]
        d = np.sqrt(dx * dx + dy * dy)
        order = np.lexsort((np.arange(len(tlon)), d))[:kk]
        for r, j in enumerate(order, 1):
            out.append((i, j, d[j], r))
    return out


def _norm(pairs_iterable):
    return sorted(
        (int(p), int(t), float(d), int(r)) for p, t, d, r in pairs_iterable
    )


lon_idx = st.integers(0, len(_LON_CHOICES) - 1)
lat_idx = st.integers(0, len(_LAT_CHOICES) - 1)
point_list = st.lists(st.tuples(lon_idx, lat_idx), min_size=1,
                      max_size=40)


@settings(max_examples=60, deadline=None)
@given(
    pts=point_list,
    tgs=point_list,
    k=st.integers(1, 8),
    level=st.integers(3, 12),
    r0=st.integers(1, 4),
)
def test_grid_topk_pairs_matches_bruteforce(pts, tgs, k, level, r0):
    plon = _LON_CHOICES[[i for i, _ in pts]]
    plat = _LAT_CHOICES[[j for _, j in pts]]
    tlon = _LON_CHOICES[[i for i, _ in tgs]]
    tlat = _LAT_CHOICES[[j for _, j in tgs]]
    idx = _mk_index(tlon, tlat, level)
    # reorder-resistant check: the packed index sorts targets by cell, so
    # map packed target positions back to input positions via the key
    key_to_input = {f"t{i:04d}": i for i in range(len(tlon))}
    kk = min(k, len(tlon))

    pt, tg, d, rank = _grid_topk_pairs(plon, plat, idx, k, r0)
    got = _norm(
        (p, key_to_input[idx["key"][t]], dd, r)
        for p, t, dd, r in zip(pt, tg, d, rank)
    )
    want = _norm(_ref_topk(plon, plat, tlon, tlat, kk))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    pts=point_list,
    tgs=point_list,
    r=st.integers(0, 5),
    level=st.integers(3, 10),
)
def test_gather_ring_is_exactly_the_chebyshev_disc(pts, tgs, r, level):
    plon = _LON_CHOICES[[i for i, _ in pts]]
    plat = _LAT_CHOICES[[j for _, j in pts]]
    tlon = _LON_CHOICES[[i for i, _ in tgs]]
    tlat = _LAT_CHOICES[[j for _, j in tgs]]
    idx = _mk_index(tlon, tlat, level)
    w = idx["W"]
    pix, piy = cells.ixy_np(plon, plat, level)
    tix = idx["lin"] % w
    tiy = idx["lin"] // w

    gp, gt = _gather_ring(idx["lin"], w, pix, piy, r)
    got = set(zip(gp.tolist(), gt.tolist()))
    want = {
        (i, j)
        for i in range(len(plon))
        for j in range(len(idx["lin"]))
        if abs(int(tix[j]) - int(pix[i])) <= r
        and abs(int(tiy[j]) - int(piy[i])) <= r
    }
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    n_groups=st.integers(1, 10),
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 4), st.integers(0, 999)),
        min_size=0, max_size=120,
    ),
    kk=st.integers(1, 6),
)
def test_seg_topk_rank_count_and_kth(n_groups, rows, kk):
    """(sel, rank, cnt, kth) agree with a per-group python re-sort; heavy
    distance ties (5 distinct values) force the tie-rank ordering."""
    rows = [(g % n_groups, d, t) for g, d, t in rows]
    pt = np.array([g for g, _, _ in rows], dtype=np.int64)
    d = np.array([float(dd) for _, dd, _ in rows])
    tie = np.array([t for _, _, t in rows], dtype=np.int64)
    sel, rank, cnt, kth = _seg_topk(pt, d, tie, kk, n_groups)

    by_group: dict[int, list[tuple[float, int, int]]] = {}
    for i, (g, dd, t) in enumerate(rows):
        by_group.setdefault(g, []).append((float(dd), t, i))
    got = sorted(zip(pt[sel].tolist(), rank.tolist(), sel.tolist()))
    want = []
    for g in range(n_groups):
        members = sorted(by_group.get(g, []))
        assert cnt[g] == len(members)
        if members:
            n_clip = min(len(members), kk)
            assert kth[g] == members[n_clip - 1][0]
        else:
            assert kth[g] == np.inf
        for r, (_, _, i) in enumerate(members[:kk], 1):
            want.append((g, r, i))
    assert got == sorted(want)


@settings(max_examples=40, deadline=None)
@given(pts=point_list, tgs=point_list, k=st.integers(1, 60))
def test_brute_pairs_matches_reference(pts, tgs, k):
    """The brute fallback is itself exact, including k >= n_targets (at
    these sizes it runs single-chunk; the chunked pooling path is covered
    below with a forced tiny chunk)."""
    plon = _LON_CHOICES[[i for i, _ in pts]]
    plat = _LAT_CHOICES[[j for _, j in pts]]
    tlon = _LON_CHOICES[[i for i, _ in tgs]]
    tlat = _LAT_CHOICES[[j for _, j in tgs]]
    idx = _mk_index(tlon, tlat, 8)
    key_to_input = {f"t{i:04d}": i for i in range(len(tlon))}
    kk = min(k, len(tlon))
    pt, tg, d, rank = _brute_pairs(plon, plat, idx, kk)
    got = _norm(
        (p, key_to_input[idx["key"][t]], dd, r)
        for p, t, dd, r in zip(pt, tg, d, rank)
    )
    want = _norm(_ref_topk(plon, plat, tlon, tlat, kk))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(pts=point_list, tgs=point_list, k=st.integers(1, 6),
       chunk=st.integers(1, 7))
def test_brute_pairs_chunk_pooling_is_lossless(pts, tgs, k, chunk):
    """Force tiny target chunks so every example crosses chunk boundaries:
    the per-chunk winner pool + final pass must equal the single-chunk
    answer (any global top-k element is top-k in its own chunk)."""
    plon = _LON_CHOICES[[i for i, _ in pts]]
    plat = _LAT_CHOICES[[j for _, j in pts]]
    tlon = _LON_CHOICES[[i for i, _ in tgs]]
    tlat = _LAT_CHOICES[[j for _, j in tgs]]
    idx = _mk_index(tlon, tlat, 8)
    kk = min(k, len(tlon))
    chunked = _brute_pairs(plon, plat, idx, kk, chunk=chunk)
    single = _brute_pairs(plon, plat, idx, kk)
    got = _norm(zip(*chunked))
    want = _norm(zip(*single))
    assert got == want


def test_seg_topk_bucket_prune_branch_exact():
    """The round-6 bucket pre-prune only engages above 2048 rows (and
    len > 4*n_groups) — force that branch deterministically and compare
    the full (sel, rank, cnt, kth) tuple against the prune-free
    reference (small inputs skip the prune, so the hypothesis fuzz above
    never reaches it). Heavy engineered ties at the k-th distance land
    in the boundary bucket and must survive identically."""
    rng = np.random.default_rng(7)
    n_groups, per, kk = 64, 200, 13
    pt = np.repeat(np.arange(n_groups), per)
    # quantized distances -> many exact ties, including at the cut
    d = np.round(rng.random(n_groups * per), 2)
    tie = rng.permutation(n_groups * per).astype(np.int64)

    def ref(pt, d, tie, kk, n_groups):
        order = np.lexsort((tie, d, pt))
        pt_s, d_s = pt[order], d[order]
        cnt = np.bincount(pt_s, minlength=n_groups)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        rank = np.arange(len(pt_s), dtype=np.int64) - starts[pt_s] + 1
        take = rank <= kk
        n_clip = np.minimum(cnt, kk)
        kth = np.full(n_groups, np.inf)
        nz = cnt > 0
        kth[nz] = d_s[starts[nz] + n_clip[nz] - 1]
        return order[take], rank[take], cnt, kth

    got = _seg_topk(pt, d, tie, kk, n_groups)
    want = ref(pt, d, tie, kk, n_groups)
    assert all(np.array_equal(a, b) for a, b in zip(got, want))
    # degenerate all-equal distances: prune skips via dmax == 0
    got0 = _seg_topk(pt, np.zeros_like(d), tie, kk, n_groups)
    want0 = ref(pt, np.zeros_like(d), tie, kk, n_groups)
    assert all(np.array_equal(a, b) for a, b in zip(got0, want0))
    # groups with fewer than kk candidates keep everything
    small = pt[pt < 3][:5]
    gots = _seg_topk(np.concatenate([pt, small]),
                     np.concatenate([d, d[:5]]),
                     np.concatenate([tie, tie[:5] + 100000]), kk, n_groups)
    wants = ref(np.concatenate([pt, small]),
                np.concatenate([d, d[:5]]),
                np.concatenate([tie, tie[:5] + 100000]), kk, n_groups)
    assert all(np.array_equal(a, b) for a, b in zip(gots, wants))
