"""HBM-resident voxel-hash map with batched k-NN — the TPU-native
replacement for the reference's incremental k-d tree (ikd-Tree).

Policy parity with the reference (not a port of its pointer machinery):

  * the map keeps ~one point per `voxel_size` voxel, preferring the point
    with the LOWEST stored covariance (`normal_y`) — the MA-LIO modification
    of the ikd-tree's insert-time downsample (ikd_Tree.cpp:504-522) and the
    map_incremental dedup policy (laserMapping.cpp:398-446);
  * box eviction replaces lasermap_fov_segment + Delete_Point_Boxes
    (laserMapping.cpp:171-224): cells outside the sliding local-map box are
    freed in one masked pass — no background rebuild thread is needed
    because insert/evict are O(1) data-parallel scatters;
  * k-NN returns the k nearest stored points with their covariances,
    searched over the (2r+1)^3 voxel neighborhood of the query.

Storage layout (round-3 bucket redesign, driven by a gather
microbenchmark on the chip): the v5e fetches a CONTIGUOUS table row of up
to ~256 B in ~8-10 ns regardless of width, but a (Q, 8)-shaped
scalar-window gather costs ~58 ns and the round-2 two-gather probe
(fingerprint window + matched record) ~64 ns per cell. So the table is an
array of ALIGNED BUCKETS:

  * `tab` has shape (B + 1, BUCKET, 5); bucket row b is 40 contiguous
    floats holding BUCKET slots of [fp, x, y, z, cov] — fingerprint and
    record FUSED;
  * a voxel key hashes (murmur-remixed, so dense key grids spread over
    ALL hash bits, not just the low ones) to bucket b and may occupy any
    of the 2*BUCKET slots of the aligned pair starting at
    b_start = min(b, B-2) — fetched with ONE two-row slice-gather (320 B
    contiguous). The clamp keeps the row count a power of two (the mp
    shard axis divides it); the last two hash buckets simply share a
    window. Identification is a fingerprint lane-compare — pure VPU work
    on the fetched rows. A full 16-slot window drops the candidate
    (counted in `n_dropped`); claims prefer a fingerprint-derived lane
    rotation so same-batch candidates hitting one window contend rarely;
  * fingerprints are 23-bit (nonzero) so they are EXACT in any float
    dtype >= f32 — the fused row stays one homogeneous float array
    (bitcasting f32 patterns through an f64 test table would
    canonicalize NaN payloads). Window-collision freedom of the 23-bit
    fingerprint is checked exhaustively in tests/test_map.py.

All operations are jit-safe, vmap-based, fixed-shape. `tab.reshape(T, 5)`
is the free flat struct view used by scatters and full-table passes
(row-major (B, BUCKET, 5) is bit-identical to (T, 5)).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

# spatial hash primes (Teschner et al.)
_P1 = np.int32(73856093)
_P2 = np.int32(19349663)
_P3 = np.int32(83492791)
# independent primes for the fingerprint fast path
_F1 = np.int32(1540483477)
_F2 = np.int32(1274126177)
_F3 = np.int32(868864169)

BUCKET = 8  # slots per bucket row
WINDOW = 2 * BUCKET  # slots reachable per key (aligned bucket pair)
# two rounds resolve all matches plus batch-duplicate losers (a dropped
# claim re-offers itself on the next scan anyway)
INSERT_ROUNDS = 2
NUM_MATCH_POINTS = 5  # common_lib.h:22

# legacy alias (probe depth == bucket width for sizing math elsewhere)
MAX_PROBE = BUCKET


class VoxelHashMap(NamedTuple):
    tab: jnp.ndarray  # (B, BUCKET, 5) fused rows [fp, x, y, z, cov]
    voxel_size: jnp.ndarray  # ()
    n_dropped: jnp.ndarray  # () int32 cumulative insert overflow drops

    # convenience views (not pytree leaves); batch-safe (leading axes of a
    # stacked/vmapped map pass through)
    @property
    def capacity(self) -> int:
        return self.tab.shape[-3] * BUCKET

    @property
    def flat(self) -> jnp.ndarray:
        return self.tab.reshape(*self.tab.shape[:-3], -1, 5)

    @property
    def fp(self) -> jnp.ndarray:
        """Stored fingerprints as floats; 0.0 = empty slot."""
        return self.flat[..., 0]

    @property
    def occupied(self) -> jnp.ndarray:
        return self.flat[..., 0] != 0

    @property
    def points(self) -> jnp.ndarray:
        return self.flat[..., 1:4]

    @property
    def covs(self) -> jnp.ndarray:
        return self.flat[..., 4]


def create(capacity: int, voxel_size: float, dtype=jnp.float32) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    assert capacity >= BUCKET
    B = capacity // BUCKET
    assert B >= 2
    tab = jnp.zeros((B, BUCKET, 5), dtype).at[:, :, 4].set(jnp.inf)
    return VoxelHashMap(
        tab=tab,
        voxel_size=jnp.asarray(voxel_size, dtype),
        n_dropped=jnp.asarray(0, jnp.int32),
    )


def voxel_key(m: VoxelHashMap, pts):
    return jnp.floor(pts / m.voxel_size).astype(jnp.int32)


def _hash(keys, num_buckets):
    """Bucket index. The xor-of-products spatial hash clusters dense key
    grids in its LOW bits; with only log2(B) bucket bits that caused 60%
    insert drops on grid worlds. The murmur finalizer mixes all 32 bits
    into the masked range."""
    h = (keys[..., 0] * _P1) ^ (keys[..., 1] * _P2) ^ (keys[..., 2] * _P3)
    u = h.astype(jnp.uint32)
    u = u ^ (u >> 16)
    u = u * np.uint32(0x7FEB352D)
    u = u ^ (u >> 15)
    u = u * np.uint32(0x846CA68B)
    u = u ^ (u >> 16)
    return (u & np.uint32(num_buckets - 1)).astype(jnp.int32)


def _fingerprint(keys):
    """Nonzero 23-bit fingerprint of a voxel key (0 is reserved for
    empty), exactly representable in f32 so it lives inside the fused
    float bucket row.

    Construction (see round-2/3 history): additive linear combine (so
    in-window key deltas have constant hash difference), then the murmur3
    finalizer (a bijection on uint32) for avalanche, then the TOP 23 bits.
    Truncation makes key->fp no longer injective per 32-bit block, so the
    small-delta window-collision freedom is re-verified exhaustively for
    |delta|_inf <= 12 in
    tests/test_map.py::test_fingerprint_window_collision_free. Far
    collisions (~2^-23 per pair) offer a far candidate that the distance
    top-k discards (or, on insert, merge two voxels under the lowest-cov
    policy — benign)."""
    h = keys[..., 0] * _F1 + keys[..., 1] * _F2 + keys[..., 2] * _F3
    u = h.astype(jnp.uint32)
    u = u ^ (u >> 16)
    u = u * np.uint32(0x85EBCA6B)
    u = u ^ (u >> 13)
    u = u * np.uint32(0xC2B2AE35)
    u = u ^ (u >> 16)
    f = (u >> 9).astype(jnp.int32)  # top 23 bits -> [0, 2^23)
    return jnp.where(f == 0, jnp.int32(1), f)


def _pair_rows(m: VoxelHashMap, b):
    """Fetch the bucket-pair window per key as ONE fast row gather.

    An explicit lax.gather with slice_sizes=(2, BUCKET, 5) lowers to a
    slow per-index path (~us/row measured); instead the paired view
    concat(tab[:-1], tab[1:]) is materialized with one cheap sequential
    pass (2x table bytes, ~0.1 ms at 1<<21 slots) and then indexed with
    plain advanced indexing — the (row, 320 B) gather pattern the
    microbenchmark showed runs at ~10 ns/fetch. XLA CSEs the view across
    multiple windows in one jit.

    Returns (..., WINDOW, 5); b must be pre-clamped to <= B-2."""
    paired = jnp.concatenate([m.tab[:-1], m.tab[1:]], axis=1)
    return paired[b]


def _bucket_match(m: VoxelHashMap, keys):
    """Fetch each key's bucket-pair window and locate the key's slot.

    Returns (rows (..., WINDOW, 5), b_start (...,), lane (...,),
    found (...,)); absolute flat slot = b_start * BUCKET + lane."""
    B = m.tab.shape[0]
    b = jnp.minimum(_hash(keys, B), B - 2)
    rows = _pair_rows(m, b)
    want = _fingerprint(keys).astype(m.tab.dtype)
    match = rows[..., 0] == want[..., None]
    found = jnp.any(match, axis=-1)
    lane = jnp.argmax(match, axis=-1).astype(jnp.int32)
    return rows, b, lane, found


def lookup(m: VoxelHashMap, keys):
    """Find the flat slot holding each key. Returns (slot (...,),
    found (...,)) with slot == 0 when not found (mask with `found`)."""
    _, b, lane, found = _bucket_match(m, keys)
    slot = b * BUCKET + lane
    return jnp.where(found, slot, 0), found


def insert(m: VoxelHashMap, pts, covs, mask, rounds: int = INSERT_ROUNDS) -> VoxelHashMap:
    """Insert a batch of world-frame points with stored covariances.

    Policy: a voxel keeps the lowest-covariance point offered to it
    (ikd_Tree.cpp:504-522). Candidates whose bucket cannot take them
    within `rounds` passes (or whose bucket is full) are dropped
    (overflow) and counted in `n_dropped`."""
    Brows = m.tab.shape[0]
    T = Brows * BUCKET
    N = pts.shape[0]
    dtype = m.tab.dtype
    keys = voxel_key(m, pts)
    want_i = _fingerprint(keys)
    wantf = want_i.astype(dtype)
    b = jnp.minimum(_hash(keys, Brows), Brows - 2)
    cand_rec = jnp.concatenate(
        [wantf[:, None], pts.astype(dtype), covs.astype(dtype)[:, None]], -1
    )  # (N, 5)
    cand_id = jnp.arange(N, dtype=jnp.int32)
    pending = mask
    # per-candidate lane rotation: same-window candidates prefer
    # different empty lanes, so a batch of distinct keys resolves in the
    # 2-round claim budget instead of serializing on lane 0
    pref = want_i & jnp.int32(WINDOW - 1)
    order = (jnp.arange(WINDOW, dtype=jnp.int32)[None, :] + pref[:, None]) % WINDOW

    def round_body(_, carry):
        m, pending = carry
        # dead scatter lanes target the padded dump row T (in-bounds);
        # mode="drop" with out-of-range targets triggered a sort-based
        # scatter expander on the TPU whose scratch blew the kernel's
        # scoped vmem at 1<<21 slots
        flat = jnp.concatenate(
            [m.tab.reshape(T, 5), jnp.zeros((1, 5), dtype)], axis=0
        )
        rows = _pair_rows(m, b)  # (N, WINDOW, 5)
        fps = rows[..., 0]
        match = fps == wantf[:, None]
        found = jnp.any(match, axis=-1)
        lane = jnp.argmax(match, axis=-1).astype(jnp.int32)
        slot = b * BUCKET + lane

        # 1. match-first: update existing cells by scatter-min on covariance
        upd = pending & found
        upd_slot = jnp.where(upd, slot, T)
        cov_pad = jnp.where(upd, covs, jnp.inf).astype(dtype)
        cell_min = jnp.full((T + 1,), jnp.inf, dtype).at[upd_slot].min(cov_pad)
        improves = upd & (cov_pad <= cell_min[slot]) & (cov_pad < flat[slot, 4])
        # resolve exact ties deterministically by candidate id
        tie_id = (
            jnp.full((T + 1,), N, jnp.int32)
            .at[jnp.where(improves, slot, T)]
            .min(cand_id)
        )
        winner = improves & (tie_id[slot] == cand_id)
        w_slot = jnp.where(winner, slot, T)
        flat = flat.at[w_slot].set(cand_rec)
        pending = pending & ~found  # matched candidates are done (win or lose)

        # 2. claim an empty lane in the pair window (rotation-first) for
        #    still-pending candidates; scatter-min candidate id resolves
        #    races
        empty_rot = jnp.take_along_axis(fps == 0, order, axis=-1)
        has_empty = jnp.any(empty_rot, axis=-1)
        lane_pick = jnp.take_along_axis(
            order, jnp.argmax(empty_rot, axis=-1)[:, None], axis=-1
        )[:, 0]
        tgt = b * BUCKET + lane_pick
        claim = pending & has_empty
        c_slot = jnp.where(claim, tgt, T)
        claim_id = jnp.full((T + 1,), N, jnp.int32).at[c_slot].min(cand_id)
        winner = claim & (claim_id[tgt] == cand_id)
        w_slot = jnp.where(winner, tgt, T)
        flat = flat.at[w_slot].set(cand_rec)
        pending = pending & ~winner
        return m._replace(tab=flat[:T].reshape(Brows, BUCKET, 5)), pending

    m, pending = jax.lax.fori_loop(0, rounds, round_body, (m, pending))
    return m._replace(n_dropped=m.n_dropped + jnp.sum(pending).astype(jnp.int32))


def evict_outside(m: VoxelHashMap, box_min, box_max) -> VoxelHashMap:
    """Free all cells whose point lies outside [box_min, box_max] — the
    sliding-local-map eviction (laserMapping.cpp:171-224)."""
    flat = m.flat
    inside = jnp.all((flat[:, 1:4] >= box_min) & (flat[:, 1:4] <= box_max), -1)
    keep = (flat[:, 0] != 0) & inside
    flat = flat.at[:, 0].set(jnp.where(keep, flat[:, 0], 0.0))
    flat = flat.at[:, 4].set(jnp.where(keep, flat[:, 4], jnp.inf))
    return m._replace(tab=flat.reshape(m.tab.shape))


def transform(m: VoxelHashMap, dq, dt) -> VoxelHashMap:
    """Rigidly transform every stored point by the world-frame correction
    p' = R(dq) p + dt and re-hash into a fresh table (used when a pose-graph
    loop closure re-anchors the world frame; the reference has no analog —
    its map is never corrected after insert, laserMapping.cpp:398-446).

    Stored covariances ride along unchanged (`normal_y` is a scalar
    quality, not frame-dependent). Points that collide into one voxel
    after the transform resolve by the usual lowest-covariance policy;
    unresolvable collisions count into `n_dropped`."""
    from ..geometry import so3

    fresh = create(m.capacity, 1.0, m.tab.dtype)._replace(
        voxel_size=m.voxel_size, n_dropped=m.n_dropped
    )
    pts = so3.quat_rotate(dq[None], m.points) + dt
    covs = jnp.where(m.occupied, m.covs, jnp.inf)
    # a whole-map rehash offers every record at once: the incremental
    # 2-round claim budget (losers re-offer next scan) does not apply —
    # resolve collision chains fully so the rehash is lossless
    return insert(fresh, pts, covs, m.occupied, rounds=WINDOW)


def size(m: VoxelHashMap):
    return jnp.sum(m.occupied)


def flatten(m: VoxelHashMap):
    """Live map contents as flat arrays: (pts (T,3), covs (T,), occ (T,)).

    The ikd-tree `flatten` analog (ikd_Tree.h:330, used to dump the map
    for visualization at laserMapping.cpp:1016-1022); here the map is
    already flat, so this is just the (points, covariances, occupancy)
    view — mask with `occ` or compact on the host with extract_points."""
    return m.points, m.covs, m.occupied


def extract_points(m: VoxelHashMap):
    """Host-side compaction of flatten(): (pts (n,3), covs (n,)) ndarrays
    holding only the occupied cells — the input for a map PCD dump."""
    occ = np.asarray(m.occupied)
    return np.asarray(m.points)[occ], np.asarray(m.covs)[occ]


def _masked_take(m: VoxelHashMap, mask, max_results: int):
    """Compact up to max_results masked slots into fixed-shape arrays.
    Returns (pts (K,3), covs (K,), valid (K,), total) where `total` is the
    full match count (may exceed K — the caller sized the budget)."""
    T = m.capacity
    idx = jnp.nonzero(mask, size=max_results, fill_value=T - 1)[0]
    valid = jnp.arange(max_results) < jnp.sum(mask)
    return (
        m.points[idx],
        m.covs[idx],
        valid,
        jnp.sum(mask).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("max_results",))
def box_search(m: VoxelHashMap, box_min, box_max, max_results: int = 1024):
    """All stored points inside an axis-aligned box — the ikd-tree
    Box_Search analog (ikd_Tree.h:327, Search_by_range). Fixed-shape:
    up to max_results points plus the true match count.

    Cost is one masked pass over the table (the same shape as
    evict_outside); this is an occasional-use API, not the hot path."""
    inside = jnp.all((m.points >= box_min) & (m.points <= box_max), axis=-1)
    return _masked_take(m, m.occupied & inside, max_results)


@functools.partial(jax.jit, static_argnames=("max_results",))
def radius_search(m: VoxelHashMap, center, radius, max_results: int = 1024):
    """All stored points within `radius` of `center` — the ikd-tree
    Radius_Search analog (ikd_Tree.h:329, Search_by_radius)."""
    d2 = jnp.sum((m.points - center) ** 2, axis=-1)
    return _masked_take(m, m.occupied & (d2 <= radius * radius), max_results)


def _cube_offsets(radius: int) -> np.ndarray:
    d = np.arange(-radius, radius + 1)
    return np.stack(np.meshgrid(d, d, d, indexing="ij"), -1).reshape(-1, 3)


def _ball_offsets(radius: int) -> np.ndarray:
    """Cells whose minimum distance to the query cell is <= radius voxels.

    A point in the query cell and a point in cell offset o are at least
    max(|o|-1, 0) voxels apart per axis, so cube corners beyond the
    Euclidean reach are provably irrelevant and pruned statically (~32%
    of the (2r+1)^3 cube at r=5) — the array-program analog of the
    ikd-tree's bounding-box pruning (ikd_Tree.cpp:1073-1255)."""
    offs = _cube_offsets(radius)
    gap = np.maximum(np.abs(offs) - 1, 0)
    return offs[(gap * gap).sum(-1) <= radius * radius]


# far sentinel voxel offset used to pad the offset list to a chunk
# multiple: its cells are real buckets, but a candidate can only surface
# there through a fingerprint collision (~2^-23) AND by out-ranking true
# neighbors on distance — the same benign far-collision case as always.
_PAD_OFF = (1 << 20, 1 << 20, 1 << 20)
_WINDOW_CHUNK = 64  # cells per scanned chunk; caps live candidate bytes


def _window_candidates(m: VoxelHashMap, queries, offs):
    """Candidate (pts, covs, d2) for one static offset chunk."""
    qkeys = voxel_key(m, queries)  # (Q, 3)
    nkeys = qkeys[:, None, :] + offs[None, :, :]  # (Q, V, 3)
    rows, _, lane, found = _bucket_match(m, nkeys)  # (Q, V, WINDOW, 5)
    cand = jnp.take_along_axis(rows, lane[..., None, None], axis=-2)[..., 0, :]
    cand_pts = cand[..., 1:4]
    cand_cov = cand[..., 4]
    diff = cand_pts - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    d2 = jnp.where(found, d2, big)
    return cand_pts, cand_cov, d2


def _knn_window(m: VoxelHashMap, queries, k: int, offs: np.ndarray):
    """k nearest stored points over a static voxel-offset window.

    Cost shape: ONE fused bucket-row gather (40 contiguous floats) per
    visited cell; fingerprint lane-compare, candidate select, and the
    distance top-k are in-register VPU work. Wide windows are processed
    in _WINDOW_CHUNK-cell pieces with a running top-k merge: the
    (Q, V, WINDOW, 5) candidate tensor at V ~ 900 cells is ~300 MB and
    overflows the TPU kernel's scoped vmem if materialized whole."""
    offs = np.asarray(offs)
    V = offs.shape[0]
    big = None

    def finish(cand_pts, cand_cov, d2):
        bigv = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
        neg_top, idx = jax.lax.top_k(-d2, k)
        nn_d2 = -neg_top
        nn_pts = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
        nn_covs = jnp.take_along_axis(cand_cov, idx, axis=1)
        nn_cnt = jnp.sum(nn_d2 < bigv, axis=-1)
        return nn_pts, nn_covs, nn_d2, nn_cnt

    if V <= _WINDOW_CHUNK:
        return finish(*_window_candidates(m, queries, jnp.asarray(offs, jnp.int32)))

    nchunks = -(-V // _WINDOW_CHUNK)
    pad = nchunks * _WINDOW_CHUNK - V
    offs_p = np.concatenate([offs, np.tile(_PAD_OFF, (pad, 1))]).astype(np.int32)
    offs_c = jnp.asarray(offs_p.reshape(nchunks, _WINDOW_CHUNK, 3))

    Q = queries.shape[0]
    dtype = m.tab.dtype
    bigv = jnp.asarray(jnp.finfo(dtype).max, dtype)
    init = (
        jnp.zeros((Q, k, 3), dtype),
        jnp.zeros((Q, k), dtype),
        jnp.full((Q, k), bigv, dtype),
    )

    def body(carry, oc):
        b_pts, b_covs, b_d2 = carry
        c_pts, c_covs, c_d2 = _window_candidates(m, queries, oc)
        all_pts = jnp.concatenate([b_pts, c_pts], axis=1)
        all_covs = jnp.concatenate([b_covs, c_covs], axis=1)
        all_d2 = jnp.concatenate([b_d2, c_d2], axis=1)
        neg_top, idx = jax.lax.top_k(-all_d2, k)
        return (
            jnp.take_along_axis(all_pts, idx[..., None], axis=1),
            jnp.take_along_axis(all_covs, idx, axis=1),
            -neg_top,
        ), None

    (b_pts, b_covs, b_d2), _ = jax.lax.scan(body, init, offs_c)
    nn_cnt = jnp.sum(b_d2 < bigv, axis=-1)
    return b_pts, b_covs, b_d2, nn_cnt


@functools.partial(
    jax.jit,
    static_argnames=("k", "radius", "wide_radius", "wide_budget", "accept_k"),
)
def knn(
    m: VoxelHashMap,
    queries,
    k: int = NUM_MATCH_POINTS,
    radius: int = 1,
    wide_radius: int = 0,
    wide_budget: int = 0,
    qmask=None,
    accept_d2=5.0,
    accept_k: int | None = None,
):
    """Batched k-NN over the voxel neighborhood, with optional escalation.

    queries: (Q, 3) world points. Returns:
      nn_pts  (Q, k, 3), nn_covs (Q, k), nn_d2 (Q, k)  sorted ascending,
      nn_cnt  (Q,) number of real neighbors found (<= k).

    Replaces ikd-tree Nearest_Search (ikd_Tree.cpp:1073-1255); the caller
    applies the reference's acceptance rule (found >= 5 and 5th dist^2 <=
    accept_d2 = 5, laserMapping.cpp:587).

    Reach semantics: the base (2*radius+1)^3 window sees ~1 voxel around
    the query, but the reference's exact tree search reaches to
    sqrt(accept_d2) ~ 2.24 m globally. With wide_radius > radius and
    wide_budget > 0, up to wide_budget queries that FAIL the acceptance
    rule under the base window (< accept_k found, or accept_k-th d2 >
    accept_d2) are re-searched over the statically ball-pruned wide
    window — one extra fixed-shape gather pass over the few misses
    instead of a 125x cost on every query. Choose wide_radius >=
    ceil(sqrt(accept_d2)/voxel_size) (5 at the City 0.5 m voxel): every
    cell that can hold a point within the acceptance ball is then
    visited, so escalated queries get their EXACT nearest neighbors
    whenever the reference would accept them. Escalations beyond
    wide_budget keep the base-window result (graceful degradation; size
    the budget for the sparse-scene worst case). qmask masks queries
    (padded lanes) out of the escalation budget.
    """
    nn_pts, nn_covs, nn_d2, nn_cnt = _knn_window(
        m, queries, k, _cube_offsets(radius)
    )
    if wide_budget <= 0 or wide_radius <= radius:
        return nn_pts, nn_covs, nn_d2, nn_cnt

    Q = queries.shape[0]
    accept_d2 = jnp.asarray(accept_d2, nn_d2.dtype)
    # acceptance may be judged on fewer than k neighbors (k > accept_k
    # returns extra candidates for the caller's re-rank cache while the
    # escalation trigger stays the reference's 5-NN rule)
    ak = accept_k if accept_k is not None else k

    def escalate(res, offs, budget):
        """Re-search acceptance-rule failures over a wider static window
        and splice the results back; dead lanes scatter to row Q, which
        mode="drop" discards. Every escalation window is a superset of
        the previous one, so its rows replace outright."""
        pts, covs, d2, cnt = res
        need = ~((cnt >= ak) & (d2[:, ak - 1] <= accept_d2))
        if qmask is not None:
            need = need & qmask
        idx = jnp.nonzero(need, size=budget, fill_value=Q)[0]
        live = idx < Q
        safe = jnp.minimum(idx, Q - 1)
        w = _knn_window(m, queries[safe], k, offs)
        tgt = jnp.where(live, safe, Q)
        return tuple(
            base.at[tgt].set(wide, mode="drop") for base, wide in zip(res, w)
        )

    res = (nn_pts, nn_covs, nn_d2, nn_cnt)
    # single stage: a cheaper intermediate window cannot FINALIZE a query
    # without breaking the exactness contract (an escalated query must see
    # the full sqrt(accept_d2) ball, tests/test_map.py tunnel recall), and
    # with fixed shapes a non-finalizing stage saves nothing — the final
    # window still pays its full static budget.
    return escalate(res, _ball_offsets(wide_radius), wide_budget)
