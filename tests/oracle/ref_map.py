"""NumPy transliteration of the ikd-tree BEHAVIOR SURFACE the reference
pipeline uses, plus map_incremental — the two pieces the chained oracle
needs (the round-2 oracles stopped at stage boundaries; the map was the
one redesigned-not-transliterated subsystem outside every parity test).

Transliterated routines (paths relative /root/reference/MA_LIO):

  * Nearest_Search (include/ikd-Tree/ikd_Tree.cpp:1073-1255): exact k-NN
    over all live points, ascending by squared distance — the recursive
    bounded-max-heap search is exact, so brute force IS the
    transliteration of its result surface;
  * Search_by_range (ikd_Tree.cpp:1257-1300): half-open box
    [vertex_min, vertex_max) membership (:1275-1279);
  * Add_Points with downsample_on (ikd_Tree.cpp:484-584): per-candidate
    voxel box search, winner selection preferring the LOWEST-covariance
    point when both contenders sit within sqrt(downsample_size/8) of the
    voxel center (the MA-LIO modification, :509-522; note calc_dist is a
    SQUARED distance, common_lib.h:77-81, so the /8 threshold compares
    d^2 against size/8 — transliterated verbatim, quirk included), else
    nearest-to-center; replace-all-then-add gated by
    (|storage| > 1 or winner == candidate) (:526-533);
  * Build (ikd_Tree.cpp; used at laserMapping.cpp:995-1010): stores the
    given points verbatim (no dedup at build time);
  * map_incremental (src/laserMapping.cpp:398-446): cov_threshold gate,
    NoNeedDownsample corner-voxel bypass, need_add prefilter against the
    last search's 5 neighbors vs the voxel center;
  * pointBodyToWorld (laserMapping.cpp:134-147): world transform with
    temporal compensation for non-base clouds;
  * pcl::VoxelGrid (used at laserMapping.cpp:968-983): centroid of every
    field per floor(x/leaf) voxel (downsample_all_data), output ordered
    by the sorted linear voxel index (x fastest).

Storage records are rows [x, y, z, normal_y]; only these fields drive
map behavior (normal_x / intensity ride along in the caller).
"""
import numpy as np

NUM_MATCH_POINTS = 5  # common_lib.h:22
EPSS = 1e-6  # ikd_Tree.h:13


def calc_dist(a, b):
    """SQUARED distance (common_lib.h:77-81 / ikd_Tree.cpp:1694)."""
    d = np.asarray(a, float)[:3] - np.asarray(b, float)[:3]
    return float(d @ d)


def same_point(a, b):
    """ikd_Tree.cpp:1688-1691."""
    return bool(np.all(np.abs(np.asarray(a)[:3] - np.asarray(b)[:3]) < EPSS))


class RefMap:
    """Exact stand-in for KD_TREE<PointType> as the pipeline consumes it."""

    def __init__(self, downsample_size):
        self.recs = np.zeros((0, 4), float)
        self.downsample_size = float(downsample_size)

    def size(self):
        return len(self.recs)

    def build(self, recs):
        """ikdtree.Build: store all given records (laserMapping.cpp:1010)."""
        self.recs = np.asarray(recs, float).copy()

    def nearest_search(self, q, k=NUM_MATCH_POINTS):
        """Exact k-NN, ascending d2. Returns (records (n,4) copies, d2 (n,))."""
        if not len(self.recs):
            return np.zeros((0, 4)), np.zeros(0)
        d2 = np.sum((self.recs[:, :3] - np.asarray(q, float)[None, :3]) ** 2, 1)
        order = np.argsort(d2, kind="stable")[:k]
        return self.recs[order].copy(), d2[order]

    def _box_indices(self, vmin, vmax):
        """Search_by_range membership: min <= x < max (ikd_Tree.cpp:1275)."""
        m = np.all(
            (self.recs[:, :3] >= vmin[None]) & (self.recs[:, :3] < vmax[None]), 1
        )
        return np.nonzero(m)[0]

    def delete_by_range(self, vmin, vmax):
        idx = self._box_indices(np.asarray(vmin, float), np.asarray(vmax, float))
        self.recs = np.delete(self.recs, idx, axis=0)
        return len(idx)

    def add_points(self, recs, downsample_on):
        """ikd_Tree.cpp:484-584 (sequential, in caller order)."""
        ds = self.downsample_size
        cnt = 0
        for rec in recs:
            rec = np.asarray(rec, float)
            if downsample_on:
                vmin = np.floor(rec[:3] / ds) * ds
                vmax = vmin + ds
                mid = vmin + ds / 2.0
                idx = self._box_indices(vmin, vmax)
                storage = self.recs[idx]
                min_dist = calc_dist(rec, mid)
                min_cov = rec[3]
                result = rec.copy()
                for s in storage:
                    tmp = calc_dist(s, mid)
                    # quirk transliterated: squared distances compared
                    # against downsample_size/8 (ikd_Tree.cpp:511)
                    if tmp < ds / 8 and min_dist < ds / 8:
                        if s[3] < min_cov:
                            min_dist = tmp
                            min_cov = s[3]
                            result = s.copy()
                    elif tmp < min_dist:
                        min_dist = tmp
                        min_cov = s[3]
                        result = s.copy()
                if len(storage) > 1 or same_point(rec, result):
                    if len(storage) > 0:
                        self.recs = np.delete(self.recs, idx, axis=0)
                    self.recs = np.vstack([self.recs, result[None]])
                    cnt += 1
            else:
                self.recs = np.vstack([self.recs, rec[None]])
        return cnt


def map_incremental(
    m: RefMap, world_recs, nearest_points, flg_EKF_inited, cov_threshold, fs
):
    """laserMapping.cpp:398-446. world_recs (N,4) are the posterior-state
    world points with their h_share-assigned normal_y; nearest_points[i]
    is the (n_i, 3) xyz of the round's LAST k-NN search (the reference's
    Nearest_Points global), or an empty array."""
    to_add, no_ds = [], []
    for i, rec in enumerate(world_recs):
        if rec[3] > cov_threshold:
            continue
        pn = nearest_points[i]
        if len(pn) and flg_EKF_inited:
            mid = np.floor(rec[:3] / fs) * fs + 0.5 * fs
            dist = calc_dist(rec, mid)
            if np.all(np.abs(pn[0][:3] - mid) > 0.5 * fs):
                no_ds.append(rec)
                continue
            need_add = True
            for j in range(NUM_MATCH_POINTS):
                if len(pn) < NUM_MATCH_POINTS:
                    break
                if calc_dist(pn[j], mid) < dist:
                    need_add = False
                    break
            if need_add:
                to_add.append(rec)
        else:
            to_add.append(rec)
    m.add_points(to_add, True)
    m.add_points(no_ds, False)
    return len(to_add) + len(no_ds)


def point_body_to_world(s, pt_body, lid_idx, temporal_comp):
    """laserMapping.cpp:134-147 (s = RefState; lid_idx sorted, 0 = base)."""

    def qrot(q, v):
        uv = 2.0 * np.cross(q[1:], v)
        return v + q[0] * uv + np.cross(q[1:], uv)

    p = np.asarray(pt_body, float)
    if lid_idx == 0:
        g = qrot(s.rot, qrot(s.ext_r[0], p) + s.ext_t[0]) + s.pos
    else:
        tc = temporal_comp[lid_idx - 1]
        g = (
            qrot(s.rot, qrot(tc.q, qrot(s.ext_r[lid_idx], p) + s.ext_t[lid_idx]) + tc.t)
            + s.pos
        )
    return g


def voxel_grid(arr, leaf):
    """pcl::VoxelGrid with downsample_all_data: per-voxel centroid of ALL
    columns (xyz in cols 0:3 drive the voxel key), rows ordered by the
    sorted linear voxel index. arr (N, C) -> (V, C)."""
    arr = np.asarray(arr, float)
    ijk = np.floor(arr[:, :3] / leaf).astype(np.int64)
    mn = ijk.min(0)
    div = ijk.max(0) - mn + 1
    lin = (
        (ijk[:, 0] - mn[0])
        + (ijk[:, 1] - mn[1]) * div[0]
        + (ijk[:, 2] - mn[2]) * div[0] * div[1]
    )
    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    arr_s = arr[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(lin_s))[0] + 1, [len(lin_s)]])
    out = np.stack(
        [arr_s[a:b].mean(0) for a, b in zip(starts[:-1], starts[1:])]
    ) if len(arr) else arr
    return out
