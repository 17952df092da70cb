"""Point-to-plane measurement model with the three uncertainty weighting
laws — the TPU-native h_share_model (laserMapping.cpp:552-760).

The reference runs an OpenMP loop over points doing k-d tree queries and
5-point plane fits; here the whole model is one batched computation over a
padded (M,) point set: gather-based voxel-hash k-NN, closed-form weighted
plane LSQ, masked min/max normalizations, and a 3x3 eigen-solve for the
localization weight. All data-dependent selection is masking.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import so3
from . import state as st
from . import uncertainty as unc
from .filter.esekf import HShareResult
from .map import voxel_hash as vh

NUM_MATCH = vh.NUM_MATCH_POINTS  # 5
NN_REJECT_D2 = 5.0  # laserMapping.cpp:587
# candidate cache width: the gathering search keeps the CAND_K nearest map
# points per query; in-loop re-searches re-rank this cache against the
# updated pose instead of re-gathering (the pose moves mm-cm between IEKF
# iterations, so the new 5-NN is inside the old 16-NN except for
# vanishing boundary cases). This removes every gather from the IEKF loop
# — which also makes the vmapped batched path cheap (under vmap both
# lax.cond branches execute every iteration).
CAND_K = 16


class ScanData(NamedTuple):
    """Per-update-round constants for the measurement model."""

    pts_body: jnp.ndarray  # (M, 3) deskewed points, own LiDAR end-frame
    pt_lidar: jnp.ndarray  # (M,) int32 physical LiDAR index
    pt_epoch: jnp.ndarray  # (M,) int32 uncertainty epoch index
    pt_mask: jnp.ndarray  # (M,) bool
    tc_q: jnp.ndarray  # (L, 4) temporal comp rotation (identity at base)
    tc_t: jnp.ndarray  # (L, 3)
    base: jnp.ndarray  # () int32: physical index of the base LiDAR
    unc_q: jnp.ndarray  # (L, E, 4) per-epoch pose uncertainty chain
    unc_t: jnp.ndarray  # (L, E, 3)
    unc_cov: jnp.ndarray  # (L, E, 6, 6)
    epoch_count: jnp.ndarray  # (L,) int32 valid epochs per LiDAR


class HShareCache(NamedTuple):
    """Per-round state that survives IEKF iterations. Plane parameters are
    cached at search time because they depend only on the map neighbors
    (the reference re-fits them every iteration with identical inputs —
    hoisting is value-identical, laserMapping.cpp:596). The cand_* fields
    hold the CAND_K-nearest candidate cache filled by the single gathering
    search (make_h_share); re-searches re-rank it."""

    normal: jnp.ndarray  # (M, 3) plane normals (world frame)
    d: jnp.ndarray  # (M,) plane offsets
    plane_cov: jnp.ndarray  # (M,) plane quality values
    plane_valid: jnp.ndarray  # (M,) bool
    searched: jnp.ndarray  # (M,) bool: NN pass result
    selected: jnp.ndarray  # (M,) bool: final effective mask
    normal_y: jnp.ndarray  # (M,) per-point covariance for map insertion
    nn_pts: jnp.ndarray  # (M, k, 3) last-search neighbors (map_incremental)
    nn_cnt: jnp.ndarray  # (M,) int32 neighbors found
    cand_pts: jnp.ndarray  # (M, CAND_K, 3) candidate cache (world frame)
    cand_covs: jnp.ndarray  # (M, CAND_K)
    cand_valid: jnp.ndarray  # (M, CAND_K) bool
    n_miss: jnp.ndarray  # () int32 acceptance-rule misses of the round's
    # gathering search (the wide-escalation demand signal, voxel_hash.knn)
    w_loc: jnp.ndarray  # () last iteration's localization weight
    # (laserMapping.cpp:744-759); < 1 marks degenerate geometry (tunnel)


def init_cache(M: int, dtype=jnp.float32, cand_k: int = CAND_K) -> HShareCache:
    return HShareCache(
        normal=jnp.zeros((M, 3), dtype),
        d=jnp.zeros((M,), dtype),
        plane_cov=jnp.zeros((M,), dtype),
        plane_valid=jnp.zeros((M,), bool),
        searched=jnp.zeros((M,), bool),
        selected=jnp.zeros((M,), bool),
        normal_y=jnp.zeros((M,), dtype),
        nn_pts=jnp.zeros((M, NUM_MATCH, 3), dtype),
        nn_cnt=jnp.zeros((M,), jnp.int32),
        cand_pts=jnp.zeros((M, cand_k, 3), dtype),
        cand_covs=jnp.zeros((M, cand_k), dtype),
        cand_valid=jnp.zeros((M, cand_k), bool),
        n_miss=jnp.zeros((), jnp.int32),
        w_loc=jnp.ones((), dtype),
    )


def _esti_plane(nn_pts, nn_covs, plane_th, cov_threshold):
    """Weighted plane fit over 5 neighbors (common_lib.h:144-190).

    Solves the LSQ system A n = -1 (the weights only shape the plane quality
    value, matching the reference, which builds W but solves unweighted).
    Returns (normal (3,), d (), plane_valid (), plane_cov ()).

    Numerics: the reference QR-solves on absolute world coordinates
    (colPivHouseholderQr, common_lib.h:175); normal equations on raw
    coordinates square the conditioning (kappa ~ |position|^2 / spread^2 —
    catastrophic at range in f32). Centering first and folding the mean
    back via Sherman-Morrison computes the SAME least-squares solution
    from a well-conditioned 3x3 system:
      (Gc + k c c^T) v = -k c  =>  v = -k y / (1 + k c^T y),  y = Gc^-1 c
    with Gc = (A-c)^T (A-c) and k = #points; 1 + k c^T y >= 1 since Gc is
    SPD, so the rescale never blows up."""
    A = nn_pts  # (5, 3)
    k_pts = jnp.asarray(A.shape[0], A.dtype)
    c = jnp.mean(A, axis=0)
    B = A - c
    G = B.T @ B
    # scale-free regularization keeps degenerate (collinear) fits finite
    G = G + (1e-12 * (jnp.trace(G) + 1.0)) * jnp.eye(3, dtype=A.dtype)
    c0 = jnp.cross(G[1], G[2])
    c1 = jnp.cross(G[2], G[0])
    c2 = jnp.cross(G[0], G[1])
    det = jnp.dot(G[0], c0)
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    y = inv_det * jnp.stack([jnp.dot(c0, c), jnp.dot(c1, c), jnp.dot(c2, c)])
    n = -(k_pts * y) / (1.0 + k_pts * jnp.dot(c, y))
    norm = jnp.linalg.norm(n)
    safe = jnp.maximum(norm, 1e-12)
    normal = n / safe
    d = 1.0 / safe
    resid = A @ normal + d
    plane_valid = jnp.all(jnp.abs(resid) <= plane_th) & (norm > 1e-9)

    w = nn_covs
    cov_sum = jnp.sum(jnp.abs(cov_threshold - w))
    frac = (cov_threshold - w) / jnp.maximum(cov_sum, 1e-20)
    plane_cov = jnp.where(
        w[0] > 1e-5, jnp.sum(frac * frac * w), 0.0
    )  # common_lib.h:167-173
    return normal, d, plane_valid, plane_cov


def _world_points(x: st.State, data: ScanData):
    """Deskewed points -> world frame at state x: non-base points through
    the temporal compensation into the base LiDAR frame, then IMU, then
    world (laserMapping.cpp:563-572 + pointBodyToWorld)."""
    p = data.pts_body
    pl = data.pt_lidar
    base = data.base
    bq = x.ext_r[base]
    bt = x.ext_t[base]
    is_base = pl == base
    p_nb = so3.quat_rotate_inv(
        bq[None],
        so3.quat_rotate(data.tc_q[pl], so3.quat_rotate(x.ext_r[pl], p) + x.ext_t[pl])
        + data.tc_t[pl]
        - bt[None],
    )
    p_base = jnp.where(is_base[:, None], p, p_nb)
    p_imu = so3.quat_rotate(bq[None], p_base) + bt[None]
    p_world = so3.quat_rotate(x.rot[None], p_imu) + x.pos[None]
    return p_base, p_imu, p_world


def _rank_and_fit(cfg, cand_pts, cand_covs, cand_valid, pt_mask, p_world, dtype):
    """Top-NUM_MATCH neighbors + plane fits from the candidate cache at the
    CURRENT pose — the re-search body. Gather-free: pure VPU ranking over
    the cached CAND_K candidates."""
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    d2 = jnp.sum((cand_pts - p_world[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_valid, d2, big)
    nn_d2, idx = vh.topk_min(d2, NUM_MATCH)
    # select by one-hot contraction, not take_along_axis: a (M, 5)-lane
    # gather costs ~1-3 ms/occurrence on the v5e while the (M, 5, CAND_K)
    # one-hot einsum is ~4 MFLOP of fused VPU/MXU work
    sel = (idx[..., None] == jnp.arange(cand_pts.shape[1])).astype(dtype)
    nn_pts = jnp.einsum("mkc,mcd->mkd", sel, cand_pts)
    nn_covs = jnp.einsum("mkc,mc->mk", sel, cand_covs)
    nn_cnt = jnp.sum(nn_d2 < big, axis=-1).astype(jnp.int32)
    searched = (
        pt_mask
        & (nn_cnt >= NUM_MATCH)
        & (nn_d2[:, NUM_MATCH - 1] <= NN_REJECT_D2)
    )
    # absent neighbors carry stored cov +inf -> zero them (see the search
    # docstring in make_h_share)
    nn_covs = jnp.where(
        jnp.arange(NUM_MATCH)[None, :] < nn_cnt[:, None], nn_covs, 0.0
    )
    normal, d, plane_valid, plane_cov = jax.vmap(
        _esti_plane, in_axes=(0, 0, None, None)
    )(
        nn_pts,
        nn_covs,
        jnp.asarray(cfg.plane_th, dtype),
        jnp.asarray(cfg.cov_threshold, dtype),
    )
    return (normal, d, plane_valid, plane_cov, searched, nn_pts, nn_cnt)


def make_h_share(cfg, map_state: vh.VoxelHashMap, data: ScanData, x0: st.State):
    """Build the HShareFn closure for one fusion round, plus the initial
    cache holding the ONE gathering correspondence search of the round.

    Round-constant quantities (per-point uncertainty traces; the k-NN
    candidate cache, gathered at the propagated state x0) are computed
    here, outside the IEKF loop. In-loop re-searches re-rank the cached
    CAND_K candidates against the updated pose — gather-free, so the
    loop's cost no longer depends on how often the reference re-searches
    (and the vmapped batched path stops paying gathers every iteration).
    Divergence from the reference's exact per-iteration tree re-search is
    bounded by the candidate cache (new 5-NN outside the old 16-NN) and
    measured by the chained oracle (tests/test_chained_oracle.py)."""
    L = data.tc_q.shape[0]
    act = 6 * (L + 1)
    dtype = data.pts_body.dtype
    M = data.pts_body.shape[0]
    p = data.pts_body
    pl = data.pt_lidar

    # --- hoisted: per-point measurement uncertainty (laserMapping.cpp:697,
    # 740) — inputs never change across iterations. The q/t/cov epoch
    # tables are packed into ONE (L, E, 43) row table so each epoch
    # selection is a single contiguous 172 B row gather instead of three
    # (the v5e fetches a row of up to ~320 B at the same cost as 4 B) ---
    E = data.unc_q.shape[1]
    ucat = jnp.concatenate(
        [
            data.unc_q,
            data.unc_t,
            data.unc_cov.reshape(data.unc_q.shape[0], E, 36),
        ],
        axis=-1,
    )  # (L, E, 43)

    def _epoch_pose(e_idx):
        row = ucat[pl, e_idx]  # (M, 43)
        return unc.Pose(
            q=row[:, :4], t=row[:, 4:7], cov=row[:, 7:].reshape(-1, 6, 6)
        )

    cnt = data.epoch_count[pl]
    e_sel = jnp.where(data.pt_epoch >= cnt, cnt - 2, data.pt_epoch)
    e_sel = jnp.clip(e_sel, 0, E - 1)
    r_trace = unc.point_uncertainty_trace(p, _epoch_pose(e_sel))  # (M,)
    e_un = jnp.where(data.pt_epoch >= cnt - 1, cnt - 2, data.pt_epoch)
    e_un = jnp.clip(e_un, 0, E - 1)
    r_trace_un = unc.point_uncertainty_trace(p, _epoch_pose(e_un))

    # --- hoisted LiDAR-table selections: (M, L) one-hot contractions
    # replace per-iteration (M,)-lane gathers from tiny (L, .) tables,
    # and the temporal-comp rows are iteration constants ---
    onehotL = (pl[:, None] == jnp.arange(L)[None, :]).astype(dtype)  # (M, L)
    tcq_p = onehotL @ data.tc_q  # (M, 4)
    tct_p = onehotL @ data.tc_t  # (M, 3)

    # --- the round's single gathering search (at x0) ---
    _, _, p_world0 = _world_points(x0, data)
    use_pallas = cfg.pallas_knn
    if use_pallas is None:  # auto: fused kernel on the TPU f32 path
        use_pallas = (
            jax.default_backend() == "tpu" and dtype == jnp.float32
        )
    (_, _, _, _, n_miss, cand_pts, c_covs, cand_valid) = vh.knn_cached(
        map_state,
        p_world0,
        radius=cfg.knn_radius,
        wide_radius=cfg.knn_wide_radius,
        wide_budget=cfg.knn_wide_budget,
        qmask=data.pt_mask,
        accept_d2=NN_REJECT_D2,
        accept_k=NUM_MATCH,
        cache_k=CAND_K,
        use_pallas=bool(use_pallas),
    )
    cand_covs = jnp.where(cand_valid, c_covs, 0.0)
    (normal0, d0, plane_valid0, plane_cov0, searched0, nn_pts0, nn_cnt0) = (
        _rank_and_fit(cfg, cand_pts, cand_covs, cand_valid, data.pt_mask, p_world0, dtype)
    )
    cache0 = HShareCache(
        normal=normal0,
        d=d0,
        plane_cov=plane_cov0,
        plane_valid=plane_valid0,
        searched=searched0,
        selected=searched0,
        normal_y=jnp.zeros((M,), dtype),
        nn_pts=nn_pts0,
        nn_cnt=nn_cnt0,
        cand_pts=cand_pts,
        cand_covs=cand_covs,
        cand_valid=cand_valid,
        n_miss=n_miss,
        w_loc=jnp.ones((), dtype),
    )

    def h_share(x: st.State, search: jnp.ndarray, cache: HShareCache):
        base = data.base
        bq = x.ext_r[base]
        bt = x.ext_t[base]
        is_base = pl == base

        ext_q_p = onehotL @ x.ext_r
        ext_t_p = onehotL @ x.ext_t
        tcq = tcq_p
        tct = tct_p

        # non-base points into the base LiDAR frame via temporal comp
        # (laserMapping.cpp:570-572)
        p_nb = so3.quat_rotate_inv(
            bq[None],
            so3.quat_rotate(tcq, so3.quat_rotate(ext_q_p, p) + ext_t_p)
            + tct
            - bt[None],
        )
        p_base = jnp.where(is_base[:, None], p, p_nb)
        p_imu = so3.quat_rotate(bq[None], p_base) + bt[None]
        p_world = so3.quat_rotate(x.rot[None], p_imu) + x.pos[None]

        # --- correspondence re-search (gated like dyn_share.converge):
        # re-ranks the candidate cache at the updated pose — gather-free,
        # so both-branch execution under vmap costs only VPU work ---
        def do_search(_):
            (normal, d, plane_valid, plane_cov, searched, nn_pts, nn_cnt) = (
                _rank_and_fit(
                    cfg, cache.cand_pts, cache.cand_covs, cache.cand_valid,
                    data.pt_mask, p_world, dtype,
                )
            )
            return (
                normal, d, plane_valid, plane_cov, searched, searched,
                nn_pts, nn_cnt,
            )

        def reuse(_):
            return (
                cache.normal,
                cache.d,
                cache.plane_valid,
                cache.plane_cov,
                cache.searched,
                cache.selected,
                cache.nn_pts,
                cache.nn_cnt,
            )

        (normal, d, plane_valid, plane_cov, searched, prev_sel, nn_pts,
         nn_cnt) = jax.lax.cond(search, do_search, reuse, None)
        selected = prev_sel
        pd2 = jnp.sum(normal * p_world, axis=-1) + d
        r_base = jnp.linalg.norm(p_base, axis=-1)
        score = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.maximum(r_base, 1e-9))
        selected = selected & plane_valid & (score > 0.1)
        eff = selected.astype(dtype)
        n_eff = jnp.sum(eff)
        valid = n_eff >= 1.0

        # --- plane weighting law (laserMapping.cpp:649-656) ---
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        pc_masked_max = jnp.max(jnp.where(selected, plane_cov, -big))
        pc_masked_min = jnp.min(jnp.where(selected, plane_cov, big))
        span = pc_masked_max - pc_masked_min
        norm01 = (plane_cov - pc_masked_min) / jnp.where(span > 0, span, 1.0)
        w_plane_lin = 1.0 / (
            (cfg.plane_cov_max - cfg.plane_cov_min) * norm01 + cfg.plane_cov_min
        )
        w_plane = jnp.where(
            plane_cov == 0.0,
            1.0,
            jnp.where(span > 0, w_plane_lin, (cfg.plane_cov_max + cfg.plane_cov_min) / 2.0),
        )

        # --- H rows (laserMapping.cpp:658-707) ---
        C = so3.quat_rotate_inv(x.rot[None], normal)  # (M, 3)
        A_col = jnp.einsum("mij,mj->mi", so3.hat(p_imu), C)
        # extrinsic Jacobians: base points use the base-frame point, others
        # use the raw own-frame point and temporal-comp-rotated C
        C_ext = jnp.where(
            is_base[:, None], C, so3.quat_rotate_inv(tcq, C)
        )
        p_for_B = jnp.where(is_base[:, None], p_base, p)
        eq = jnp.where(is_base[:, None], jnp.broadcast_to(bq, (M, 4)), ext_q_p)
        B_col = jnp.einsum(
            "mij,mj->mi", so3.hat(p_for_B), so3.quat_rotate_inv(eq, C_ext)
        )

        # scatter B at ext_r slot, C_ext at ext_t slot of the point's LiDAR
        slot = jnp.where(is_base, base, pl)
        onehot = (slot[:, None] == jnp.arange(L)[None, :]).astype(dtype)  # (M, L)
        H_ext_r = (onehot[:, :, None] * B_col[:, None, :]).reshape(M, 3 * L)
        H_ext_t = (onehot[:, :, None] * C_ext[:, None, :]).reshape(M, 3 * L)
        if not cfg.extrinsic_est_en:
            H_ext_r = jnp.zeros_like(H_ext_r)
            H_ext_t = jnp.zeros_like(H_ext_t)
        H = jnp.concatenate([normal, A_col, H_ext_r, H_ext_t], axis=-1)  # (M, act)

        # --- per-point measurement noise (hoisted traces) ---
        normal_y = jnp.where(selected, r_trace, r_trace_un)

        # --- point weighting law (laserMapping.cpp:710-722) ---
        r_max = jnp.max(jnp.where(selected, r_trace, -big))
        r_min = jnp.min(jnp.where(selected, r_trace, big))
        r_span = r_max - r_min
        lo = r_min + r_span * cfg.range_min
        hi = r_min + r_span * cfg.range_max
        lin = (cfg.point_cov_max - cfg.point_cov_min) * (r_trace - lo) / jnp.maximum(
            (cfg.range_max - cfg.range_min) * r_span, 1e-20
        ) + cfg.point_cov_min
        R_eff = jnp.where(
            r_trace < lo,
            cfg.point_cov_min,
            jnp.where(r_trace > hi, cfg.point_cov_max, lin),
        )

        # --- apply plane weights ---
        Hw = H * (w_plane * eff)[:, None]
        hw = (-pd2) * w_plane * eff

        # --- localization weight (laserMapping.cpp:744-759): sigma3/sigma1
        # of the weighted position columns ---
        Hp = Hw[:, :3]
        GtG = Hp.T @ Hp
        evals = jnp.linalg.eigvalsh(GtG)  # ascending
        sigma = jnp.sqrt(jnp.maximum(evals, 0.0))
        ratio = sigma[0] / jnp.maximum(sigma[2], 1e-20)
        w_loc = jnp.where(
            ratio > cfg.localize_thresh_max,
            cfg.localize_cov_max,
            jnp.where(
                ratio < cfg.localize_thresh_min,
                cfg.localize_cov_min,
                (cfg.localize_cov_max - cfg.localize_cov_min)
                * (ratio - cfg.localize_thresh_min)
                / (cfg.localize_thresh_max - cfg.localize_thresh_min)
                + cfg.localize_cov_min,
            ),
        )
        Hw = Hw * w_loc
        hw = hw * w_loc

        new_cache = HShareCache(
            normal=normal,
            d=d,
            plane_cov=plane_cov,
            plane_valid=plane_valid,
            searched=searched,
            selected=selected,
            normal_y=normal_y,
            nn_pts=nn_pts,
            nn_cnt=nn_cnt,
            cand_pts=cache.cand_pts,
            cand_covs=cache.cand_covs,
            cand_valid=cache.cand_valid,
            n_miss=cache.n_miss,
            w_loc=w_loc.astype(dtype),
        )
        res = HShareResult(valid=valid, h=hw, H=Hw, R=R_eff, mask=selected)
        return res, new_cache

    return h_share, cache0
