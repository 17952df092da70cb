"""The per-scan-group fusion step and its carry — the TPU-native main loop.

One jitted function `step(cfg, carry, group)` performs everything the
reference's main-loop body does for one synchronized multi-LiDAR round
(laserMapping.cpp:941-1078):

  undistort (IMU propagate + spline deskew + uncertainty chains)
  -> per-LiDAR voxel downsample
  -> sliding local-map box maintenance + eviction
  -> per-LiDAR/epoch pose-uncertainty composition
  -> iterated ESKF update with the three weighting laws
  -> map insertion with the lowest-covariance voxel policy

The carry is a pytree; sequences are processed by scanning `step` over
grouped measurements. IMU initialization and measure-group assembly are
host-side (see malio_tpu.io / malio_tpu.runner).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import state as st
from . import propagate as prop
from . import preprocess as pre
from . import measurement as meas
from . import uncertainty as unc
from .filter import esekf
from .geometry import so3
from .map import voxel_hash as vh


class LioCarry(NamedTuple):
    x: st.State
    P: jnp.ndarray  # (n, n)
    Q: jnp.ndarray  # (12, 12) process noise (from IMU init)
    hist: prop.History
    map: vh.VoxelHashMap
    last_in: jnp.ndarray  # (6,) [gyro, acc]
    last_imu: jnp.ndarray  # (7,) raw previous sample [t, gyro, acc]
    last_end_t: jnp.ndarray  # () relative seconds
    mean_acc_norm: jnp.ndarray  # ()
    box_min: jnp.ndarray  # (3,)
    box_max: jnp.ndarray  # (3,)
    box_init: jnp.ndarray  # () bool
    map_init: jnp.ndarray  # () bool
    step_count: jnp.ndarray  # () int32
    first_t: jnp.ndarray  # () first round's scan-begin (current time frame)
    Pi: jnp.ndarray  # (n, n) previous round's information-matrix inverse
    # (solve dtype) — warm-starts the next IEKF solve (esekf.update_iterated
    # Pi0; residual-gated, so a stale value only costs the fallback)


class StepOutput(NamedTuple):
    pos: jnp.ndarray  # (3,)
    quat: jnp.ndarray  # (4,) [w,x,y,z]
    pose_cov: jnp.ndarray  # (6,6) pose covariance, tangent order
    # [translation(0:3); rotation(3:6)]; the reference publishes the
    # rotation-first permutation of this block on /Odometry
    # (laserMapping.cpp:510-520) — see metrics.ros_pose_covariance
    end_time: jnp.ndarray  # () group end (relative)
    iterations: jnp.ndarray
    n_effective: jnp.ndarray
    map_size: jnp.ndarray
    map_load: jnp.ndarray  # () live load factor (size / capacity)
    map_dropped: jnp.ndarray  # () cumulative insert-overflow drops
    n_insert: jnp.ndarray  # points passing the covariance gate
    nn_miss: jnp.ndarray  # () int32 acceptance-rule misses of the round's
    # gathering search AFTER wide escalation (escalation-demand signal)
    med_normal_y: jnp.ndarray  # median stored covariance this round
    kf_pts: jnp.ndarray  # (M_DS, 3) base-LiDAR points in the IMU body frame
    kf_mask: jnp.ndarray  # (M_DS,)
    world_pts: jnp.ndarray  # (M, 3) registered (world) downsampled points
    world_mask: jnp.ndarray  # (M,)
    n_meas_dropped: jnp.ndarray  # () int32 live lanes dropped by the
    # measurement-lane compaction cap this round (0 when the cap is off
    # or not reached — every loss is counted)
    w_loc: jnp.ndarray  # () localization weight of the last IEKF
    # iteration (laserMapping.cpp:744-759); < 1 = degenerate geometry


def init_carry(cfg, x0: st.State, P0, Q, dtype=jnp.float32) -> LioCarry:
    n = P0.shape[0]
    sdtype = jnp.float64 if jax.config.jax_enable_x64 else dtype
    # The covariance is CARRIED in the solve dtype (f64 when available),
    # not the point dtype. Measured necessity (round-5 City01-length
    # soak): with P stored f32, ~6000 fusion rounds of the subtraction-
    # form posterior accumulate a numerically singular direction
    # (P_temp diagonal reaches ~2.5e19 after information-form assembly);
    # the solve then amplifies backend-level f64 rounding differences
    # into an O(1) gain error along the weakly observed bias subspace
    # and the filter detonates (bg jumped to -7.8 rad/s at round 6322).
    # f64 storage keeps the near-converged directions representable —
    # the same precision the reference's Eigen pipeline carries. The
    # extra cost is (n, n) f64 propagation per IMU step, noise next to
    # the (M, ·) point math which stays f32.
    P0 = P0.astype(sdtype)
    return LioCarry(
        Pi=jnp.zeros((n, n), sdtype),
        x=x0,
        P=P0,
        Q=Q.astype(dtype),
        hist=prop.empty_history(cfg.traj_capacity, dtype),
        map=vh.create(cfg.map_capacity, cfg.filter_size_map, dtype),
        last_in=jnp.zeros(6, dtype),
        last_imu=jnp.zeros(7, dtype),
        last_end_t=jnp.asarray(0.0, dtype),
        mean_acc_norm=jnp.asarray(cfg.gravity, dtype),
        box_min=jnp.zeros(3, dtype),
        box_max=jnp.zeros(3, dtype),
        box_init=jnp.asarray(False),
        map_init=jnp.asarray(False),
        step_count=jnp.asarray(0, jnp.int32),
        first_t=jnp.asarray(0.0, dtype),
    )


def _fov_segment(cfg, box_min, box_max, box_init, pos_lid):
    """Sliding local-map box update (lasermap_fov_segment,
    laserMapping.cpp:171-224). Returns (box_min, box_max, box_init, moved)."""
    dtype = pos_lid.dtype
    half = cfg.cube_len / 2.0
    fresh_min = pos_lid - half
    fresh_max = pos_lid + half
    thresh = cfg.mov_threshold * cfg.det_range

    d_lo = jnp.abs(pos_lid - box_min)
    d_hi = jnp.abs(pos_lid - box_max)
    near_lo = d_lo <= thresh
    near_hi = d_hi <= thresh
    need_move = jnp.any(near_lo | near_hi)
    mov_dist = jnp.asarray(
        max(
            (cfg.cube_len - 2.0 * cfg.mov_threshold * cfg.det_range) * 0.5 * 0.9,
            cfg.det_range * (cfg.mov_threshold - 1.0),
        ),
        dtype,
    )
    shift = jnp.where(near_lo, -mov_dist, jnp.where(near_hi, mov_dist, 0.0))
    moved_min = box_min + shift
    moved_max = box_max + shift

    new_min = jnp.where(box_init, jnp.where(need_move, moved_min, box_min), fresh_min)
    new_max = jnp.where(box_init, jnp.where(need_move, moved_max, box_max), fresh_max)
    moved = box_init & need_move
    return new_min, new_max, jnp.asarray(True), moved


def _points_to_world(x: st.State, pts, pt_lidar, base, tc_q, tc_t):
    """pointBodyToWorld with temporal compensation (laserMapping.cpp:134-147)."""
    eq = x.ext_r[pt_lidar]
    et = x.ext_t[pt_lidar]
    tcq = tc_q[pt_lidar]
    tct = tc_t[pt_lidar]
    in_imu = so3.quat_rotate(tcq, so3.quat_rotate(eq, pts) + et) + tct
    return so3.quat_rotate(x.rot[None], in_imu) + x.pos[None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def scan_steps(cfg, carry: LioCarry, groups: prop.MeasureGroup):
    """Run `step` over a time-stacked chunk of K measure groups (leaves have
    leading axis K) in ONE device dispatch via lax.scan.

    Per-round dispatch through the remote-TPU relay costs a host round-trip
    per fusion round; scanning a chunk amortizes it K-fold while compiling
    the loop body only once. Semantically identical to K sequential `step`
    calls (same carry threading)."""
    return jax.lax.scan(lambda c, g: step(cfg, c, g), carry, groups)


@functools.partial(jax.jit, static_argnames=("cfg",))
def step(cfg, carry: LioCarry, group: prop.MeasureGroup):
    L = cfg.num_lidars
    # point dtype: P is carried in the solve dtype (f64 on the flagship)
    dtype = carry.x.pos.dtype
    M_DS = cfg.max_points_per_scan
    M = L * M_DS

    # ---- undistortion + propagation ----
    und = prop.undistort(
        cfg,
        carry.x,
        carry.P,
        carry.hist,
        group,
        carry.Q,
        carry.last_in,
        carry.last_imu,
        carry.last_end_t,
        carry.mean_acc_norm,
    )

    # ---- per-LiDAR voxel downsample (laserMapping.cpp:968-983) ----
    def ds_one(pts, epoch, mask):
        out, aux, valid = pre.voxel_downsample(
            pts, epoch[:, None].astype(dtype), mask, cfg.filter_size_surf, M_DS
        )
        return out, jnp.round(aux[:, 0]).astype(jnp.int32), valid

    ds_pts, ds_epoch, ds_mask = jax.vmap(ds_one)(
        und.pts_deskewed, und.pt_epoch, group.pts_mask
    )
    flat_pts = ds_pts.reshape(M, 3)
    flat_epoch = ds_epoch.reshape(M)
    flat_mask = ds_mask.reshape(M)
    flat_lidar = jnp.repeat(jnp.arange(L, dtype=jnp.int32), M_DS)

    # ---- measurement-lane compaction (cfg.max_meas_points) ----
    # ~30% of flagship lanes are downsample padding; a stable sort pulls
    # live lanes to the front so every fixed-shape stage downstream
    # (k-NN, plane fits, H rows, insert) runs at the cap width instead
    # of M. Permutation only — no live point changes — except when live
    # lanes exceed the cap, which drops the overflow and COUNTS it.
    n_meas_dropped = jnp.asarray(0, jnp.int32)
    if cfg.max_meas_points is not None and cfg.max_meas_points < M:
        Mc = cfg.max_meas_points
        order = jnp.argsort(~flat_mask, stable=True)[:Mc]
        n_live = jnp.sum(flat_mask)
        n_meas_dropped = jnp.maximum(0, n_live - Mc).astype(jnp.int32)
        flat_pts = flat_pts[order]
        flat_epoch = flat_epoch[order]
        flat_mask = flat_mask[order]
        flat_lidar = flat_lidar[order]
        M = Mc

    # ---- local map box + eviction ----
    pos_lid = und.x.pos + so3.quat_rotate(und.x.rot, und.x.ext_t[und.base])
    box_min, box_max, box_init, moved = _fov_segment(
        cfg, carry.box_min, carry.box_max, carry.box_init, pos_lid
    )
    # eviction runs UNCONDITIONALLY with an infinite box when the local
    # map did not move: one masked full-table pass (~bandwidth cost)
    # instead of a lax.cond whose identity branch copies the whole table
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    e_min = jnp.where(moved, box_min, -big)
    e_max = jnp.where(moved, box_max, big)
    map_state = vh.evict_outside(carry.map, e_min, e_max)

    # ---- per-LiDAR/epoch pose uncertainty composition
    # (laserMapping.cpp:1027-1048) ----
    def ext_pose(l):
        return unc.Pose(
            q=und.x.ext_r[l], t=und.x.ext_t[l],
            cov=prop._ext_cov6(und.P, l, L).astype(dtype),
        )

    def compose(l, k):
        u = unc.Pose(und.unc_q[l, k], und.unc_t[l, k], und.unc_cov[l, k])
        e = ext_pose(l)
        b = ext_pose(und.base)
        a = unc.compound_pose(e, u)
        t = unc.compound_pose(
            unc.Pose(und.tc_q[l], und.tc_t[l], und.tc_cov[l]), a
        )
        c = unc.compound_inv_pose(b, t)
        is_base = l == und.base
        return jax.tree_util.tree_map(
            lambda comp, raw: jnp.where(is_base, raw, comp), c, u
        )

    E = cfg.epoch_capacity
    unc_comp = jax.vmap(
        jax.vmap(compose, in_axes=(None, 0)), in_axes=(0, None)
    )(jnp.arange(L), jnp.arange(E))

    scan_data = meas.ScanData(
        pts_body=flat_pts,
        pt_lidar=flat_lidar,
        pt_epoch=flat_epoch,
        pt_mask=flat_mask,
        tc_q=und.tc_q,
        tc_t=und.tc_t,
        base=und.base,
        unc_q=unc_comp.q,
        unc_t=unc_comp.t,
        unc_cov=unc_comp.cov,
        epoch_count=und.epoch_count,
    )

    # ---- iterated update (only once the map exists) ----
    # make_h_share performs the round's single gathering k-NN search (at
    # the propagated state) and returns the prefilled candidate cache;
    # the IEKF loop's re-searches re-rank it gather-free
    h_share, cache0 = meas.make_h_share(cfg, map_state, scan_data, und.x)

    def do_update(_):
        return esekf.update_iterated(
            und.x,
            und.P,
            h_share,
            cache0,
            max_iter=cfg.max_iteration,
            limit=cfg.converge_limit,
            search_on_converge=not cfg.single_search,
            Pi0=carry.Pi,
        )

    def skip_update(_):
        return esekf.IEKFResult(
            x=und.x,
            P=und.P,
            iterations=jnp.asarray(0, jnp.int32),
            valid=jnp.asarray(False),
            cache=cache0,
            Pi=carry.Pi,
        )

    upd = jax.lax.cond(carry.map_init, do_update, skip_update, None)

    # ---- map insertion (map_incremental, laserMapping.cpp:398-446) ----
    # first round: seed covariance 0.001 (laserMapping.cpp:1004)
    normal_y = jnp.where(
        carry.map_init, upd.cache.normal_y, jnp.full((M,), 0.001, dtype)
    )
    world_pts = _points_to_world(
        upd.x, flat_pts, flat_lidar, und.base, und.tc_q, und.tc_t
    )
    # flg_EKF_inited (laserMapping.cpp:989, INIT_TIME at :37): first
    # init_time seconds bypass the dedup prefilter. Times are rebased per
    # group, so the remembered first-scan time shifts with t_shift.
    first_t = jnp.where(
        carry.step_count == 0,
        jnp.min(group.beg_t),
        carry.first_t - group.t_shift,
    )
    ekf_inited = (jnp.min(group.beg_t) - first_t) >= cfg.init_time
    # need_add prefilter (laserMapping.cpp:411-438): against the update's
    # LAST search neighbors, drop a candidate whose voxel already holds a
    # neighbor closer to the voxel center — unless the nearest neighbor
    # lies outside the voxel in every axis (NoNeedDownsample).
    fs = cfg.filter_size_map
    mid = (jnp.floor(world_pts / fs) + 0.5) * fs
    dist_mid = jnp.sum((world_pts - mid) ** 2, axis=-1)
    nn = upd.cache.nn_pts  # (M, k, 3)
    k_valid = jnp.arange(nn.shape[1])[None, :] < upd.cache.nn_cnt[:, None]
    near0_far = jnp.all(jnp.abs(nn[:, 0] - mid) > 0.5 * fs, axis=-1)
    nn_d_mid = jnp.sum((nn - mid[:, None, :]) ** 2, axis=-1)
    # the reference's inner loop runs only with a full 5-neighbor set
    full_set = upd.cache.nn_cnt >= meas.NUM_MATCH
    nn_closer = jnp.any((nn_d_mid < dist_mid[:, None]) & k_valid, axis=-1) & full_set
    need_add = near0_far | ~nn_closer
    # gate ~ "!Nearest_Points[i].empty() && flg_EKF_inited"
    prefilter = jnp.where(
        (upd.cache.nn_cnt > 0) & ekf_inited & carry.map_init, need_add, True
    )
    ins_mask = flat_mask & (normal_y <= cfg.cov_threshold) & prefilter
    map_state = vh.insert(map_state, world_pts, normal_y, ins_mask)

    new_carry = LioCarry(
        x=upd.x,
        P=upd.P,
        Pi=upd.Pi,
        Q=carry.Q,
        hist=und.hist,
        map=map_state,
        last_in=und.last_in,
        last_imu=und.last_imu,
        last_end_t=jnp.max(group.end_t),
        mean_acc_norm=carry.mean_acc_norm,
        box_min=box_min,
        box_max=box_max,
        box_init=box_init,
        map_init=jnp.asarray(True),
        step_count=carry.step_count + 1,
        first_t=first_t,
    )
    out = StepOutput(
        pos=upd.x.pos,
        quat=upd.x.rot,
        pose_cov=upd.P[:6, :6],
        end_time=jnp.max(group.end_t),
        iterations=upd.iterations,
        n_effective=jnp.sum(upd.cache.selected),
        map_size=vh.size(map_state),
        map_load=vh.size(map_state).astype(dtype) / cfg.map_capacity,
        map_dropped=map_state.n_dropped,
        n_insert=jnp.sum(ins_mask),
        nn_miss=upd.cache.n_miss,
        med_normal_y=jnp.nanmedian(jnp.where(flat_mask, normal_y, jnp.nan)),
        kf_pts=so3.quat_rotate(upd.x.ext_r[und.base][None], ds_pts[und.base])
        + upd.x.ext_t[und.base][None],
        kf_mask=ds_mask[und.base],
        world_pts=world_pts,
        world_mask=flat_mask,
        n_meas_dropped=n_meas_dropped,
        w_loc=upd.cache.w_loc,
    )
    return new_carry, out


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_world_correction(cfg, carry: LioCarry, dq, dt):
    """Apply a world-frame rigid correction T' = dT ∘ T (from the
    pose-graph back-end after a loop closure) to the ENTIRE carry: state,
    covariance, IMU-rate pose history, map, and local-map box, so
    subsequent odometry continues from the graph-corrected pose. The
    reference has no analog — its trajectory is filter-only and the map
    is never corrected (laserMapping.cpp:1070-1071, :398-446).

    Consistency rules (right-perturbation tangents, state.boxplus):

      * rot tangent is right-sided (q ⊞ δ = q·Exp δ), so left-multiplying
        dq leaves rotation tangents unchanged (J_rot = I);
      * pos/vel tangents conjugate by R(dq);
      * gravity is a world vector: g' = R(dq)·g, with the S2 chart
        transport J_g = Nx(g') R(dq) Mx(g, 0) (S2.hpp chart maps);
      * extrinsics and IMU biases are body-frame (J = I);
      * map points re-hash through voxel_hash.transform; the local box is
        re-centered on the corrected pose and the map re-evicted so the
        map ⊆ box invariant holds.

    `step` is equivariant under this operation (away from the box edge):
    stepping the corrected carry equals correcting the stepped carry —
    tested in tests/test_posegraph.py.
    """
    from .geometry import s2

    dtype = carry.x.pos.dtype
    dq = so3.quat_normalize(dq.astype(dtype))
    dt = dt.astype(dtype)
    x = carry.x
    L = x.ext_r.shape[0]
    R = so3.quat_to_mat(dq)
    # pure rotation preserves |g| exactly — do NOT re-project onto the
    # default-length sphere (the filter's gravity norm tracks the measured
    # |mean_acc| scaling, IMU_Processing.hpp:318)
    g_new = so3.quat_rotate(dq, x.grav)
    x2 = dataclasses.replace(
        x,
        pos=so3.quat_rotate(dq, x.pos) + dt,
        rot=so3.quat_normalize(so3.quat_mul(dq, x.rot)),
        vel=so3.quat_rotate(dq, x.vel),
        grav=g_new,
    )

    n = carry.P.shape[0]
    J = jnp.eye(n, dtype=dtype)
    J = J.at[0:3, 0:3].set(R)
    ov = st.idx_vel(L)
    J = J.at[ov : ov + 3, ov : ov + 3].set(R)
    og = st.idx_grav(L)
    Jg = s2.s2_nx_yy(g_new) @ R @ s2.s2_mx(x.grav, jnp.zeros(2, dtype))
    J = J.at[og : og + 2, og : og + 2].set(Jg)
    P2 = J @ carry.P @ J.T

    h = carry.hist
    Rb = (
        jnp.zeros((6, 6), dtype)
        .at[:3, :3].set(R)
        .at[3:, 3:].set(jnp.eye(3, dtype=dtype))
    )
    h2 = h._replace(
        q=so3.quat_normalize(so3.quat_mul(dq[None], h.q)),
        p=so3.quat_rotate(dq[None], h.p) + dt,
        cov=jnp.einsum("ij,njk,lk->nil", Rb, h.cov, Rb),
    )

    half = jnp.asarray(cfg.cube_len / 2.0, dtype)
    box_min = x2.pos - half
    box_max = x2.pos + half
    map2 = vh.transform(carry.map, dq, dt)
    map2 = vh.evict_outside(map2, box_min, box_max)

    return carry._replace(
        x=x2,
        P=P2,
        hist=h2,
        map=map2,
        box_min=box_min,
        box_max=box_max,
        box_init=jnp.asarray(True),
        # the information matrix changed frame: drop the warm start (a
        # stale Pi would only fail the residual gate, but zeroing makes
        # the fallback deterministic)
        Pi=jnp.zeros_like(carry.Pi),
    )
