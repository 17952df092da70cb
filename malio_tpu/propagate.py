"""IMU processing: propagation, continuous-time deskew, epoch uncertainty.

Re-derivation of ImuProcess::UndistortPcl (IMU_Processing.hpp:210-523) as a
fixed-shape batched computation:

  1. trim the rolling IMU-rate pose history (0.2 s retention, drop entries
     newer than the group's first IMU sample — those were continuation
     guesses, now replaced by real data);
  2. seed the history with the optimized pose at the previous scan end;
  3. BACKWARD covariance/pose re-propagation from the optimized state over
     the retained history (lax.scan, negative dt; esekfom.hpp:279-385);
  4. FORWARD propagation over the group's IMU pairs (lax.scan over padded
     samples; esekfom.hpp:388-492), recording per-sample pose + 6x6 pose
     covariance + input;
  5. CONTINUATION propagation on future IMU into a shadow state
     (esekfom.hpp:171-277) extending the history past the scan end;
  6. SE(3) B-spline fit over the history and one batched pose query for
     every LiDAR point -> deskew each point to its own scan-end LiDAR frame;
  7. final partial-dt predict to the scan-group end with linearly
     interpolated IMU; snap the filter pose to the spline;
  8. per-LiDAR per-epoch uncertainty chains
     ext^-1 o lt^-1 o (pt_imu o ext) with Barfoot compounding, and the
     temporal compensation poses between LiDAR end frames.

All times entering this module are relative to the current group reference
(host keeps absolute f64 time) so f32 device math keeps sub-microsecond
resolution.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import state as st
from . import spline as spl
from . import uncertainty as unc
from .filter import dynamics
from .geometry import so3

BACKWARD_MIN_INDEX = 2  # backward pass rewrites entries [1, n-2] (IMU_Processing.hpp:276)
HISTORY_RETENTION = 0.2  # seconds (IMU_Processing.hpp:237)


class History(NamedTuple):
    """Rolling IMU-rate trajectory: traj_points + imu_cov of the reference
    (IMU_Processing.hpp:62-64) as fixed-capacity arrays."""

    t: jnp.ndarray  # (CAP,)
    q: jnp.ndarray  # (CAP, 4)
    p: jnp.ndarray  # (CAP, 3)
    cov: jnp.ndarray  # (CAP, 6, 6) pose covariance [trans; rot]
    inp: jnp.ndarray  # (CAP, 6) [gyro(3), acc(3)] input attached to entry
    n: jnp.ndarray  # () int32 valid count (entries sorted by t)


def empty_history(cap: int, dtype=jnp.float32) -> History:
    return History(
        t=jnp.zeros((cap,), dtype),
        q=jnp.tile(jnp.zeros((4,), dtype).at[0].set(1.0), (cap, 1)),
        p=jnp.zeros((cap, 3), dtype),
        cov=jnp.zeros((cap, 6, 6), dtype),
        inp=jnp.zeros((cap, 6), dtype),
        n=jnp.asarray(0, jnp.int32),
    )


class MeasureGroup(NamedTuple):
    """One synchronized multi-LiDAR + IMU fusion round (common_lib.h:45-55),
    padded; LiDAR axis is the *physical* LiDAR index."""

    pts: jnp.ndarray  # (L, P, 4) x,y,z,t (t = absolute relative-seconds)
    pts_mask: jnp.ndarray  # (L, P)
    beg_t: jnp.ndarray  # (L,)
    end_t: jnp.ndarray  # (L,)
    imu: jnp.ndarray  # (I, 7) [t, gyro(3), acc(3)]
    imu_mask: jnp.ndarray  # (I,)
    imu_cont: jnp.ndarray  # (IC, 7) future IMU (first = last of imu)
    imu_cont_mask: jnp.ndarray  # (IC,)
    t_shift: jnp.ndarray  # () this group's time base minus the previous
    # group's (all other times are relative to the group base so f32 keeps
    # microsecond resolution over arbitrarily long sequences)


class UndistortResult(NamedTuple):
    x: st.State
    P: jnp.ndarray
    hist: History
    last_in: jnp.ndarray  # (6,)
    last_imu: jnp.ndarray  # (7,) raw last sample of this group
    pts_deskewed: jnp.ndarray  # (L, P, 3)
    pt_epoch: jnp.ndarray  # (L, P) int32
    base: jnp.ndarray  # () int32 — latest-ending LiDAR
    tc_q: jnp.ndarray  # (L, 4) temporal comp (identity at base)
    tc_t: jnp.ndarray  # (L, 3)
    tc_cov: jnp.ndarray  # (L, 6, 6)
    unc_q: jnp.ndarray  # (L, E, 4) epoch uncertainty chain (own frame)
    unc_t: jnp.ndarray  # (L, E, 3)
    unc_cov: jnp.ndarray  # (L, E, 6, 6)
    epoch_count: jnp.ndarray  # (L,)
    lt_q: jnp.ndarray  # (L, 4) scan-end (lt_lidar_frame) poses
    lt_t: jnp.ndarray  # (L, 3)
    lt_cov: jnp.ndarray  # (L, 6, 6)


def _pose_cov6(P):
    """Top-left 6x6 of the state covariance in [trans; rot] order — the
    reference's getUncertainty (esekfom.hpp:760-767)."""
    return P[:6, :6]


def _ext_cov6(P, l, L):
    """Extrinsic pose covariance of LiDAR l in [trans; rot] order
    (getExtrinsicUncertainty, esekfom.hpp:778-786)."""
    it = st.idx_ext_t(L, 0)
    ir = st.idx_ext_r(L, 0)
    tt = jax.lax.dynamic_slice(P, (it + 3 * l, it + 3 * l), (3, 3))
    tr = jax.lax.dynamic_slice(P, (it + 3 * l, ir + 3 * l), (3, 3))
    rr = jax.lax.dynamic_slice(P, (ir + 3 * l, ir + 3 * l), (3, 3))
    top = jnp.concatenate([tt, tr], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(tr, -1, -2), rr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _batch_propagate(x0, P0, gyros, accs, dts, valids, Q):
    """One propagation pass, TPU-parallel: a cheap sequential mean scan,
    vmapped per-step Jacobians, then log-depth all-prefix covariance via
    associative scan (dynamics.parallel_covariance).

    Returns (x_final, P_final, per-step (q, p, cov6) and the post-step
    states' times are the caller's concern)."""
    n = P0.shape[0]
    dtype = P0.dtype

    def mean_step(x, inp):
        g, a, dt, v = inp
        x2 = dynamics.step_mean(x, dynamics.Input(acc=a, gyro=g), dt)
        x2 = jax.tree_util.tree_map(lambda p, q: jnp.where(v, p, q), x2, x)
        return x2, (x, x2)

    x_f, (pres, posts) = jax.lax.scan(mean_step, x0, (gyros, accs, dts, valids))

    def jac(xp, g, a, dt):
        _, F, Fw = dynamics.transition(xp, dynamics.Input(acc=a, gyro=g), dt)
        return F, Fw @ Q @ Fw.T

    Fs, Qts = jax.vmap(jac)(pres, gyros, accs, dts)
    I = jnp.eye(n, dtype=dtype)
    # promote to P's (solve) dtype: the associative scan concatenates
    # its operands at the lax level, which rejects mixed f32/f64
    Fs = jnp.where(valids[:, None, None], Fs.astype(dtype), I[None])
    Qts = jnp.where(
        valids[:, None, None], Qts.astype(dtype), jnp.zeros((n, n), dtype)
    )
    Ps = dynamics.parallel_covariance(Fs, Qts, P0)
    return x_f, Ps[-1], posts, Ps


def _compact_history(h: History, keep):
    """Stable-compact kept entries to the front (order by time preserved)."""
    cap = h.t.shape[0]
    big = jnp.asarray(jnp.finfo(h.t.dtype).max, h.t.dtype)
    order = jnp.argsort(jnp.where(keep, h.t, big), stable=True)
    n = jnp.sum(keep).astype(jnp.int32)
    return History(
        t=h.t[order], q=h.q[order], p=h.p[order], cov=h.cov[order],
        inp=h.inp[order], n=n,
    )


def _append(h: History, t, q, p, cov, inp, valid):
    """Append masked entries (arrays leading dim K) in order."""
    cap = h.t.shape[0]
    K = t.shape[0]
    pos = h.n + jnp.cumsum(valid.astype(jnp.int32)) - 1
    tgt = jnp.where(valid, pos, cap)  # cap = dump row

    def put(buf, val):
        padded = jnp.concatenate([buf, jnp.zeros_like(buf[:1])], axis=0)
        # explicit cast: P-derived covariances arrive in the f64 solve
        # dtype while the history stays in the point dtype (implicit
        # scatter narrowing is deprecated in JAX)
        return padded.at[tgt].set(val.astype(buf.dtype))[:cap]

    return History(
        t=put(h.t, t), q=put(h.q, q), p=put(h.p, p), cov=put(h.cov, cov),
        # dtype=int32: under x64 jnp.sum would promote to int64 and break
        # the lax.scan carry-type invariant (scan_steps)
        inp=put(h.inp, inp), n=h.n + jnp.sum(valid, dtype=jnp.int32),
    )


def undistort(
    cfg,
    x: st.State,
    P,
    hist: History,
    group: MeasureGroup,
    Q,
    last_in,
    last_imu,
    last_end_t,
    mean_acc_norm,
) -> UndistortResult:
    L = x.num_lidars
    n = st.dof(L)
    # POINT dtype comes from the state, NOT from P: the covariance is
    # carried in the solve dtype (f64 on the flagship — see
    # pipeline.init_carry) while every (M, ·)/history tensor stays f32
    dtype = x.pos.dtype
    cap = hist.t.shape[0]
    E = cfg.epoch_capacity

    g_scale = cfg.gravity / mean_acc_norm  # IMU_Processing.hpp:318

    # rebase carried times into this group's time frame
    hist = hist._replace(t=hist.t - group.t_shift)
    last_end_t = last_end_t - group.t_shift
    last_imu = last_imu.at[0].add(-group.t_shift)

    base = jnp.argmax(group.end_t).astype(jnp.int32)
    pcl_end = jnp.max(group.end_t)
    # reference pcl_beg: begin time of the earliest-*ending* scan
    # (IMU_Processing.hpp:225 with lidar order sorted by end time)
    pcl_beg = group.beg_t[jnp.argmin(group.end_t)]

    imu_t = group.imu[:, 0]
    imu_gyro = group.imu[:, 1:4]
    imu_acc = group.imu[:, 4:7]
    n_imu = jnp.sum(group.imu_mask.astype(jnp.int32))
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    last_imu_idx = jnp.argmax(jnp.where(group.imu_mask, imu_t, -big))
    imu_end = imu_t[last_imu_idx]
    # trimming reference time = v_imu.front() = previous group's last raw
    # sample (IMU_Processing.hpp:223,251): entries beyond it are last
    # round's continuation guesses, now replaced by real data
    imu_beg = last_imu[0]

    # ---- 1. trim history (IMU_Processing.hpp:235-261) ----
    idx = jnp.arange(cap)
    live = idx < hist.n
    keep = live & (hist.t + HISTORY_RETENTION >= pcl_beg) & (hist.t <= imu_beg)
    hist = _compact_history(hist, keep)

    # ---- 2. seed with optimized pose at last scan end (:264-272) ----
    seed_valid = (last_end_t != 0.0)[None]
    hist = _append(
        hist,
        t=last_end_t[None],
        q=x.rot[None],
        p=x.pos[None],
        cov=_pose_cov6(P)[None],
        inp=last_in[None],
        valid=jnp.asarray(seed_valid).reshape(1),
    )

    # ---- 3. backward re-propagation (:274-292) ----
    rev = jnp.arange(cap - 1, 0, -1)
    bactive = (rev >= BACKWARD_MIN_INDEX) & (rev <= hist.n - 1)
    bdts = hist.t[rev - 1] - hist.t[rev]  # negative
    _, _, bposts, bPs = _batch_propagate(
        x, P, hist.inp[rev, 0:3], hist.inp[rev, 3:6], bdts, bactive, Q
    )
    bq, bp, bcov = bposts.rot, bposts.pos, bPs[:, :6, :6]
    # write results into slots i-1
    wslot = jnp.where(bactive, rev - 1, cap)
    hist = hist._replace(
        q=jnp.concatenate([hist.q, jnp.zeros((1, 4), dtype)]).at[wslot].set(bq)[:cap],
        p=jnp.concatenate([hist.p, jnp.zeros((1, 3), dtype)]).at[wslot].set(bp)[:cap],
        cov=jnp.concatenate([hist.cov, jnp.zeros((1, 6, 6), dtype)])
        .at[wslot]
        .set(bcov.astype(dtype))[:cap],
    )

    # ---- 4. forward propagation (:295-347) ----
    # v_imu.push_front(last_imu_): the previous group's last raw sample
    # leads the pair chain (IMU_Processing.hpp:221)
    head = jnp.concatenate([last_imu[None], group.imu[:-1]], axis=0)
    tails = group.imu
    valid_f = group.imu_mask & (tails[:, 0] >= last_end_t)
    f_gyro = 0.5 * (head[:, 1:4] + tails[:, 1:4])
    f_acc = 0.5 * (head[:, 4:7] + tails[:, 4:7]) * g_scale
    f_dts = tails[:, 0] - jnp.maximum(head[:, 0], last_end_t)
    x_f, P_f, fposts, fPs = _batch_propagate(x, P, f_gyro, f_acc, f_dts, valid_f, Q)
    fin = jnp.concatenate([f_gyro, f_acc], axis=-1)
    hist = _append(
        hist, tails[:, 0], fposts.rot, fposts.pos, fPs[:, :6, :6], fin, valid_f
    )

    # ---- 5. continuation on future IMU (:349-389) ----
    c_head = group.imu_cont[:-1]
    c_tail = group.imu_cont[1:]
    valid_c = group.imu_cont_mask[:-1] & group.imu_cont_mask[1:]
    c_gyro = 0.5 * (c_head[:, 1:4] + c_tail[:, 1:4])
    c_acc = 0.5 * (c_head[:, 4:7] + c_tail[:, 4:7]) * g_scale
    c_dts = c_tail[:, 0] - c_head[:, 0]
    _, _, cposts, cPs = _batch_propagate(x_f, P_f, c_gyro, c_acc, c_dts, valid_c, Q)
    cin = jnp.concatenate([c_gyro, c_acc], axis=-1)
    hist = _append(
        hist, c_tail[:, 0], cposts.rot, cposts.pos, cPs[:, :6, :6], cin, valid_c
    )

    # ---- spline over the history (:391) ----
    live = jnp.arange(cap) < hist.n
    sp = spl.feed_trajectory(hist.t, hist.q, hist.p, live, cfg.spline_capacity)

    # ---- 7. final partial-dt predict to pcl_end (:393-409) ----
    c1 = group.imu_cont[1]
    last7 = group.imu[last_imu_idx]
    ratio = (pcl_end - last7[0]) / jnp.maximum(c1[0] - last7[0], 1e-9)
    gyro_i = ratio * last7[1:4] + (1.0 - ratio) * c1[1:4]
    acc_i = (ratio * last7[4:7] + (1.0 - ratio) * c1[4:7]) * g_scale
    u_last = dynamics.Input(acc=acc_i, gyro=gyro_i)
    dt_last = pcl_end - imu_end
    x_f, P_f = dynamics.predict(x_f, P_f, u_last, dt_last, Q)

    # snap filter pose to the spline at the group end (:430-441)
    sq, spos, sok = spl.get_pose(sp, pcl_end)
    x_f = st.State(
        pos=jnp.where(sok, spos, x_f.pos),
        rot=jnp.where(sok, sq, x_f.rot),
        ext_r=x_f.ext_r, ext_t=x_f.ext_t, vel=x_f.vel,
        bg=x_f.bg, ba=x_f.ba, grav=x_f.grav,
    )

    # ---- per-LiDAR scan-end frames (:443-472) ----
    masked_t = jnp.where(live, hist.t, big)
    cp0 = jnp.searchsorted(masked_t, group.end_t, side="right").astype(jnp.int32)
    # lt frame: spline pose at own end time; base uses the filter pose time
    lt_q_all, lt_t_all, lt_ok = spl.get_pose_batch(sp, group.end_t)
    lt_q = jnp.where((jnp.arange(L) == base)[:, None], x_f.rot[None], lt_q_all)
    lt_t = jnp.where((jnp.arange(L) == base)[:, None], x_f.pos[None], lt_t_all)
    cov_at_cp0 = hist.cov[jnp.clip(cp0, 0, cap - 1)]
    lt_cov = jnp.where(
        (jnp.arange(L) == base)[:, None, None],
        _pose_cov6(P_f).astype(dtype)[None],  # P may be f64; chains are f32
        cov_at_cp0,
    )

    # ---- 6. point deskew (:475-507) ----
    pt_t = group.pts[..., 3]
    flat_t = pt_t.reshape(-1)
    ext_q = x_f.ext_r  # (L, 4)
    ext_t = x_f.ext_t
    p_in = group.pts[..., :3]
    import jax as _jax

    use_pallas_deskew = cfg.pallas_deskew
    if use_pallas_deskew is None:  # auto: kernel on the TPU f32 path
        use_pallas_deskew = (
            _jax.default_backend() == "tpu" and p_in.dtype == jnp.float32
        )
    if use_pallas_deskew:
        # fused kernel path: per-LiDAR calls (ext/lt change per LiDAR)
        from .ops.deskew_pallas import deskew_points

        interp = _jax.default_backend() != "tpu"
        outs = []
        for l in range(L):
            o = deskew_points(
                group.pts[l],
                sp.cps[:, :3, :3],
                sp.cps[:, :3, 3],
                sp.logs,
                sp.t0,
                sp.num_valid,
                spl.CONTROL_DT,
                so3.quat_to_mat(ext_q[l]),
                ext_t[l],
                so3.quat_to_mat(lt_q[l]),
                lt_t[l],
                interpret=interp,
            )
            outs.append(o)
        o = jnp.stack(outs)
        pts_deskewed = o[..., :3]
    else:
        pq, pp, pok = spl.get_pose_batch(sp, flat_t)
        pq = pq.reshape(L, -1, 4)
        pp = pp.reshape(L, -1, 3)
        pok = pok.reshape(L, -1)
        # P_comp = ext^-1 (lt^-1 (pt (ext p + t_ext) + (pt_t - lt_t)) - t_ext)
        pl_imu = so3.quat_rotate(
            pq, so3.quat_rotate(ext_q[:, None], p_in) + ext_t[:, None]
        )
        T_ei = pp - lt_t[:, None, :]
        in_lt = so3.quat_rotate_inv(
            jnp.broadcast_to(lt_q[:, None], pq.shape), pl_imu + T_ei
        )
        p_deskew = so3.quat_rotate_inv(
            jnp.broadcast_to(ext_q[:, None], pq.shape), in_lt - ext_t[:, None]
        )
        pts_deskewed = jnp.where(pok[..., None], p_deskew, p_in)

    # epoch index per point: #{hist times in (pt_t, t[cp0]]} - 1  (:484-494)
    rank = jnp.searchsorted(masked_t, flat_t, side="right").reshape(L, -1)
    pt_epoch = (cp0[:, None] - rank).astype(jnp.int32)
    pt_epoch = jnp.maximum(pt_epoch, 0)

    # ---- 8. per-epoch uncertainty chains ----
    # epoch k of LiDAR l: boundary hist index j = cp0[l] - k;
    #   pose time tau = min(end_t[l], t[j]); covariance = hist.cov[j]
    ks = jnp.arange(E, dtype=jnp.int32)
    jmat = cp0[:, None] - ks[None, :]  # (L, E)
    first_above_beg = jnp.searchsorted(masked_t, group.beg_t, side="right").astype(
        jnp.int32
    )
    epoch_count = (cp0 - first_above_beg + 1).astype(jnp.int32)
    epoch_count = jnp.clip(epoch_count, 1, E)
    jmat_c = jnp.clip(jmat, 0, cap - 1)
    tau = jnp.minimum(group.end_t[:, None], hist.t[jmat_c])
    eq, ep, eok = spl.get_pose_batch(sp, tau.reshape(-1))
    eq = eq.reshape(L, E, 4)
    ep = ep.reshape(L, E, 3)
    ecov = hist.cov[jmat_c]  # (L, E, 6, 6)

    ext_cov = jax.vmap(lambda l: _ext_cov6(P_f, l, L))(jnp.arange(L)).astype(
        dtype
    )
    ext_pose = unc.Pose(q=ext_q, t=ext_t, cov=ext_cov)
    lt_pose = unc.Pose(q=lt_q, t=lt_t, cov=lt_cov)
    pt_pose = unc.Pose(q=eq, t=ep, cov=ecov)

    def chain(l, k):
        a = unc.compound_pose(
            unc.Pose(pt_pose.q[l, k], pt_pose.t[l, k], pt_pose.cov[l, k]),
            unc.Pose(ext_pose.q[l], ext_pose.t[l], ext_pose.cov[l]),
        )
        b = unc.compound_inv_pose(
            unc.Pose(lt_pose.q[l], lt_pose.t[l], lt_pose.cov[l]), a
        )
        c = unc.compound_inv_pose(
            unc.Pose(ext_pose.q[l], ext_pose.t[l], ext_pose.cov[l]), b
        )
        return c

    chain_v = jax.vmap(jax.vmap(chain, in_axes=(None, 0)), in_axes=(0, None))(
        jnp.arange(L), jnp.arange(E)
    )
    unc_q, unc_t, unc_cov = chain_v.q, chain_v.t, chain_v.cov

    # ---- temporal compensation poses (:510-522) ----
    def tcomp(l):
        return unc.compound_inv_pose(
            unc.Pose(lt_pose.q[base], lt_pose.t[base], lt_pose.cov[base]),
            unc.Pose(lt_pose.q[l], lt_pose.t[l], lt_pose.cov[l]),
        )

    tc = jax.vmap(tcomp)(jnp.arange(L))
    is_base = jnp.arange(L) == base
    tc_q = jnp.where(is_base[:, None], jnp.zeros((4,), dtype).at[0].set(1.0)[None], tc.q)
    tc_t = jnp.where(is_base[:, None], jnp.zeros((3,), dtype)[None], tc.t)
    tc_cov = jnp.where(is_base[:, None, None], jnp.zeros((6, 6), dtype)[None], tc.cov)

    last_in_new = jnp.concatenate([u_last.gyro, u_last.acc])
    last_imu_new = group.imu[last_imu_idx]

    return UndistortResult(
        x=x_f, P=P_f, hist=hist, last_in=last_in_new, last_imu=last_imu_new,
        pts_deskewed=pts_deskewed, pt_epoch=pt_epoch, base=base,
        tc_q=tc_q, tc_t=tc_t, tc_cov=tc_cov,
        unc_q=unc_q, unc_t=unc_t, unc_cov=unc_cov, epoch_count=epoch_count,
        lt_q=lt_q, lt_t=lt_t, lt_cov=lt_cov,
    )
