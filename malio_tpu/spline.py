"""Cumulative uniform cubic SE(3) B-spline for continuous-time deskew.

Behavioral re-derivation of the OpenVINS BsplineSE3 as used by MA-LIO
(BsplineSE3.cpp): control points on a fixed 0.01 s grid (the reference
hard-forces dt=0.01, BsplineSE3.cpp:34), built by linear SE(3) interpolation
of the IMU-rate trajectory, queried with the De Boor-Cox cumulative form

  pose(t) = P0 * Exp(b0 * Log(P0^-1 P1)) * Exp(b1 * Log(P1^-1 P2))
               * Exp(b2 * Log(P2^-1 P3))
  b0 = (5 + 3u - 3u^2 + u^3)/6,  b1 = (1 + 3u + 3u^2 - 2u^3)/6,  b2 = u^3/6

TPU-first redesign: instead of a per-query std::map walk
(BsplineSE3.cpp:84-118), control points live on a uniform grid so a query is
an index computation + gather; the per-interval Logs are precomputed once per
feed so the (hot) batched point query is 3 exp_se3 + 3 matmuls per point, all
vmapped. Everything is fixed-capacity and jit-safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import se3, so3

CONTROL_DT = 0.01  # BsplineSE3.cpp:34


class Spline(NamedTuple):
    t0: jnp.ndarray  # scalar: timestamp of control point 0
    cps: jnp.ndarray  # (C, 4, 4) control poses on the uniform grid
    logs: jnp.ndarray  # (C, 6) Log(cp_j^-1 cp_{j+1}) (last entry unused)
    num_valid: jnp.ndarray  # scalar int: number of valid control points


def feed_trajectory(times, poses_q, poses_t, valid, cap: int) -> Spline:
    """Build control points from a timestamped pose list.

    times: (T,) seconds (monotonic over valid entries)
    poses_q: (T, 4) [w,x,y,z]; poses_t: (T, 3); valid: (T,) bool
    cap: static control-point capacity.

    Mirrors feed_trajectory semantics (BsplineSE3.cpp:26-82): the *last*
    valid trajectory point is excluded; control point j sits at
    t0 + j*0.01 and is the linear SE(3) interpolation of its bounding
    trajectory poses; control points stop when no strictly-later trajectory
    point bounds them.
    """
    dtype = poses_t.dtype
    T = times.shape[0]
    big = jnp.asarray(jnp.finfo(times.dtype).max, times.dtype)

    # drop the last valid point (reference loops to size-1)
    n_valid = jnp.sum(valid)
    order = jnp.argsort(jnp.where(valid, times, big))
    times_s = times[order]
    q_s = poses_q[order]
    t_s = poses_t[order]
    n_used = jnp.maximum(n_valid - 1, 0)

    t0 = times_s[0]
    cp_times = t0 + CONTROL_DT * jnp.arange(cap, dtype=times.dtype)

    # bounding trajectory indices for each control point:
    #   hi = first index with time > cp_t   (upper_bound)
    #   lo = hi - 1 clamped                 (lower_bound - 1 semantics)
    masked_times = jnp.where(jnp.arange(T) < n_used, times_s, big)
    hi = jnp.searchsorted(masked_times, cp_times, side="right")
    cp_valid = hi < n_used
    hi_c = jnp.clip(hi, 1, jnp.maximum(n_used - 1, 1))
    lo_c = hi_c - 1

    T_lo = se3.make_se3(q_s[lo_c], t_s[lo_c])
    T_hi = se3.make_se3(q_s[hi_c], t_s[hi_c])
    t_lo = masked_times[lo_c]
    t_hi = masked_times[hi_c]
    lam = jnp.where(
        t_hi > t_lo, (cp_times - t_lo) / jnp.maximum(t_hi - t_lo, 1e-12), 0.0
    ).astype(dtype)
    # pose_interp = exp(lambda * log(T_hi * T_lo^-1)) * T_lo
    delta = se3.log_se3(T_hi @ se3.inv_se3(T_lo))
    cps = se3.exp_se3(lam[:, None] * delta) @ T_lo
    num_valid = jnp.sum(cp_valid)

    # per-interval logs for the cumulative form
    nxt = jnp.roll(cps, -1, axis=0)
    logs = se3.log_se3(se3.inv_se3(cps) @ nxt)
    return Spline(t0=t0, cps=cps, logs=logs, num_valid=num_valid)


def get_pose(sp: Spline, t):
    """Query pose at time(s) t. Returns (q (...,4), p (...,3), ok (...,)).

    ok mirrors the reference's bounding check (needs control points
    j-1 .. j+2 around the query); on failure the caller falls back to the
    filter pose (IMU_Processing.hpp:430-441)."""
    dtf = sp.logs.dtype
    rel = (t - sp.t0) / CONTROL_DT
    j = jnp.floor(rel).astype(jnp.int32)  # interval [cp_j, cp_{j+1})
    ok = (j >= 1) & (j + 2 <= sp.num_valid - 1)
    jc = jnp.clip(j, 1, jnp.maximum(sp.num_valid - 3, 1))
    u = (rel - jc).astype(dtf)

    b0 = (5.0 + 3.0 * u - 3.0 * u * u + u * u * u) / 6.0
    b1 = (1.0 + 3.0 * u + 3.0 * u * u - 2.0 * u * u * u) / 6.0
    b2 = (u * u * u) / 6.0

    P0 = sp.cps[jc - 1]
    d0 = sp.logs[jc - 1]
    d1 = sp.logs[jc]
    d2 = sp.logs[jc + 1]
    A0 = se3.exp_se3(b0[..., None] * d0)
    A1 = se3.exp_se3(b1[..., None] * d1)
    A2 = se3.exp_se3(b2[..., None] * d2)
    pose = P0 @ A0 @ A1 @ A2
    q = so3.mat_to_quat(pose[..., :3, :3])
    p = pose[..., :3, 3]
    return q, p, ok


def get_pose_batch(sp: Spline, ts):
    """Vectorized query for (N,) times."""
    return jax.vmap(lambda t: get_pose(sp, t))(ts)
