"""Process model and discrete transition Jacobians for the LIO filter.

Continuous model (use-ikfom.hpp:67-112):
    pos' = vel
    rot' = omega             (omega = gyro - bg, body rates)
    vel' = R (acc - ba) + grav
    all other blocks constant.

The discrete transition follows the reference's generic manifold recipe
(esekfom.hpp:388-492): after the Euler state step, the error-state transition
is  F = F_x1 + dt * f_x_final  where

  * vect rows copy the continuous Jacobian rows,
  * SO(3) rows get diag Exp(-f_seg dt) in F_x1 and row transport
    A(-f_seg dt) applied to their continuous rows,
  * the S2 (gravity) row pair gets diag Nx(g+) Exp(f_g dt) Mx(g, 0); the
    gravity process derivative f_g is identically 0 for this system so only
    the chart-transport diag survives.

The same F applies to forward, backward (negative dt) and continuation
propagation; only which (x, P) pair it updates differs (esekfom.hpp:171-492).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3, s2
from .. import state as st


class Input(NamedTuple):
    """IMU input sample (averaged pair), use-ikfom.hpp:43-46."""

    acc: jnp.ndarray  # (3,)
    gyro: jnp.ndarray  # (3,)


def process_noise_matrix(gyr_cov, acc_cov, b_gyr_cov, b_acc_cov, dtype=jnp.float32):
    """12x12 diagonal Q, noise order [ng, na, nbg, nba] (use-ikfom.hpp:48-63,
    overwritten with measured/config covariances in IMU_Processing.hpp:204-207)."""
    d = jnp.concatenate(
        [
            jnp.full((3,), gyr_cov, dtype),
            jnp.full((3,), acc_cov, dtype),
            jnp.full((3,), b_gyr_cov, dtype),
            jnp.full((3,), b_acc_cov, dtype),
        ]
    )
    return jnp.diag(d)


def step_mean(x: st.State, u: Input, dt):
    """Mean-only Euler step (the cheap sequential part of propagation)."""
    dt = jnp.asarray(dt, x.pos.dtype)
    omega = u.gyro - x.bg
    acc_b = u.acc - x.ba
    R = so3.quat_to_mat(x.rot)
    a_world = R @ acc_b + x.grav
    return st.State(
        pos=x.pos + x.vel * dt,
        rot=so3.boxplus(x.rot, omega * dt),
        ext_r=x.ext_r,
        ext_t=x.ext_t,
        vel=x.vel + a_world * dt,
        bg=x.bg,
        ba=x.ba,
        grav=x.grav,
    )


def transition(x: st.State, u: Input, dt):
    """One Euler step of the mean plus the exact discrete error-state
    Jacobians used by the reference.

    Returns (x_next, F (n,n), Fw (n,12))."""
    L = x.num_lidars
    n = st.dof(L)
    dtype = x.pos.dtype
    dt = jnp.asarray(dt, dtype)

    omega = u.gyro - x.bg
    acc_b = u.acc - x.ba
    R = so3.quat_to_mat(x.rot)
    a_world = R @ acc_b + x.grav

    # ---- mean propagation (oplus with the flattened derivative) ----
    x_next = st.State(
        pos=x.pos + x.vel * dt,
        rot=so3.boxplus(x.rot, omega * dt),
        ext_r=x.ext_r,
        ext_t=x.ext_t,
        vel=x.vel + a_world * dt,
        bg=x.bg,
        ba=x.ba,
        grav=x.grav,
    )

    # ---- error-state transition F ----
    i_rot = st.idx_rot(L)
    i_vel = st.idx_vel(L)
    i_bg = st.idx_bg(L)
    i_ba = st.idx_ba(L)
    i_g = st.idx_grav(L)

    F = jnp.eye(n, dtype=dtype)
    # pos rows: d pos / d vel = I * dt
    F = jax.lax.dynamic_update_slice(
        F, jnp.eye(3, dtype=dtype) * dt, (0, i_vel)
    )
    # rot rows: diag Exp(-omega dt); transported d rot' / d bg = -I
    A_neg = so3.A_matrix(-omega * dt)
    F = jax.lax.dynamic_update_slice(
        F, so3.exp_so3_mat(-omega * dt), (i_rot, i_rot)
    )
    F = jax.lax.dynamic_update_slice(F, -dt * A_neg, (i_rot, i_bg))
    # vel rows (vect type, rows copied as-is):
    F = jax.lax.dynamic_update_slice(
        F, -dt * (R @ so3.hat(acc_b)), (i_vel, i_rot)
    )
    F = jax.lax.dynamic_update_slice(F, -dt * R, (i_vel, i_ba))
    Mx0 = s2.s2_mx(x.grav, jnp.zeros(2, dtype))  # S2_Mx at delta=0
    F = jax.lax.dynamic_update_slice(F, dt * Mx0, (i_vel, i_g))
    # gravity rows: chart transport diag Nx(g) Mx(g, 0) (2x2)
    Nx = s2.s2_nx_yy(x_next.grav)
    g_diag = Nx @ s2.s2_mx(x.grav, jnp.zeros(2, dtype))
    F = jax.lax.dynamic_update_slice(F, g_diag, (i_g, i_g))

    # ---- noise Jacobian Fw (n, 12), noise order [ng, na, nbg, nba] ----
    Fw = jnp.zeros((n, 12), dtype=dtype)
    # rot rows: transported -I on gyro noise
    Fw = jax.lax.dynamic_update_slice(Fw, -dt * A_neg, (i_rot, 0))
    Fw = jax.lax.dynamic_update_slice(Fw, -dt * R, (i_vel, 3))
    Fw = jax.lax.dynamic_update_slice(
        Fw, dt * jnp.eye(3, dtype=dtype), (i_bg, 6)
    )
    Fw = jax.lax.dynamic_update_slice(
        Fw, dt * jnp.eye(3, dtype=dtype), (i_ba, 9)
    )
    return x_next, F, Fw


def predict(x: st.State, P, u: Input, dt, Q):
    """Propagate mean and covariance (esekfom.hpp:388-492)."""
    x_next, F, Fw = transition(x, u, dt)
    P_next = F @ P @ F.T + Fw @ Q @ Fw.T
    return x_next, P_next


def parallel_covariance(Fs, Qts, P0):
    """All-prefix covariance propagation via associative scan.

    The recursion P_k = F_k P_{k-1} F_k^T + Qt_k is an affine map on
    covariances; affine maps compose associatively:
      (F2, Q2) o (F1, Q1) = (F2 F1, F2 Q1 F2^T + Q2)
    so the whole chain reduces in log-depth batched matmuls (MXU-friendly)
    instead of N sequential 35x35 products — the TPU-native replacement
    for the reference's per-IMU-sample predict loop.

    Fs: (N, n, n) step transitions; Qts: (N, n, n) step noise (already
    Fw Q Fw^T); returns (N, n, n) covariances after each step."""

    def combine(a, b):
        Fa, Qa = a
        Fb, Qb = b
        F = jnp.einsum("...ij,...jk->...ik", Fb, Fa)
        Q = (
            jnp.einsum(
                "...ij,...jk,...lk->...il", Fb, Qa, Fb
            )
            + Qb
        )
        return F, Q

    G, S = jax.lax.associative_scan(combine, (Fs, Qts))
    return jnp.einsum("nij,jk,nlk->nil", G, P0, G) + S
