"""SE(3) primitives on 4x4 homogeneous matrices (batched, jit/vmap safe).

Behavioral reference: /root/reference/MA_LIO/include/quat_ops.h:190-257
(exp_se3 / log_se3 / Inv_se3) and associate_uct.hpp:8-15 (adjoint).
Re-derived in jnp with branch-free small-angle handling.
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import hat, log_so3_mat, quat_to_mat, mat_to_quat, _safe_sqrt_n2

_SMALL = 1e-6


def exp_se3(xi):
    """se(3) 6-vector [w(3), u(3)] -> 4x4 transform (quat_ops.h:190-221)."""
    w = xi[..., :3]
    u = xi[..., 3:]
    n2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small, n = _safe_sqrt_n2(n2)
    A = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    B = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / (n * n))
    C = jnp.where(small, 1.0 / 6.0 - n2 / 120.0, (1.0 - A) / (n * n))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A * W + B * (W @ W)
    V = I + B * W + C * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, u)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log_se3(T):
    """4x4 transform -> se(3) 6-vector [w, u] (quat_ops.h:224-243)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3_mat(R)
    n2 = jnp.sum(w * w, axis=-1)[..., None]
    small, n = _safe_sqrt_n2(n2)
    W = hat(w / n)
    Wt = jnp.einsum("...ij,...j->...i", W, t)
    WWt = jnp.einsum("...ij,...j->...i", W, Wt)
    # coefficient (1 - t/(2 tan(t/2))); Taylor: n^2/12 + n^4/720
    coef = jnp.where(small, n2 / 12.0, 1.0 - n / (2.0 * jnp.tan(0.5 * n)))
    u = t - 0.5 * n * Wt + coef * WWt
    # for tiny angle the exact formula reduces to u = t (W is built from a
    # clamped norm there, so mask its contribution out)
    u = jnp.where(small, t, u)
    return jnp.concatenate([w, u], axis=-1)


def inv_se3(T):
    """Closed-form SE(3) inverse (quat_ops.h:252-257)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def make_se3(q, t):
    """Quaternion [w,x,y,z] + translation -> 4x4."""
    R = quat_to_mat(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_to_quat_t(T):
    return mat_to_quat(T[..., :3, :3]), T[..., :3, 3]


def adjoint(T):
    """SE(3) adjoint for tangent ordering [u(trans, 0:3); w(rot, 3:6)]:
    Ad = [[R, hat(t)R], [0, R]]  (associate_uct.hpp:8-15).

    All 6x6 pose covariances in this framework use that same
    [translation; rotation] block ordering, matching the reference's
    Pose.cov_ (esekfom.hpp:760-786 builds them from P's pos/rot blocks in
    pos-first order)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, hat(t) @ R], axis=-1)
    bottom = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
