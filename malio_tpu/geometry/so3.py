"""SO(3) primitives on quaternions, TPU-native (pure jnp, vmap/jit friendly).

Quaternion convention: arrays of shape (..., 4) ordered [w, x, y, z]
(Hamilton, right-handed, active rotation). All branchy small-angle cases are
handled with `jnp.where` + safe norms so every function is jit/vmap safe at
any dtype.

Behavioral reference (re-derived, not translated):
  /root/reference/MA_LIO/include/IKFoM_toolkit/mtk/types/SOn.hpp:241-253
  (boxplus = q * Exp(delta), boxminus = Log(other^-1 * q)),
  /root/reference/MA_LIO/include/IKFoM_toolkit/mtk/src/mtkmath.hpp:236-288
  (A_matrix, exp, log), /root/reference/MA_LIO/include/so3_math.h.
"""
from __future__ import annotations

import jax.numpy as jnp

# Switch point between Taylor series and closed form. Well inside the region
# where both are accurate to full precision for f32 and f64.
_SMALL = 1e-6
_SMALL2 = _SMALL * _SMALL


def _safe_sqrt_n2(n2):
    """sqrt of a squared norm that is differentiable at zero: the untaken
    closed-form branch sees a clamped argument so its gradient stays finite
    (double-where pattern)."""
    small = n2 < _SMALL2
    n2s = jnp.where(small, jnp.ones_like(n2), n2)
    return small, jnp.sqrt(n2s)


def hat(v):
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(q, r):
    """Hamilton product of two [w,x,y,z] quaternions."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses the expanded 15-mul form rather than q*v*q^-1 (fewer flops, no
    temporary quaternion)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    """Rotate v by q^-1."""
    return quat_rotate(quat_conj(q), v)


def exp_so3(v):
    """Rotation-vector (..., 3) -> quaternion (..., 4).

    q = [cos(|v|/2), sinc(|v|/2)/2 * v]; Taylor sinc for small angles
    (mirrors MTK::exp with scale=1/2, mtkmath.hpp:249-256)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small, n = _safe_sqrt_n2(n2)
    # sin(n/2)/n ; Taylor: 1/2 - n^2/48 + n^4/3840
    k = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(0.5 * n) / n)
    # cos(n/2) ; Taylor: 1 - n^2/8 + n^4/384
    w = jnp.where(small, 1.0 - n2 / 8.0 + n2 * n2 / 384.0, jnp.cos(0.5 * n))
    return jnp.concatenate([w, k * v], axis=-1)


def log_so3(q):
    """Quaternion (..., 4) -> rotation vector (..., 3), shortest path."""
    # force w >= 0 so the result is the minimal-angle representative
    q = jnp.where(q[..., :1] >= 0, q, -q)
    w = q[..., :1]
    u = q[..., 1:]
    n2 = jnp.sum(u * u, axis=-1, keepdims=True)
    small, n = _safe_sqrt_n2(n2)
    ang = 2.0 * jnp.arctan2(n, w)
    # 2*atan2(n,w)/n ; Taylor around n->0 (w ~ 1): 2/w - 2 n^2 / (3 w^3)
    k = jnp.where(small, 2.0 / w - 2.0 * n2 / (3.0 * w**3), ang / n)
    return k * u


def quat_to_mat(q):
    """Quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), Shepperd's method
    made branch-free for jit (evaluate all four candidates, pick the best)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate (unnormalized) quaternions, one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # dominant component magnitudes
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    return jnp.where(q[..., :1] >= 0, q, -q)


def A_matrix(v):
    """SO(3) 'A' matrix (left Jacobian of Exp):
    I + (1-cos n)/n^2 hat(v) + (1 - sin(n)/n)/n^2 hat(v)^2
    (mtkmath.hpp:236-247) with Taylor fallbacks."""
    n2 = jnp.sum(v * v, axis=-1)[..., None, None]
    small, n = _safe_sqrt_n2(n2)
    c1 = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / (n * n))
    c2 = jnp.where(small, 1.0 / 6.0 - n2 / 120.0, (1.0 - jnp.sin(n) / n) / (n * n))
    V = hat(v)
    I = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), V.shape)
    return I + c1 * V + c2 * (V @ V)


def exp_so3_mat(v):
    """Rotation vector -> rotation matrix (Rodrigues)."""
    n2 = jnp.sum(v * v, axis=-1)[..., None, None]
    small, n = _safe_sqrt_n2(n2)
    s = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    c = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / (n * n))
    V = hat(v)
    I = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), V.shape)
    return I + s * V + c * (V @ V)


def log_so3_mat(R):
    """Rotation matrix -> rotation vector (via quaternion, robust near pi)."""
    return log_so3(mat_to_quat(R))


def boxplus(q, delta):
    """SO3 manifold boxplus: q * Exp(delta)  (SOn.hpp:241-244)."""
    return quat_normalize(quat_mul(q, exp_so3(delta)))


def boxminus(q, other):
    """SO3 manifold boxminus: Log(other^-1 * q)  (SOn.hpp:245-247)."""
    return log_so3(quat_mul(quat_conj(other), q))
