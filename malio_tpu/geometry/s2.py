"""S2 sphere manifold (2-DOF) for the gravity state.

The gravity vector lives on a sphere of radius ``length`` (the reference uses
MTK::S2<double, 98090, 10000, 1>, i.e. length = 9.809, pole axis = x; see
use-ikfom.hpp:8 and mtk/types/S2.hpp). Charts:

  Bx(v)    : 3x2 basis of the tangent plane at v          (S2.hpp:189-242)
  boxplus  : v' = Exp(Bx(v) @ delta) v                    (S2.hpp:136-142)
  boxminus : 2-vector angle between two sphere points     (S2.hpp:144-167)
  Mx       : d(v boxplus delta)/d delta      (3x2)        (S2.hpp:276-290)
  Nx_yy    : d(boxminus)/d v at y==x (1/l^2 Bx^T hat(v))  (S2.hpp:269-274)

All functions take the sphere radius as a keyword (static) argument and are
jit/vmap safe.
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import hat, exp_so3_mat, A_matrix

_SMALL = 1e-7

# default radius: 98090/10000 as in use-ikfom.hpp:8
DEFAULT_LENGTH = 9.809


def s2_bx(v, length=DEFAULT_LENGTH):
    """Tangent basis at v, 3x2, for pole axis x (S2_typ=1; S2.hpp:226-241).

    Main branch requires v[0] + length > tol; the singular fallback (vector
    at the antipode of the pole) selects a fixed frame."""
    l = jnp.asarray(length, dtype=v.dtype)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    denom = l + x
    safe = denom > _SMALL
    sd = jnp.where(safe, denom, jnp.ones_like(denom))
    main = jnp.stack(
        [
            jnp.stack([-y, -z], axis=-1),
            jnp.stack([l - y * y / sd, -z * y / sd], axis=-1),
            jnp.stack([-z * y / sd, l - z * z / sd], axis=-1),
        ],
        axis=-2,
    ) / l
    fallback = jnp.zeros_like(main)
    fallback = fallback.at[..., 1, 1].set(-1.0)
    fallback = fallback.at[..., 2, 0].set(1.0)
    return jnp.where(safe[..., None, None], main, fallback)


def s2_boxplus(v, delta, length=DEFAULT_LENGTH):
    """v' = Exp(Bx(v) @ delta) @ v."""
    Bu = jnp.einsum("...ij,...j->...i", s2_bx(v, length), delta)
    R = exp_so3_mat(Bu)
    return jnp.einsum("...ij,...j->...i", R, v)


def s2_boxminus(v, other, length=DEFAULT_LENGTH):
    """2-DOF difference v boxminus other (S2.hpp:144-167)."""
    cross = jnp.cross(v, other)
    n2c = jnp.sum(cross * cross, axis=-1)
    v_cos = jnp.sum(v * other, axis=-1)
    # scale = atan2(|cross|, dot)/|cross| is an even, smooth function of
    # |cross|^2 near coincidence; the Taylor branch keeps it differentiable
    # there (atan(s/c)/s = 1/c - s^2/(3 c^3) + O(s^4))
    tiny = n2c < 1e-12
    v_sin = jnp.sqrt(jnp.where(tiny, 1.0, n2c))
    theta = jnp.arctan2(v_sin, v_cos)
    scale = jnp.where(
        tiny,
        1.0 / v_cos - n2c / (3.0 * v_cos**3),
        theta / v_sin,
    )
    Bx_o = s2_bx(other, length)
    w = jnp.einsum(
        "...ji,...j->...i", Bx_o, jnp.cross(other, v)
    )  # Bx^T (hat(other) v)
    main = scale[..., None] * w
    # antiparallel fallback (v_cos < 0, cross ~ 0): chart-degenerate [pi, 0]
    anti = tiny & (v_cos < 0)
    fallback = jnp.stack(
        [jnp.full_like(theta, jnp.pi), jnp.zeros_like(theta)], axis=-1
    ).astype(v.dtype)
    return jnp.where(anti[..., None], fallback, main)


def s2_mx(v, delta, length=DEFAULT_LENGTH):
    """d(v boxplus delta)/d delta, 3x2 (S2.hpp:276-290)."""
    Bx = s2_bx(v, length)
    Bu = jnp.einsum("...ij,...j->...i", Bx, delta)
    small = jnp.sum(delta * delta, axis=-1) < _SMALL * _SMALL
    hv = hat(v)
    small_res = -hv @ Bx
    R = exp_so3_mat(Bu)
    big_res = -R @ hv @ jnp.swapaxes(A_matrix(Bu), -1, -2) @ Bx
    return jnp.where(small[..., None, None], small_res, big_res)


def s2_nx_yy(v, length=DEFAULT_LENGTH):
    """d(boxminus)/d v at equal arguments: 1/l^2 * Bx^T hat(v)."""
    l = jnp.asarray(length, dtype=v.dtype)
    Bx = s2_bx(v, length)
    return jnp.swapaxes(Bx, -1, -2) @ hat(v) / (l * l)


def s2_hat(v):
    return hat(v)


def s2_project(v, length=DEFAULT_LENGTH):
    """Normalize an arbitrary 3-vector onto the sphere of radius length."""
    l = jnp.asarray(length, dtype=v.dtype)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True) * l
