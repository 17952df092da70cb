"""Point-wise inter-LiDAR uncertainty propagation (Barfoot SE(3) compounding).

Re-derivation of associate_uct.hpp: 2nd + 4th order covariance compounding of
poses-with-covariance, and the per-point 3x3 covariance evaluation that feeds
the measurement-noise weighting. Covariance tangent ordering is
[translation(0:3); rotation(3:6)] throughout (see geometry.se3.adjoint).

A Pose is carried as a (quat[w,x,y,z], t, cov6) triple; the 4x4 matrix is
derived on demand. Everything is vmap-friendly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .geometry import so3, se3


class Pose(NamedTuple):
    """Pose with covariance (common_lib.h:57-63)."""

    q: jnp.ndarray  # (..., 4) [w,x,y,z]
    t: jnp.ndarray  # (..., 3)
    cov: jnp.ndarray  # (..., 6, 6), [trans; rot] ordering


def identity_pose(dtype=jnp.float32, cov=None):
    q = jnp.zeros(4, dtype).at[0].set(1.0)
    t = jnp.zeros(3, dtype)
    if cov is None:
        cov = jnp.zeros((6, 6), dtype)
    return Pose(q, t, cov)


def pose_matrix(p: Pose):
    return se3.make_se3(p.q, p.t)


def _covop1(B):
    """-tr(B) I + B (associate_uct.hpp:17-21)."""
    tr = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=B.dtype), B.shape)
    return -tr * I + B


def _covop2(B, C):
    """covop1(B) covop1(C) + covop1(C B) (associate_uct.hpp:23-27)."""
    return _covop1(B) @ _covop1(C) + _covop1(C @ B)


def _fourth_order(cov_1_prime, cov_2):
    """The 4th-order correction terms shared by both compounding directions
    (associate_uct.hpp:53-81, 106-134)."""
    c1rr = cov_1_prime[..., 0:3, 0:3]
    c1rp = cov_1_prime[..., 0:3, 3:6]
    c1pp = cov_1_prime[..., 3:6, 3:6]
    c2rr = cov_2[..., 0:3, 0:3]
    c2rp = cov_2[..., 0:3, 3:6]
    c2pp = cov_2[..., 3:6, 3:6]

    def a_mat(cpp, crp):
        Z = jnp.zeros_like(cpp)
        top = jnp.concatenate([_covop1(cpp), _covop1(crp + jnp.swapaxes(crp, -1, -2))], axis=-1)
        bot = jnp.concatenate([Z, _covop1(cpp)], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    A1 = a_mat(c1pp, c1rp)
    A2 = a_mat(c2pp, c2rp)

    c1pr = jnp.swapaxes(c1rp, -1, -2)
    Brr = (
        _covop2(c1pp, c2rr)
        + _covop2(c1pr, c2rp)
        + _covop2(c1rp, jnp.swapaxes(c2rp, -1, -2))
        + _covop2(c1rr, c2pp)
    )
    Brp = _covop2(c1pp, jnp.swapaxes(c2rp, -1, -2)) + _covop2(c1pr, c2pp)
    Bpp = _covop2(c1pp, c2pp)
    top = jnp.concatenate([Brr, Brp], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(Brp, -1, -2), Bpp], axis=-1)
    B = jnp.concatenate([top, bot], axis=-2)

    return (
        cov_1_prime
        + cov_2
        + (
            A1 @ cov_2
            + cov_2 @ jnp.swapaxes(A1, -1, -2)
            + A2 @ cov_1_prime
            + cov_1_prime @ jnp.swapaxes(A2, -1, -2)
        )
        / 12.0
        + B / 4.0
    )


def compound_pose(p1: Pose, p2: Pose) -> Pose:
    """T = T1 * T2 with 4th-order covariance (associate_uct.hpp:85-142)."""
    q = so3.quat_normalize(so3.quat_mul(p1.q, p2.q))
    t = so3.quat_rotate(p1.q, p2.t) + p1.t
    T2 = pose_matrix(p2)
    Ad = se3.adjoint(se3.inv_se3(T2))
    cov1p = Ad @ p1.cov @ jnp.swapaxes(Ad, -1, -2)
    cov = _fourth_order(cov1p, p2.cov)
    return Pose(q, t, cov)


def compound_inv_pose(p1: Pose, p2: Pose) -> Pose:
    """T = T1^-1 * T2 with 4th-order covariance (associate_uct.hpp:29-83)."""
    q = so3.quat_normalize(so3.quat_mul(so3.quat_conj(p1.q), p2.q))
    t = so3.quat_rotate_inv(p1.q, p2.t - p1.t)
    Tcp = se3.make_se3(q, t)
    Ad = se3.adjoint(se3.inv_se3(Tcp))
    cov1p = Ad @ p1.cov @ jnp.swapaxes(Ad, -1, -2)
    cov = _fourth_order(cov1p, p2.cov)
    return Pose(q, t, cov)


# magic constants from associate_uct.hpp:153-175 (evalPointUncertainty)
_COV_SCALE = 10000.0
_MEAS_COV = 0.1
_DISTANCE_WEIGHT = 0.05


def eval_point_uncertainty(point, pose: Pose):
    """3x3 world-frame covariance of a LiDAR point given its epoch pose
    uncertainty (associate_uct.hpp:153-175). Returns the 3x3 covariance; the
    measurement weight used downstream is its trace.

    point: (..., 3) in the LiDAR (deskewed, own end-frame) coordinates.
    """
    dtype = point.dtype
    p = point * _DISTANCE_WEIGHT
    T = pose_matrix(pose)
    R = T[..., :3, :3]
    # homogeneous transform of the scaled point
    tp = jnp.einsum("...ij,...j->...i", R, p) + T[..., :3, 3]

    # G = [w*I | -hat(tp) | T*D] acting on [trans(3); rot(3); meas(3)]
    # with w == 1 for homogeneous points (pointToFS, associate_uct.hpp:145-151)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)
    G_trans = I3
    G_rot = -so3.hat(tp)
    G_meas = R  # T @ D keeps the rotation columns

    cov_pose = pose.cov * _COV_SCALE
    cov_tt = cov_pose[..., 0:3, 0:3]
    cov_tr = cov_pose[..., 0:3, 3:6]
    cov_rr = cov_pose[..., 3:6, 3:6]

    # cov_point = [Gt Gr] [[Ctt, Ctr],[Crt, Crr]] [Gt Gr]^T + Gm (0.1 I) Gm^T
    out = (
        G_trans @ cov_tt @ jnp.swapaxes(G_trans, -1, -2)
        + G_trans @ cov_tr @ jnp.swapaxes(G_rot, -1, -2)
        + G_rot @ jnp.swapaxes(cov_tr, -1, -2) @ jnp.swapaxes(G_trans, -1, -2)
        + G_rot @ cov_rr @ jnp.swapaxes(G_rot, -1, -2)
        + _MEAS_COV * (G_meas @ jnp.swapaxes(G_meas, -1, -2))
    )
    return out


def point_uncertainty_trace(point, pose: Pose):
    cov = eval_point_uncertainty(point, pose)
    return jnp.trace(cov, axis1=-2, axis2=-1)
