"""Pallas TPU kernel: fused B-spline pose interpolation + point deskew.

The XLA path (spline.get_pose_batch + the SE(3) sandwich in
propagate.undistort) materializes ~6 intermediate (N,4,4) arrays in HBM
per deskew. This kernel keeps the whole chain on-chip: the control-point
table (tiny) sits in VMEM, each point block computes its De Boor-Cox
interpolation, composes the pose, and applies

  p' = ext^-1 (lt^-1 (pose(t) (ext p + t_ext) + (trans(t) - t_lt)) - t_ext)

(IMU_Processing.hpp:498-504) writing only the deskewed points back.

The math is expressed on rotation matrices (row-major 3x3 flattened to 9
lanes) because per-lane quaternion normalization is awkward in a blocked
layout; results match the jnp path to f32 round-off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 256


def _exp_so3_rows(w0, w1, w2):
    """Rodrigues for per-lane rotation vectors; returns 9 row-major
    components, each shaped like w0."""
    n2 = w0 * w0 + w1 * w1 + w2 * w2
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    s = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    c = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / jnp.where(small, 1.0, n2))
    # R = I + s*hat(w) + c*hat(w)^2
    r00 = 1.0 + c * (-(w1 * w1 + w2 * w2))
    r01 = -s * w2 + c * (w0 * w1)
    r02 = s * w1 + c * (w0 * w2)
    r10 = s * w2 + c * (w0 * w1)
    r11 = 1.0 + c * (-(w0 * w0 + w2 * w2))
    r12 = -s * w0 + c * (w1 * w2)
    r20 = -s * w1 + c * (w0 * w2)
    r21 = s * w0 + c * (w1 * w2)
    r22 = 1.0 + c * (-(w0 * w0 + w1 * w1))
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22)


def _exp_se3_lane(b, d):
    """exp(b * d) for per-lane twists d = (w(3), u(3)) as column tuples.
    Returns (R (9-tuple), t (3-tuple))."""
    w0, w1, w2 = b * d[0], b * d[1], b * d[2]
    u0, u1, u2 = b * d[3], b * d[4], b * d[5]
    R = _exp_so3_rows(w0, w1, w2)
    n2 = w0 * w0 + w1 * w1 + w2 * w2
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    A = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    B = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / jnp.where(small, 1.0, n2))
    C = jnp.where(small, 1.0 / 6.0 - n2 / 120.0, (1.0 - A) / jnp.where(small, 1.0, n2))
    # V = I + B hat(w) + C hat(w)^2 ; t = V u
    wxu0 = w1 * u2 - w2 * u1
    wxu1 = w2 * u0 - w0 * u2
    wxu2 = w0 * u1 - w1 * u0
    wxwxu0 = w1 * wxu2 - w2 * wxu1
    wxwxu1 = w2 * wxu0 - w0 * wxu2
    wxwxu2 = w0 * wxu1 - w1 * wxu0
    t0 = u0 + B * wxu0 + C * wxwxu0
    t1 = u1 + B * wxu1 + C * wxwxu1
    t2 = u2 + B * wxu2 + C * wxwxu2
    return R, (t0, t1, t2)


def _matmul3(a, b):
    """3x3 row-major 9-tuples."""
    return (
        a[0] * b[0] + a[1] * b[3] + a[2] * b[6],
        a[0] * b[1] + a[1] * b[4] + a[2] * b[7],
        a[0] * b[2] + a[1] * b[5] + a[2] * b[8],
        a[3] * b[0] + a[4] * b[3] + a[5] * b[6],
        a[3] * b[1] + a[4] * b[4] + a[5] * b[7],
        a[3] * b[2] + a[4] * b[5] + a[5] * b[8],
        a[6] * b[0] + a[7] * b[3] + a[8] * b[6],
        a[6] * b[1] + a[7] * b[4] + a[8] * b[7],
        a[6] * b[2] + a[7] * b[5] + a[8] * b[8],
    )


def _matvec3(a, v):
    return (
        a[0] * v[0] + a[1] * v[1] + a[2] * v[2],
        a[3] * v[0] + a[4] * v[1] + a[5] * v[2],
        a[6] * v[0] + a[7] * v[1] + a[8] * v[2],
    )


def _matvec3_T(a, v):
    return (
        a[0] * v[0] + a[3] * v[1] + a[6] * v[2],
        a[1] * v[0] + a[4] * v[1] + a[7] * v[2],
        a[2] * v[0] + a[5] * v[1] + a[8] * v[2],
    )


def _kernel(
    pts_ref,  # (BLOCK, 4) x,y,z,t
    cps_R_ref,  # (C, 9) control rotations row-major
    cps_t_ref,  # (C, 3)
    logs_ref,  # (C, 6)
    params_ref,  # (1, 16): t0, num_valid, ext_R(9)... packed below
    out_ref,  # (BLOCK, 4) deskewed xyz + ok flag
):
    t0 = params_ref[0, 0]
    num_valid = params_ref[0, 1]
    inv_dt = params_ref[0, 2]

    pts = pts_ref[...]
    x, y, z, t = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]
    rel = (t - t0) * inv_dt
    jf = jnp.floor(rel)
    ok = (jf >= 1.0) & (jf + 2.0 <= num_valid - 1.0)
    j = jnp.clip(jf, 1.0, jnp.maximum(num_valid - 3.0, 1.0)).astype(jnp.int32)
    u = rel - j.astype(rel.dtype)

    b0 = (5.0 + 3.0 * u - 3.0 * u * u + u * u * u) / 6.0
    b1 = (1.0 + 3.0 * u + 3.0 * u * u - 2.0 * u * u * u) / 6.0
    b2 = (u * u * u) / 6.0

    # gather control data via one-hot matmuls (per-lane VMEM gathers do
    # not lower on Mosaic; a (BLOCK, C) x (C, K) dot rides the MXU)
    C = cps_R_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (j.shape[0], C), 1)
    jm = j[:, None]
    f32 = pts.dtype
    oh_m1 = (col == jm - 1).astype(f32)
    oh_0 = (col == jm).astype(f32)
    oh_p1 = (col == jm + 1).astype(f32)

    def dot(oh, table):
        return jax.lax.dot_general(
            oh, table[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    P0R_m = dot(oh_m1, cps_R_ref)  # (BLOCK, 9)
    P0t_m = dot(oh_m1, cps_t_ref)  # (BLOCK, 3)
    d0_m = dot(oh_m1, logs_ref)  # (BLOCK, 6)
    d1_m = dot(oh_0, logs_ref)
    d2_m = dot(oh_p1, logs_ref)
    P0R = tuple(P0R_m[:, k] for k in range(9))
    P0t = tuple(P0t_m[:, k] for k in range(3))
    d0 = tuple(d0_m[:, k] for k in range(6))
    d1 = tuple(d1_m[:, k] for k in range(6))
    d2 = tuple(d2_m[:, k] for k in range(6))

    A0R, A0t = _exp_se3_lane(b0, d0)
    A1R, A1t = _exp_se3_lane(b1, d1)
    A2R, A2t = _exp_se3_lane(b2, d2)

    # pose = P0 * A0 * A1 * A2 (rotations and translations)
    R01 = _matmul3(P0R, A0R)
    t01 = tuple(p + q for p, q in zip(_matvec3(P0R, A0t), P0t))
    R012 = _matmul3(R01, A1R)
    t012 = tuple(p + q for p, q in zip(_matvec3(R01, A1t), t01))
    Rp = _matmul3(R012, A2R)
    tp = tuple(p + q for p, q in zip(_matvec3(R012, A2t), t012))

    # extrinsic + lt frame from params: ext_R rows 3..11, ext_t 12..14 is
    # too small; they're packed in the second row block of params
    eR = tuple(params_ref[0, 3 + k] for k in range(9))
    et = tuple(params_ref[0, 12 + k] for k in range(3))
    lR = tuple(params_ref[1, 0 + k] for k in range(9))
    lt = tuple(params_ref[1, 9 + k] for k in range(3))

    # p_imu = pose (ext p + et) + (tp - lt); then lt^-1, ext^-1
    pe = _matvec3(eR, (x, y, z))
    pe = (pe[0] + et[0], pe[1] + et[1], pe[2] + et[2])
    pw = _matvec3(Rp, pe)
    pw = (pw[0] + tp[0] - lt[0], pw[1] + tp[1] - lt[1], pw[2] + tp[2] - lt[2])
    pl_ = _matvec3_T(lR, pw)
    pl_ = (pl_[0] - et[0], pl_[1] - et[1], pl_[2] - et[2])
    pb = _matvec3_T(eR, pl_)

    okf = ok.astype(pts.dtype)
    out = jnp.stack(
        [
            jnp.where(ok, pb[0], x),
            jnp.where(ok, pb[1], y),
            jnp.where(ok, pb[2], z),
            okf,
        ],
        axis=-1,
    )
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def deskew_points(pts, cps_R, cps_t, logs, t0, num_valid, dt, ext_R, ext_t, lt_R, lt_t, interpret=False):
    """Fused deskew of (N, 4) points [x,y,z,t] to the scan-end LiDAR frame.

    cps_R (C,3,3), cps_t (C,3), logs (C,6) from the spline; ext/lt are the
    extrinsic and scan-end poses (rotation matrices). Returns (N, 4):
    deskewed xyz + ok flag (0 -> point left untouched)."""
    N = pts.shape[0]
    C = cps_R.shape[0]
    dtype = pts.dtype
    pad = (-N) % BLOCK
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))

    params = jnp.zeros((2, 16), dtype)
    params = params.at[0, 0].set(t0)
    params = params.at[0, 1].set(num_valid.astype(dtype) if hasattr(num_valid, "astype") else jnp.asarray(num_valid, dtype))
    params = params.at[0, 2].set(1.0 / dt)
    params = params.at[0, 3:12].set(ext_R.reshape(9))
    params = params.at[0, 12:15].set(ext_t)
    params = params.at[1, 0:9].set(lt_R.reshape(9))
    params = params.at[1, 9:12].set(lt_t)

    grid = (pts_p.shape[0] // BLOCK,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(pts_p.shape, dtype),
        grid=grid,
        # index maps avoid literal 0 coordinates: under x64 a literal 0
        # traces as i64 and Mosaic rejects the mixed-width index tuple
        in_specs=[
            pl.BlockSpec((BLOCK, 4), lambda i: (i, i * 0)),
            pl.BlockSpec((C, 9), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((C, 3), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((C, 6), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((2, 16), lambda i: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, 4), lambda i: (i, i * 0)),
        interpret=interpret,
    )(pts_p, cps_R.reshape(C, 9), cps_t, logs, params)
    return out[:N]
