"""NumPy re-statements of the reference's low-level manifold math, kept
line-faithful to the C++ so the oracle pipeline (ref_esekf / ref_undistort /
ref_h_share) reproduces MA-LIO's numerics exactly.

Sources (path:line relative /root/reference):
  MTK exp / A_matrix / hat:  IKFoM_toolkit/mtk/src/mtkmath.hpp:142-290
  SO3 boxplus/boxminus:      IKFoM_toolkit/mtk/types/SOn.hpp:241-253
  S2 manifold:               IKFoM_toolkit/mtk/types/S2.hpp:97-290
  SE(3) helpers (OpenVINS):  quat_ops.h:190-257

Quaternions here are [w, x, y, z] (matching malio_tpu's convention); the
reference's Eigen quaternions store (x, y, z, w) internally but represent
the same Hamilton rotation, so all algebra below is convention-free once
expressed on rotation matrices.

This module intentionally shares NO code with malio_tpu.geometry — it is
an independent oracle.
"""
import numpy as np

TOL = 1e-11  # MTK::tolerance<double>


def hat(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def mtk_exp_quat(vec, scale=1.0):
    """MTK::exp (mtkmath.hpp:249-256): returns quaternion [w, xyz] of the
    rotation exp(2*scale*vec)... i.e. called with scale=1/2 gives exp(vec)."""
    norm2 = float(np.dot(vec, vec))
    x2 = scale * scale * norm2
    # cos_sinc_sqrt (mtkmath.hpp:142-174)
    if x2 >= np.sqrt(np.sqrt(np.finfo(float).eps)):
        x = np.sqrt(x2)
        cosi, sinc = np.cos(x), np.sin(x) / x
    else:
        inv = [1 / 3.0, 1 / 4.0, 1 / 5.0, 1 / 6.0, 1 / 7.0, 1 / 8.0, 1 / 9.0]
        cosi, sinc = 1.0, 1.0
        term = -0.5 * x2
        for i in range(3):
            cosi += term
            term *= inv[2 * i]
            sinc += term
            term *= -inv[2 * i + 1] * x2
    w = cosi
    xyz = sinc * scale * np.asarray(vec, float)
    return np.concatenate([[w], xyz])


def so3_exp(vec):
    """Rotation quaternion [w,x,y,z] = exp(vec) (SOn.hpp exp with scale=1/2)."""
    return mtk_exp_quat(np.asarray(vec, float), 0.5)


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quat_rot(q, v):
    return quat_to_mat(q) @ np.asarray(v, float)


def quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def so3_log(q):
    """SO3::log (SOn.hpp:330-340 via mtkmath log): rotation vector."""
    w = q[0]
    vec = np.asarray(q[1:], float)
    nv = np.linalg.norm(vec)
    if nv < TOL:
        if w < 0:
            i = int(np.argmax(np.abs(vec)))
            nv2 = np.abs(vec)[i]
            res = np.zeros(3)
            res[i] = 2.0 * np.arctan2(nv2, w)
            return res
        nv = TOL
    return (2.0 / nv * np.arctan2(nv, w)) * vec


def so3_boxplus(q, vec, scale=1.0):
    """SOn.hpp:241-244: q * exp(scale*vec)."""
    return quat_mul(q, mtk_exp_quat(np.asarray(vec, float), scale * 0.5))


def so3_boxminus(q, other):
    """SOn.hpp:245-248: log(other^-1 * q)."""
    return so3_log(quat_mul(quat_conj(other), q))


def A_matrix(v):
    """mtkmath.hpp:268-281."""
    v = np.asarray(v, float)
    sq = float(np.dot(v, v))
    nrm = np.sqrt(sq)
    if nrm < TOL:
        return np.eye(3)
    h = hat(v)
    return (
        np.eye(3)
        + (1 - np.cos(nrm)) / sq * h
        + (1 - np.sin(nrm) / nrm) / sq * (h @ h)
    )


# ---- S2 manifold (gravity), S2_typ=3, length = G (9.81 scaled) ----

def s2_bx(vec, length):
    """S2.hpp:226-241 — the S2_typ == 1 (pole axis x) branch: use-ikfom.hpp
    instantiates MTK::S2<double, 98090, 10000, 1>, and the template order is
    (scalar, den, num, S2_typ), so den=98090, num=10000, typ=1."""
    x, y, z = vec[0], vec[1], vec[2]
    if x + length > TOL:
        res = np.array(
            [
                [-y, -z],
                [length - y * y / (length + x), -z * y / (length + x)],
                [-z * y / (length + x), length - z * z / (length + x)],
            ]
        )
        return res / length
    res = np.zeros((3, 2))
    res[1, 1] = -1.0
    res[2, 0] = 1.0
    return res


def s2_boxplus(vec, delta, length, scale=1.0):
    """S2.hpp:135-141."""
    Bu = s2_bx(vec, length) @ np.asarray(delta, float)
    q = mtk_exp_quat(Bu, scale * 0.5)
    return quat_to_mat(q) @ vec


def s2_oplus(vec, delta3, scale=1.0):
    """S2.hpp:129-134: rotate by exp(scale*delta3)."""
    q = mtk_exp_quat(np.asarray(delta3, float), scale * 0.5)
    return quat_to_mat(q) @ vec


def s2_boxminus(vec, other_vec, length):
    """S2.hpp:143-167 (res = self boxminus other)."""
    v_sin = np.linalg.norm(hat(vec) @ other_vec)
    v_cos = float(vec @ other_vec)
    theta = np.arctan2(v_sin, v_cos)
    if v_sin < TOL:
        if abs(theta) > TOL:
            return np.array([3.1415926, 0.0])
        return np.zeros(2)
    Bx = s2_bx(other_vec, length)
    return theta / v_sin * Bx.T @ (hat(other_vec) @ vec)


def s2_nx_yy(vec, length):
    """S2.hpp:269-274."""
    Bx = s2_bx(vec, length)
    return (1.0 / (length * length)) * Bx.T @ hat(vec)


def s2_mx(vec, delta, length):
    """S2.hpp:276-290."""
    Bx = s2_bx(vec, length)
    delta = np.asarray(delta, float)
    if np.linalg.norm(delta) < TOL:
        return -hat(vec) @ Bx
    Bu = Bx @ delta
    q = mtk_exp_quat(Bu, 0.5)
    return -quat_to_mat(q) @ hat(vec) @ A_matrix(Bu).T @ Bx


def s2_hat(vec):
    return hat(vec)


# ---- SE(3) helpers for the B-spline (quat_ops.h:190-257) ----

def exp_se3(vec):
    """quat_ops.h:190-222: [w(3); u(3)] -> 4x4."""
    w = np.asarray(vec[:3], float)
    u = np.asarray(vec[3:], float)
    theta = np.linalg.norm(w)
    W = hat(w)
    if theta < 1e-7:
        A, B, C = 1.0, 0.5, 1.0 / 6.0
    else:
        A = np.sin(theta) / theta
        B = (1 - np.cos(theta)) / (theta * theta)
        C = (1 - A) / (theta * theta)
    R = np.eye(3) + A * W + B * (W @ W)
    V = np.eye(3) + B * W + C * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ u
    return T


def log_so3_mat(R):
    """quat_ops.h log_so3 (standard trace formula)."""
    tr = np.trace(R)
    cos_t = np.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    theta = np.arccos(cos_t)
    if theta < 1e-10:
        w = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        return w
    if abs(np.pi - theta) < 1e-9:
        # near-pi fallback via quaternion
        q = mat_to_quat(R)
        return so3_log(q)
    return theta / (2.0 * np.sin(theta)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def log_se3(T):
    """quat_ops.h:224-250."""
    w = log_so3_mat(T[:3, :3])
    Tv = T[:3, 3]
    t = np.linalg.norm(w)
    if t < 1e-10:
        return np.concatenate([w, Tv])
    W = hat(w / t)
    Tan = np.tan(0.5 * t)
    WT = W @ Tv
    u = Tv - (0.5 * t) * WT + (1 - t / (2 * Tan)) * (W @ WT)
    return np.concatenate([w, u])


def inv_se3(T):
    Ti = np.eye(4)
    Ti[:3, :3] = T[:3, :3].T
    Ti[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return Ti


def mat_to_quat(R):
    """Rotation matrix -> [w,x,y,z] (Shepperd)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)
