"""NumPy transliteration of MA-LIO's Barfoot pose-uncertainty compounding
(include/associate_uct.hpp, relative /root/reference/MA_LIO).

Independent oracle: shares no code with malio_tpu.uncertainty.

Convention note: associate_uct.hpp names the top-left 3x3 block "rr", but
the adjoint it builds (adjointMatrix, :8-15) is the SE(3) adjoint for the
[translation; rotation] tangent ordering, so the top block is translation.
The oracle keeps the reference's variable names verbatim regardless.
"""
import numpy as np


class Pose:
    """common_lib.h Pose: quaternion (wxyz here), translation, 4x4 T, cov."""

    def __init__(self, q=None, t=None, cov=None):
        self.q = np.array([1.0, 0, 0, 0]) if q is None else np.asarray(q, float)
        self.t = np.zeros(3) if t is None else np.asarray(t, float)
        self.cov = np.zeros((6, 6)) if cov is None else np.asarray(cov, float)
        self.T = np.eye(4)
        self.T[:3, :3] = _quat_to_mat(self.q)
        self.T[:3, 3] = self.t


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _quat_rot(q, v):
    return _quat_to_mat(q) @ v


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def adjoint_matrix(T):
    """associate_uct.hpp:8-15."""
    AdT = np.zeros((6, 6))
    AdT[:3, :3] = T[:3, :3]
    AdT[:3, 3:] = _skew(T[:3, 3]) @ T[:3, :3]
    AdT[3:, 3:] = T[:3, :3]
    return AdT


def covop1(B):
    """associate_uct.hpp:17-21."""
    return -np.trace(B) * np.eye(3) + B


def covop2(B, C):
    """associate_uct.hpp:23-27."""
    return covop1(B) @ covop1(C) + covop1(C @ B)


def _fourth_order(cov_1_prime, cov_2):
    c1rr = cov_1_prime[:3, :3]
    c1rp = cov_1_prime[:3, 3:]
    c1pp = cov_1_prime[3:, 3:]
    c2rr = cov_2[:3, :3]
    c2rp = cov_2[:3, 3:]
    c2pp = cov_2[3:, 3:]

    A1 = np.zeros((6, 6))
    A1[:3, :3] = covop1(c1pp)
    A1[:3, 3:] = covop1(c1rp + c1rp.T)
    A1[3:, 3:] = covop1(c1pp)

    A2 = np.zeros((6, 6))
    A2[:3, :3] = covop1(c2pp)
    A2[:3, 3:] = covop1(c2rp + c2rp.T)
    A2[3:, 3:] = covop1(c2pp)

    Brr = (
        covop2(c1pp, c2rr)
        + covop2(c1rp.T, c2rp)
        + covop2(c1rp, c2rp.T)
        + covop2(c1rr, c2pp)
    )
    Brp = covop2(c1pp, c2rp.T) + covop2(c1rp.T, c2pp)
    Bpp = covop2(c1pp, c2pp)
    B = np.zeros((6, 6))
    B[:3, :3] = Brr
    B[:3, 3:] = Brp
    B[3:, :3] = Brp.T
    B[3:, 3:] = Bpp

    return (
        cov_1_prime
        + cov_2
        + (A1 @ cov_2 + cov_2 @ A1.T + A2 @ cov_1_prime + cov_1_prime @ A2.T) / 12
        + B / 4
    )


def compound_pose_with_cov(pose_1, pose_2, method=2):
    """associate_uct.hpp:86-132: T_cp = T1 * T2."""
    q = _quat_mul(pose_1.q, pose_2.q)
    t = _quat_rot(pose_1.q, pose_2.t) + pose_1.t
    out = Pose(q, t)
    AdT2 = adjoint_matrix(np.linalg.inv(pose_2.T))
    cov_1_prime = AdT2 @ pose_1.cov @ AdT2.T
    if method == 1:
        out.cov = cov_1_prime + pose_2.cov
    else:
        out.cov = _fourth_order(cov_1_prime, pose_2.cov)
    return out


def compound_inv_pose_with_cov(pose_1, pose_2, method=2):
    """associate_uct.hpp:29-84: T_cp = T1^-1 * T2."""
    q = _quat_mul(_quat_conj(pose_1.q), pose_2.q)
    t = _quat_rot(_quat_conj(pose_1.q), pose_2.t - pose_1.t)
    out = Pose(q, t)
    AdT = adjoint_matrix(np.linalg.inv(out.T))
    cov_1_prime = AdT @ pose_1.cov @ AdT.T
    if method == 1:
        out.cov = cov_1_prime + pose_2.cov
    else:
        out.cov = _fourth_order(cov_1_prime, pose_2.cov)
    return out


def point_to_fs(point4):
    """associate_uct.hpp:134-141."""
    G = np.zeros((4, 6))
    G[:3, :3] = point4[3] * np.eye(3)
    G[:3, 3:] = -_skew(point4[:3])
    return G


def eval_point_uncertainty(p_xyz, pose):
    """associate_uct.hpp:143-165. Returns the 3x3 point covariance."""
    cov_input = np.zeros((9, 9))
    cov_input[:6, :6] = pose.cov * 10000
    cov_input[6:, 6:] = np.eye(3) * 0.1
    distance_weight = 0.05
    point_curr = np.array(
        [p_xyz[0] * distance_weight, p_xyz[1] * distance_weight,
         p_xyz[2] * distance_weight, 1.0]
    )
    T = pose.T
    D = np.zeros((4, 3))
    D[:3, :3] = np.eye(3)
    G = np.zeros((4, 9))
    G[:, :6] = point_to_fs(T @ point_curr)
    G[:, 6:] = T @ D
    cov_point = (G @ cov_input @ G.T)[:3, :3]
    return cov_point
