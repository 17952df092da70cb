"""Trajectory evaluation: ATE/RPE + TUM-format IO.

The reference writes `Log/trajectory.txt` as `t x y z qx qy qz qw`
(laserMapping.cpp:1070-1071) and compares against each dataset's
Groundtruth.txt with external evo-style tooling; this module provides that
tooling in-repo."""
from __future__ import annotations

import numpy as np


def write_tum(path, t, pos, quat_wxyz):
    """TUM format: t x y z qx qy qz qw."""
    with open(path, "w") as f:
        for ti, p, q in zip(t, pos, quat_wxyz):
            f.write(
                f"{ti:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
            )


def read_tum(path):
    data = np.loadtxt(path)
    t = data[:, 0]
    pos = data[:, 1:4]
    qxyzw = data[:, 4:8]
    quat_wxyz = np.concatenate([qxyzw[:, 3:4], qxyzw[:, :3]], axis=1)
    return t, pos, quat_wxyz


def associate(t_a, t_b, max_dt=0.02):
    """Match timestamps; returns index pairs."""
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(t_a):
        j = int(np.searchsorted(t_b, ta))
        best, bdt = None, max_dt
        for k in (j - 1, j, j + 1):
            if 0 <= k < len(t_b):
                dt = abs(t_b[k] - ta)
                if dt < bdt:
                    best, bdt = k, dt
        if best is not None:
            ia.append(i)
            ib.append(best)
    return np.asarray(ia, int), np.asarray(ib, int)


def umeyama_se3(src, dst):
    """Best-fit SE(3) (no scale) aligning src -> dst."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    S = (dst - mu_d).T @ (src - mu_s) / src.shape[0]
    U, _, Vt = np.linalg.svd(S)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return R, t


def ate_rmse(est_pos, gt_pos, align=True):
    """Absolute trajectory error RMSE over matched positions."""
    if align:
        R, t = umeyama_se3(est_pos, gt_pos)
        est_pos = est_pos @ R.T + t
    err = est_pos - gt_pos
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def rpe_rmse(est_pos, gt_pos, delta=10):
    """Relative pose (translation) error over a fixed frame delta."""
    n = min(len(est_pos), len(gt_pos)) - delta
    if n <= 0:
        return float("nan")
    de = est_pos[delta : delta + n] - est_pos[:n]
    dg = gt_pos[delta : delta + n] - gt_pos[:n]
    err = np.linalg.norm(de, axis=1) - np.linalg.norm(dg, axis=1)
    return float(np.sqrt((err**2).mean()))
