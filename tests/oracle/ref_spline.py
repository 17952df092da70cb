"""NumPy transliteration of ov_core::BsplineSE3 as used by MA-LIO
(reference BsplineSE3.cpp, include/BsplineSE3.h — paths relative
/root/reference/MA_LIO).

Independent oracle: shares no code with malio_tpu.spline. Keeps the
reference's quirks verbatim:

  * dt is forced to 0.01 s regardless of the trajectory's average spacing
    (BsplineSE3.cpp:33-34: ``dt = (dt < 0.01) ? 0.01 : 0.01``);
  * the LAST trajectory point is dropped when building the pose map
    (BsplineSE3.cpp:39 loops to size-1);
  * traj rows are [t, p(3), q(xyzw)]; quat_2_Rot (JPL, quat_ops.h:87-92)
    then .transpose() yields the Hamilton ItoG rotation, so control points
    are T_ItoG;
  * get_pose needs two control points on each side (find_bounding_control
    _points) and returns False outside that support.
"""
import bisect

import numpy as np

from .ref_math import exp_se3, log_se3, inv_se3, mat_to_quat


def quat_2_rot_jpl(q_xyzw):
    """quat_ops.h:87-92 (JPL): R = (2w^2-1) I - 2w [v]x + 2 v v^T."""
    v = np.asarray(q_xyzw[:3], float)
    w = float(q_xyzw[3])
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])
    return (2 * w * w - 1) * np.eye(3) - 2 * w * vx + 2 * np.outer(v, v)


class RefBsplineSE3:
    def __init__(self):
        self.ts = []  # sorted control-point timestamps
        self.cps = []  # 4x4 T_ItoG control poses
        self.dt = 0.01

    def feed_trajectory(self, traj_points):
        """traj_points: list of length-8 arrays [t, p(3), q(xyzw)]
        (BsplineSE3.cpp:26-82)."""
        traj_points = [np.asarray(tp, float) for tp in traj_points]
        self.ts, self.cps = [], []
        if len(traj_points) < 2:
            return
        sumdt = sum(
            traj_points[i + 1][0] - traj_points[i][0]
            for i in range(len(traj_points) - 1)
        )
        dt = sumdt / (len(traj_points) - 1)
        dt = 0.01 if dt < 0.01 else 0.01  # the reference's verbatim quirk
        self.dt = dt

        # convert to SE(3), dropping the last point (loop to size-1);
        # std::map keying dedups identical timestamps (last insert is a
        # no-op for duplicates -> first wins with map::insert)
        traj_t, traj_T = [], []
        seen = set()
        for tp in traj_points[:-1]:
            t = float(tp[0])
            if t in seen:
                continue  # map::insert keeps the existing entry
            seen.add(t)
            T = np.eye(4)
            T[:3, :3] = quat_2_rot_jpl(tp[4:8]).T
            T[:3, 3] = tp[1:4]
            traj_t.append(t)
            traj_T.append(T)
        order = np.argsort(traj_t, kind="stable")
        traj_t = [traj_t[i] for i in order]
        traj_T = [traj_T[i] for i in order]
        if not traj_t:
            return

        t_min = traj_t[0]
        t_curr = t_min
        while True:
            ok, t0, T0, t1, T1 = _find_bounding_poses(t_curr, traj_t, traj_T)
            if not ok:
                break
            lam = (t_curr - t0) / (t1 - t0)
            T_interp = exp_se3(lam * log_se3(T1 @ inv_se3(T0))) @ T0
            self.ts.append(t_curr)
            self.cps.append(T_interp)
            t_curr += dt

    def get_pose(self, timestamp):
        """Returns (ok, q_wxyz, p). BsplineSE3.cpp:86-118."""
        ok, T0, T1, T2, T3, t1, t2 = _find_bounding_control_points(
            timestamp, self.ts, self.cps
        )
        if not ok:
            return False, np.array([1.0, 0, 0, 0]), np.zeros(3)
        DT = t2 - t1
        u = (timestamp - t1) / DT
        b0 = 1.0 / 6.0 * (5 + 3 * u - 3 * u * u + u * u * u)
        b1 = 1.0 / 6.0 * (1 + 3 * u + 3 * u * u - 2 * u * u * u)
        b2 = 1.0 / 6.0 * (u * u * u)
        A0 = exp_se3(b0 * log_se3(inv_se3(T0) @ T1))
        A1 = exp_se3(b1 * log_se3(inv_se3(T1) @ T2))
        A2 = exp_se3(b2 * log_se3(inv_se3(T2) @ T3))
        Tp = T0 @ A0 @ A1 @ A2
        return True, mat_to_quat(Tp[:3, :3]), Tp[:3, 3].copy()


def _find_bounding_poses(timestamp, ts, Ts):
    """BsplineSE3.cpp:121-171 over a sorted list (== std::map iteration)."""
    lo = bisect.bisect_left(ts, timestamp)  # lower_bound
    hi = bisect.bisect_right(ts, timestamp)  # upper_bound
    found_older = False
    older = -1
    if lo != len(ts):
        if ts[lo] == timestamp:
            found_older = True
            older = lo
        elif lo != 0:
            older = lo - 1
            found_older = True
    found_newer = hi != len(ts)
    if found_older and found_newer:
        return True, ts[older], Ts[older], ts[hi], Ts[hi]
    return False, -1.0, np.eye(4), -1.0, np.eye(4)


def _find_bounding_control_points(timestamp, ts, Ts):
    """BsplineSE3.cpp:174-229: the two bounding poses plus one older and
    one newer."""
    ok, t1, T1, t2, T2 = _find_bounding_poses(timestamp, ts, Ts)
    if not ok:
        return False, None, None, None, None, -1.0, -1.0
    i1 = ts.index(t1)
    i2 = ts.index(t2)
    if i1 == 0:
        return False, None, None, None, None, -1.0, -1.0
    i0 = i1 - 1
    i3 = i2 + 1
    if i3 == len(ts):
        return False, None, None, None, None, -1.0, -1.0
    return True, Ts[i0], T1, T2, Ts[i3], t1, t2
