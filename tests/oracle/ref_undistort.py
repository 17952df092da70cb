"""NumPy transliteration of ImuProcess::UndistortPcl
(src/IMU_Processing.hpp:210-523, relative /root/reference/MA_LIO).

Independent oracle driving RefEsekf / RefBsplineSE3 / ref_uncertainty —
shares no code with malio_tpu.propagate. Sequential Python lists stand in
for the reference's std::vector state (traj_points, imu_cov).

Conventions:
  * times are absolute f64 seconds (the reference's convention);
  * clouds arrive as meas["lidar_multi"][i] sorted ASCENDING by scan end
    time (sync_packages sorts by time_buffer, laserMapping.cpp:325-343),
    each row [x, y, z, t_offset_ms] with curvature = offset in ms from the
    cloud's own beg time (preprocess convention);
  * the oracle mutates the cloud copies exactly like the C++: the loop
    ``for (; it_pcl != begin(); it_pcl--)`` never touches the FIRST
    (earliest-time) point, which keeps raw coordinates and intensity.
"""
import numpy as np

from .ref_esekf import RefEsekf
from .ref_spline import RefBsplineSE3
from .ref_uncertainty import (
    Pose,
    compound_pose_with_cov,
    compound_inv_pose_with_cov,
)

G_M_S2 = 9.81  # common_lib.h:20


def _traj_row(t, pos, q_wxyz):
    """traj_point << t, pos, rot.x, rot.y, rot.z, rot.w (IMU_Processing.hpp:267)."""
    return np.array(
        [t, pos[0], pos[1], pos[2], q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]]
    )


class RefImuProcess:
    def __init__(self, L, Q, mean_acc_norm):
        self.L = L
        self.Q = np.asarray(Q, float)
        self.mean_acc_norm = float(mean_acc_norm)
        self.traj_points = []  # list of 8-vec rows
        self.imu_cov = []  # list of (t, cov6, in6) — ((t, cov), in) in C++
        self.last_imu_ = None  # 7-vec [t, gyro, acc]
        self.last_lidar_end_time_ = 0.0
        self.last_in = np.zeros(6)  # [acc(3)? no: input_ikfom = (acc, gyro)]
        # input_ikfom stores (acc, gyro); keep that order: in6 = [acc, gyro]

    def undistort(self, meas, kf: RefEsekf):
        """Returns a dict with the deskewed clouds (base-first order like
        feats_undistort_vec), per-point epoch indices, temporal_comp poses,
        lidar_uncertainty chains, and lt_lidar_frame poses."""
        L = self.L
        Q = self.Q
        spline = RefBsplineSE3()

        kf.propagate_cov()
        kf.prepare_back()

        v_imu = [self.last_imu_] + [np.asarray(r, float) for r in meas["imu"]]
        c_imu = [np.asarray(r, float) for r in meas["imu_cont"]]
        lid_num = L
        imu_beg_time = v_imu[0][0]
        imu_end_time = v_imu[-1][0]
        pcl_beg_time = meas["lidar_beg_time"][0]
        pcl_end_time = meas["lidar_end_time"][lid_num - 1]

        # sort clouds by offset time; feats[num] = lidar_multi[L-num-1]
        feats = []
        for num in range(lid_num):
            cloud = np.array(meas["lidar_multi"][lid_num - num - 1], float)
            order = np.argsort(cloud[:, 3], kind="stable")
            feats.append(cloud[order])
        epoch_idx = [np.full(len(f), -10, np.int64) for f in feats]

        # ---- trim history (IMU_Processing.hpp:235-261) ----
        while self.traj_points and self.traj_points[0][0] + 0.2 < pcl_beg_time:
            self.traj_points.pop(0)
            self.imu_cov.pop(0)
        while self.traj_points and self.traj_points[-1][0] > imu_beg_time:
            self.traj_points.pop()
            self.imu_cov.pop()

        # ---- seed with the optimized pose at the previous scan end ----
        imu_state = kf.x_
        if self.last_lidar_end_time_ != 0:
            self.traj_points.append(
                _traj_row(self.last_lidar_end_time_, imu_state.pos, imu_state.rot)
            )
            self.imu_cov.append(
                (self.last_lidar_end_time_, kf.get_U(), self.last_in.copy())
            )

        # ---- back propagation (IMU_Processing.hpp:275-292) ----
        for i in range(len(self.imu_cov) - 1, 1, -1):
            dt = self.imu_cov[i - 1][0] - self.imu_cov[i][0]
            in_i = self.imu_cov[i][2]
            back_state = kf.back_predict(dt, Q, acc=in_i[:3], gyro=in_i[3:])
            state_cov = kf.get_U()
            t_i, _, _ = self.imu_cov[i - 1]
            row = self.traj_points[i - 1]
            row[1:4] = back_state.pos
            row[4:7] = back_state.rot[1:]
            row[7] = back_state.rot[0]
            self.imu_cov[i - 1] = (t_i, state_cov, self.imu_cov[i - 1][2])

        # ---- forward propagation (:295-347) ----
        imu_meas = None
        for head, tail in zip(v_imu[:-1], v_imu[1:]):
            if tail[0] < self.last_lidar_end_time_:
                continue
            angvel_avr = 0.5 * (head[1:4] + tail[1:4])
            acc_avr = 0.5 * (head[4:7] + tail[4:7]) * G_M_S2 / self.mean_acc_norm
            if head[0] < self.last_lidar_end_time_:
                dt = tail[0] - self.last_lidar_end_time_
            else:
                dt = tail[0] - head[0]
            kf.predict(dt, Q, acc=acc_avr, gyro=angvel_avr)
            imu_state = kf.x_
            self.traj_points.append(_traj_row(tail[0], imu_state.pos, imu_state.rot))
            state_cov = kf.get_uncertainty()
            in6 = np.concatenate([acc_avr, angvel_avr])
            self.imu_cov.append((tail[0], state_cov, in6))
            imu_meas = tail.copy()

        kf.propagate_cov()
        kf.prepare_cont()

        # ---- continuation on future IMU (:352-389) ----
        for head, tail in zip(c_imu[:-1], c_imu[1:]):
            angvel_avr = 0.5 * (head[1:4] + tail[1:4])
            acc_avr = 0.5 * (head[4:7] + tail[4:7]) * G_M_S2 / self.mean_acc_norm
            dt = tail[0] - head[0]
            x_cont = kf.predict_cont(dt, Q, acc=acc_avr, gyro=angvel_avr)
            self.traj_points.append(_traj_row(tail[0], x_cont.pos, x_cont.rot))
            state_cov = kf.get_U()
            in6 = np.concatenate([acc_avr, angvel_avr])
            self.imu_cov.append((tail[0], state_cov, in6))

        spline.feed_trajectory(list(self.traj_points))

        # ---- final partial-dt predict to the group end (:393-409) ----
        c_rest = c_imu[1:]  # c_imu.pop_front()
        ratio = (pcl_end_time - imu_meas[0]) / (c_rest[0][0] - imu_meas[0])
        angvel_avr = ratio * imu_meas[1:4] + (1 - ratio) * c_rest[0][1:4]
        acc_avr = ratio * imu_meas[4:7] + (1 - ratio) * c_rest[0][4:7]
        acc_avr = acc_avr * G_M_S2 / self.mean_acc_norm
        dt = pcl_end_time - imu_end_time
        kf.predict(dt, Q, acc=acc_avr, gyro=angvel_avr)

        imu_state = kf.x_
        self.last_in = np.concatenate([acc_avr, angvel_avr])
        self.last_imu_ = np.asarray(meas["imu"][-1], float)
        self.last_lidar_end_time_ = pcl_end_time

        # ---- lt frames, extrinsics (:416-472) ----
        lt_quat = [None] * lid_num
        lt_trans = [None] * lid_num
        lt_lidar_frame = [None] * lid_num
        extrinsic = [None] * lid_num
        ok, q0, t0 = spline.get_pose(pcl_end_time)
        if not ok:
            lt_quat[0] = imu_state.rot.copy()
            lt_trans[0] = imu_state.pos.copy()
        else:
            lt_quat[0], lt_trans[0] = q0, t0
            kf.change_pos(q0, t0)

        ext_q, ext_t = [], []
        for num in range(lid_num):
            ext_t.append(kf.x_.ext_t[num].copy())
            ext_q.append(kf.x_.ext_r[num].copy())
            extrinsic[num] = Pose(ext_q[num], ext_t[num],
                                  kf.get_extrinsic_uncertainty(num))
        lt_lidar_frame[0] = Pose(lt_quat[0], lt_trans[0], kf.get_uncertainty())

        uncertainty = [[] for _ in range(lid_num)]
        for num in range(lid_num):
            cov_pointer = len(self.imu_cov) - 1
            end_t_num = meas["lidar_end_time"][lid_num - num - 1]
            while True:
                if self.imu_cov[cov_pointer][0] > end_t_num:
                    cov_pointer -= 1
                else:
                    cov_pointer += 1
                    break

            if num != 0:
                ok, qn, tn = spline.get_pose(end_t_num)
                lt_quat[num], lt_trans[num] = qn, tn
                lt_lidar_frame[num] = Pose(qn, tn, self.imu_cov[cov_pointer][1])

            beg_t_num = meas["lidar_beg_time"][lid_num - num - 1]
            idx = -1
            cloud = feats[num]
            # it_pcl from end()-1 down to begin()+1 (begin() never processed)
            for pi in range(len(cloud) - 1, 0, -1):
                point_t = cloud[pi, 3] / 1000.0 + beg_t_num
                ok, pt_q, pt_t = spline.get_pose(point_t)
                if self.imu_cov[cov_pointer][0] > point_t:
                    cov_pointer -= 1
                    pt_imu_frame = Pose(pt_q, pt_t, self.imu_cov[cov_pointer + 1][1])
                    pos_calc = compound_pose_with_cov(pt_imu_frame, extrinsic[num])
                    pos_calc = compound_inv_pose_with_cov(lt_lidar_frame[num], pos_calc)
                    pos_calc = compound_inv_pose_with_cov(extrinsic[num], pos_calc)
                    uncertainty[num].append(pos_calc)
                    idx += 1

                if ok:
                    P_i = cloud[pi, :3].copy()
                    T_ei = pt_t - lt_trans[num]
                    eq, et = ext_q[num], ext_t[num]
                    p_imu = _qrot(pt_q, _qrot(eq, P_i) + et) + T_ei
                    P_comp = _qrot_inv(eq, _qrot_inv(lt_quat[num], p_imu) - et)
                    cloud[pi, :3] = P_comp
                    epoch_idx[num][pi] = idx

        temporal_comp = []
        lidar_uncertainty = []
        for num in range(lid_num):
            if num == 0:
                lidar_uncertainty.append(uncertainty[0])
            else:
                tc = compound_inv_pose_with_cov(lt_lidar_frame[0], lt_lidar_frame[num])
                temporal_comp.append(tc)
                lidar_uncertainty.append(uncertainty[num])

        return dict(
            feats=feats,
            epoch_idx=epoch_idx,
            temporal_comp=temporal_comp,
            lidar_uncertainty=lidar_uncertainty,
            lt_lidar_frame=lt_lidar_frame,
            extrinsic=extrinsic,
        )


def _qrot(q, v):
    w, x, y, z = q
    uv = 2.0 * np.cross(q[1:], v)
    return v + w * uv + np.cross(q[1:], uv)


def _qrot_inv(q, v):
    return _qrot(np.array([q[0], -q[1], -q[2], -q[3]]), v)
