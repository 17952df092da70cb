"""NumPy transliteration of the reference's iterated ESKF propagation
machinery (include/IKFoM_toolkit/esekfom/esekfom.hpp + src/use-ikfom.hpp,
paths relative /root/reference/MA_LIO).

Independent oracle: shares no code with malio_tpu.filter. The state layout
is the MTK_BUILD_MANIFOLD of use-ikfom.hpp:14-27, generalized to L LiDARs:

  tangent (n = 17+6L)              flatted (m = 18+6L)
  pos      0:3                     0:3
  rot      3:6                     3:6
  offset_R_l  6+3l : 9+3l          same
  offset_T_l  6+3L+3l : ...        same
  vel      6+6L : 9+6L             same
  bg       9+6L : 12+6L            same
  ba       12+6L : 15+6L           same
  grav     15+6L : 17+6L (2 DOF)   15+6L : 18+6L (3 dims)

Quaternions are [w, x, y, z] Hamilton (the reference's Eigen quaternions
hold the same rotations with xyzw storage).
"""
import copy

import numpy as np

from . import ref_math as rm

S2_LENGTH = 98090.0 / 10000.0  # MTK::S2<double, 98090, 10000, 1>, use-ikfom.hpp:8


class RefState:
    """state_ikfom for L LiDARs."""

    def __init__(self, L):
        self.L = L
        self.pos = np.zeros(3)
        self.rot = np.array([1.0, 0, 0, 0])
        self.ext_r = [np.array([1.0, 0, 0, 0]) for _ in range(L)]
        self.ext_t = [np.zeros(3) for _ in range(L)]
        self.vel = np.zeros(3)
        self.bg = np.zeros(3)
        self.ba = np.zeros(3)
        self.grav = np.array([0.0, 0.0, -S2_LENGTH])

    def copy(self):
        return copy.deepcopy(self)

    # manifold segment tables, as built by build_*_state (esekfom.hpp:165-167
    # via the MTK macro): (idx = tangent start, dim = flatted start)
    def vect_state(self):
        L = self.L
        segs = [(0, 0, 3)]  # pos
        for l in range(L):
            segs.append((6 + 3 * L + 3 * l, 6 + 3 * L + 3 * l, 3))  # offset_T_l
        base = 6 + 6 * L
        segs += [(base, base, 3), (base + 3, base + 3, 3), (base + 6, base + 6, 3)]
        return segs

    def so3_state(self):
        L = self.L
        return [(3, 3)] + [(6 + 3 * l, 6 + 3 * l) for l in range(L)]

    def s2_state(self):
        L = self.L
        return [(15 + 6 * L, 15 + 6 * L)]

    def oplus(self, f, dt):
        """MTK manifold oplus with a flatted (m,) vector and scale dt."""
        L = self.L
        self.pos = self.pos + f[0:3] * dt
        self.rot = rm.so3_boxplus(self.rot, f[3:6], dt)
        for l in range(L):
            self.ext_r[l] = rm.so3_boxplus(self.ext_r[l], f[6 + 3 * l : 9 + 3 * l], dt)
            o = 6 + 3 * L + 3 * l
            self.ext_t[l] = self.ext_t[l] + f[o : o + 3] * dt
        b = 6 + 6 * L
        self.vel = self.vel + f[b : b + 3] * dt
        self.bg = self.bg + f[b + 3 : b + 6] * dt
        self.ba = self.ba + f[b + 6 : b + 9] * dt
        self.grav = rm.s2_oplus(self.grav, f[b + 9 : b + 12], dt)

    def boxplus(self, dx):
        """Tangent (n,) boxplus — used by the update."""
        L = self.L
        self.pos = self.pos + dx[0:3]
        self.rot = rm.so3_boxplus(self.rot, dx[3:6])
        for l in range(L):
            self.ext_r[l] = rm.so3_boxplus(self.ext_r[l], dx[6 + 3 * l : 9 + 3 * l])
            o = 6 + 3 * L + 3 * l
            self.ext_t[l] = self.ext_t[l] + dx[o : o + 3]
        b = 6 + 6 * L
        self.vel = self.vel + dx[b : b + 3]
        self.bg = self.bg + dx[b + 3 : b + 6]
        self.ba = self.ba + dx[b + 6 : b + 9]
        self.grav = rm.s2_boxplus(self.grav, dx[b + 9 : b + 11], S2_LENGTH)

    def boxminus(self, other):
        """self (-) other -> (n,) tangent."""
        L = self.L
        n = 17 + 6 * L
        dx = np.zeros(n)
        dx[0:3] = self.pos - other.pos
        dx[3:6] = rm.so3_boxminus(self.rot, other.rot)
        for l in range(L):
            dx[6 + 3 * l : 9 + 3 * l] = rm.so3_boxminus(
                self.ext_r[l], other.ext_r[l]
            )
            o = 6 + 3 * L + 3 * l
            dx[o : o + 3] = self.ext_t[l] - other.ext_t[l]
        b = 6 + 6 * L
        dx[b : b + 3] = self.vel - other.vel
        dx[b + 3 : b + 6] = self.bg - other.bg
        dx[b + 6 : b + 9] = self.ba - other.ba
        dx[b + 9 : b + 11] = rm.s2_boxminus(self.grav, other.grav, S2_LENGTH)
        return dx


def get_f(s, acc, gyro):
    """use-ikfom.hpp:71-85."""
    L = s.L
    m = 18 + 6 * L
    res = np.zeros(m)
    omega = gyro - s.bg
    a_inertial = rm.quat_rot(s.rot, acc - s.ba)
    res[0:3] = s.vel
    res[3:6] = omega
    res[6 * (L + 1) : 6 * (L + 1) + 3] = a_inertial + s.grav
    return res


def df_dx(s, acc, gyro):
    """use-ikfom.hpp:87-104 -> (m, n)."""
    L = s.L
    m = 18 + 6 * L
    n = m - 1
    cov = np.zeros((m, n))
    cov[0:3, 6 * (L + 1) : 6 * (L + 1) + 3] = np.eye(3)
    acc_ = acc - s.ba
    cov[6 * (L + 1) : 6 * (L + 1) + 3, 3:6] = -rm.quat_to_mat(s.rot) @ rm.hat(acc_)
    cov[6 * (L + 1) : 6 * (L + 1) + 3, 6 * (L + 2) : 6 * (L + 2) + 3] = -rm.quat_to_mat(
        s.rot
    )
    grav_matrix = rm.s2_mx(s.grav, np.zeros(2), S2_LENGTH)
    cov[6 * (L + 1) : 6 * (L + 1) + 3, 6 * (L + 2) + 3 : 6 * (L + 2) + 5] = grav_matrix
    cov[3:6, 6 * (L + 1) + 3 : 6 * (L + 1) + 6] = -np.eye(3)
    return cov


def df_dw(s, acc, gyro):
    """use-ikfom.hpp:107-116 -> (m, 12); noise order [ng, na, nbg, nba]."""
    L = s.L
    m = 18 + 6 * L
    cov = np.zeros((m, 12))
    cov[6 * (L + 1) : 6 * (L + 1) + 3, 3:6] = -rm.quat_to_mat(s.rot)
    cov[3:6, 0:3] = -np.eye(3)
    cov[6 * (L + 1) + 3 : 6 * (L + 1) + 6, 6:9] = np.eye(3)
    cov[6 * (L + 2) : 6 * (L + 2) + 3, 9:12] = np.eye(3)
    return cov


def predict_core(x, P, dt, Q, acc, gyro):
    """The shared body of esekfom predict / back_predict / predict_cont
    (esekfom.hpp:388-492 / :279-385 / :171-277 — the three are verbatim
    copies differing only in which stored state they mutate).

    Mutates x in place (oplus) and returns the new covariance."""
    L = x.L
    m = 18 + 6 * L
    n = m - 1
    f_ = get_f(x, acc, gyro)
    f_x_ = df_dx(x, acc, gyro)
    f_w_ = df_dw(x, acc, gyro)
    x_before = x.copy()
    x.oplus(f_, dt)

    F_x1 = np.eye(n)
    f_x_final = np.zeros((n, n))
    f_w_final = np.zeros((n, 12))
    for idx, dim, dof in x.vect_state():
        f_x_final[idx : idx + dof, :] = f_x_[dim : dim + dof, :]
        f_w_final[idx : idx + dof, :] = f_w_[dim : dim + dof, :]
    for idx, dim in x.so3_state():
        seg_so3 = -1.0 * f_[dim : dim + 3] * dt
        res_q = rm.mtk_exp_quat(seg_so3, 0.5)
        F_x1[idx : idx + 3, idx : idx + 3] = rm.quat_to_mat(res_q)
        A = rm.A_matrix(seg_so3)
        f_x_final[idx : idx + 3, :] = A @ f_x_[dim : dim + 3, :]
        f_w_final[idx : idx + 3, :] = A @ f_w_[dim : dim + 3, :]
    for idx, dim in x.s2_state():
        seg_s2 = f_[dim : dim + 3] * dt
        res_q = rm.mtk_exp_quat(seg_s2, 0.5)
        R_res = rm.quat_to_mat(res_q)
        Nx = rm.s2_nx_yy(x.grav, S2_LENGTH)  # on x_ AFTER oplus
        Mx = rm.s2_mx(x_before.grav, np.zeros(2), S2_LENGTH)  # on x_before
        F_x1[idx : idx + 2, idx : idx + 2] = Nx @ R_res @ Mx
        x_before_hat = rm.s2_hat(x_before.grav)
        temp = -Nx @ R_res @ x_before_hat @ rm.A_matrix(seg_s2).T
        f_x_final[idx : idx + 2, :] = temp @ f_x_[dim : dim + 3, :]
        f_w_final[idx : idx + 2, :] = temp @ f_w_[dim : dim + 3, :]

    F = F_x1 + f_x_final * dt
    P_new = F @ P @ F.T + (dt * f_w_final) @ Q @ (dt * f_w_final).T
    return P_new


class RefEsekf:
    """esekfom::esekf with the three parallel propagation tracks:
    (x_, P_) main, (x_unc, P_unc_) backward, (x_cont, P_unc_) continuation
    (esekfom.hpp:739-757)."""

    def __init__(self, L):
        self.L = L
        self.x_ = RefState(L)
        n = 17 + 6 * L
        self.P_ = np.eye(n)
        self.x_unc = RefState(L)
        self.x_cont = RefState(L)
        self.P_unc_ = np.eye(n)

    def predict(self, dt, Q, acc, gyro):
        """esekfom.hpp:388-492."""
        self.P_ = predict_core(self.x_, self.P_, dt, Q, acc, gyro)

    def back_predict(self, dt, Q, acc, gyro):
        """esekfom.hpp:279-385: runs on (x_unc, P_unc_)."""
        self.P_unc_ = predict_core(self.x_unc, self.P_unc_, dt, Q, acc, gyro)
        return self.x_unc

    def predict_cont(self, dt, Q, acc, gyro):
        """esekfom.hpp:171-277: runs on (x_cont, P_unc_)."""
        self.P_unc_ = predict_core(self.x_cont, self.P_unc_, dt, Q, acc, gyro)
        return self.x_cont

    def prepare_back(self):
        self.x_unc = self.x_.copy()  # esekfom.hpp:739-741

    def prepare_cont(self):
        self.x_cont = self.x_.copy()  # esekfom.hpp:743-745

    def propagate_cov(self):
        self.P_unc_ = self.P_.copy()  # esekfom.hpp:747-750

    def get_uncertainty(self):
        """esekfom.hpp:760-767: top-left 6x6 of P_ ([trans; rot] order)."""
        return self.P_[:6, :6].copy()

    def get_U(self):
        """esekfom.hpp:769-776: top-left 6x6 of P_unc_."""
        return self.P_unc_[:6, :6].copy()

    def get_extrinsic_uncertainty(self, num):
        """esekfom.hpp:778-786 ([trans; rot] order for LiDAR num)."""
        L = self.L
        it = 6 + 3 * (L + num)  # offset_T_num
        ir = 6 + 3 * num  # offset_R_num
        U = np.zeros((6, 6))
        U[:3, :3] = self.P_[it : it + 3, it : it + 3]
        U[:3, 3:] = self.P_[it : it + 3, ir : ir + 3]
        U[3:, 3:] = self.P_[ir : ir + 3, ir : ir + 3]
        U[3:, :3] = self.P_[ir : ir + 3, it : it + 3]
        return U

    def change_pos(self, q, t):
        """esekfom.hpp:788-796."""
        self.x_.rot = np.asarray(q, float)
        self.x_.pos = np.asarray(t, float)

    def change_ext(self, idx, last_idx):
        """esekfom.hpp:810-861: permute extrinsic slots when the scan
        arrival (end-time) order changes between rounds. The reference
        rebuilds P from identity copying only pose/tail blocks, the
        permuted ext_R cross rows, and the permuted ext diagonal blocks —
        the ext_T x pose/tail and ext_R x ext_T cross-covariances are
        DROPPED (this is the information the fixed-physical-slot design
        of malio_tpu.state retains)."""
        L = self.L
        n = 17 + 6 * L
        # vect_state_ptr[1+num] / SO3_state_ptr[1+num] = ext slot num;
        # the reference reads ptr[lid_num - num] = slot L-1-num
        ext_rot_vec = [self.x_.ext_r[L - 1 - num].copy() for num in range(L)]
        ext_pos_vec = [self.x_.ext_t[L - 1 - num].copy() for num in range(L)]

        P = self.P_
        tmp_P = np.eye(n)
        tl = 6 + L * 6  # tail start (vel..grav, 11 rows)
        tmp_P[0:6, 0:6] = P[0:6, 0:6]
        tmp_P[tl : tl + 11, tl : tl + 11] = P[tl : tl + 11, tl : tl + 11]
        tmp_P[tl : tl + 11, 0:6] = P[tl : tl + 11, 0:6]
        tmp_P[0:6, tl : tl + 11] = P[0:6, tl : tl + 11]

        ext_rot_rearr = [None] * L
        ext_pos_rearr = [None] * L
        line = []
        for i in range(L):
            for j in range(L):
                if last_idx[i] == idx[j]:
                    ext_rot_rearr[j] = ext_rot_vec[i]
                    ext_pos_rearr[j] = ext_pos_vec[i]
                    line.append(j)

        for num in range(L):
            tmp_P[6 + 3 * num : 9 + 3 * num, 0:6] = P[
                6 + 3 * line[num] : 9 + 3 * line[num], 0:6
            ]
            tmp_P[6 + 3 * num : 9 + 3 * num, tl : tl + 11] = P[
                6 + 3 * line[num] : 9 + 3 * line[num], tl : tl + 11
            ]
            tmp_P[0:6, 6 + 3 * num : 9 + 3 * num] = P[
                0:6, 6 + 3 * line[num] : 9 + 3 * line[num]
            ]
            tmp_P[tl : tl + 11, 6 + 3 * num : 9 + 3 * num] = P[
                tl : tl + 11, 6 + 3 * line[num] : 9 + 3 * line[num]
            ]

        for ni in range(L):
            for nj in range(L):
                tmp_P[6 + 3 * ni : 9 + 3 * ni, 6 + 3 * nj : 9 + 3 * nj] = P[
                    6 + 3 * line[ni] : 9 + 3 * line[ni],
                    6 + 3 * line[nj] : 9 + 3 * line[nj],
                ]
                tmp_P[
                    6 + 3 * (L + ni) : 9 + 3 * (L + ni),
                    6 + 3 * (L + nj) : 9 + 3 * (L + nj),
                ] = P[
                    6 + 3 * (L + line[ni]) : 9 + 3 * (L + line[ni]),
                    6 + 3 * (L + line[nj]) : 9 + 3 * (L + line[nj]),
                ]

        for num in range(L):
            self.x_.ext_t[num] = ext_pos_rearr[L - 1 - num]
            self.x_.ext_r[num] = ext_rot_rearr[L - 1 - num]

        self.P_ = tmp_P

    def update_iterated_dyn_share_modified(self, h_dyn_share, maximum_iter,
                                           limit=0.001):
        """esekfom.hpp:495-721 (the dense information-form n<=m branch;
        the n>m branch uses the scalar-R dense gain and is exercised only
        on degenerate rounds with fewer effective points than states).

        h_dyn_share(x, converge) -> dict(valid, h_x (E, 6(L+1)), h, R) or
        dict(valid=False); carries its own selection state across
        iterations like the reference's globals."""
        L = self.L
        n = 17 + 6 * L
        act = 6 * (L + 1)
        converge = True
        t = 0
        x_propagated = self.x_.copy()
        P_propagated = self.P_.copy()
        K_x = np.zeros((n, n))
        dx_ = np.zeros(n)

        i = -1
        while i < maximum_iter:
            data = h_dyn_share(self.x_, converge)
            if not data["valid"]:
                i += 1
                continue
            h_x_ = np.asarray(data["h_x"], float)
            R_dyn = np.asarray(data["R"], float).copy()
            dof_Measurement = h_x_.shape[0]

            dx = self.x_.boxminus(x_propagated)
            dx_new = dx.copy()
            P = P_propagated.copy()

            for idx, dim in self.x_.so3_state():
                seg = dx[idx : idx + 3]
                res = rm.A_matrix(seg).T
                dx_new[idx : idx + 3] = res @ dx_new[idx : idx + 3]
                P[idx : idx + 3, :] = res @ P[idx : idx + 3, :]
                P[:, idx : idx + 3] = P[:, idx : idx + 3] @ res.T
            for idx, dim in self.x_.s2_state():
                seg = dx[idx : idx + 2]
                Nx = rm.s2_nx_yy(self.x_.grav, S2_LENGTH)
                Mx = rm.s2_mx(x_propagated.grav, seg, S2_LENGTH)
                res = Nx @ Mx
                dx_new[idx : idx + 2] = res @ dx_new[idx : idx + 2]
                P[idx : idx + 2, :] = res @ P[idx : idx + 2, :]
                P[:, idx : idx + 2] = P[:, idx : idx + 2] @ res.T

            assert n <= dof_Measurement, (
                "oracle covers the information-form branch only"
            )
            P_temp = np.linalg.inv(P)
            HT = h_x_.T.copy()  # (act, E)
            R_dyn[R_dyn < 0.0001] = 0.001
            HT = HT / R_dyn[None, :]
            HTH = HT @ h_x_
            P_temp[:act, :act] += HTH
            P_inv = np.linalg.inv(P_temp)
            K_h = P_inv[:, :act] @ (HT @ np.asarray(data["h"], float))
            K_x = np.zeros((n, n))
            K_x[:, :act] = P_inv[:, :act] @ HTH

            dx_ = K_h + (K_x - np.eye(n)) @ dx_new
            self.x_.boxplus(dx_)

            converge = True
            for k in range(n):
                if abs(dx_[k]) > limit:
                    converge = False
                    break
            if converge:
                t += 1
            if (not t) and i == maximum_iter - 2:
                converge = True

            if t > 1 or i == maximum_iter - 1:
                Lm = P.copy()
                for idx, dim in self.x_.so3_state():
                    seg = dx_[idx : idx + 3]
                    res = rm.A_matrix(seg).T
                    Lm[idx : idx + 3, :] = res @ P[idx : idx + 3, :]
                    K_x[idx : idx + 3, :act] = res @ K_x[idx : idx + 3, :act]
                    Lm[:, idx : idx + 3] = Lm[:, idx : idx + 3] @ res.T
                    P[:, idx : idx + 3] = P[:, idx : idx + 3] @ res.T
                for idx, dim in self.x_.s2_state():
                    seg = dx_[idx : idx + 2]
                    Nx = rm.s2_nx_yy(self.x_.grav, S2_LENGTH)
                    Mx = rm.s2_mx(x_propagated.grav, seg, S2_LENGTH)
                    res = Nx @ Mx
                    Lm[idx : idx + 2, :] = res @ P[idx : idx + 2, :]
                    K_x[idx : idx + 2, :act] = res @ K_x[idx : idx + 2, :act]
                    Lm[:, idx : idx + 2] = Lm[:, idx : idx + 2] @ res.T
                    P[:, idx : idx + 2] = P[:, idx : idx + 2] @ res.T
                self.P_ = Lm - K_x[:, :act] @ P[:act, :]
                return i + 1
            i += 1
        return i
