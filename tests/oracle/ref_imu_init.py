"""NumPy transliteration of ImuProcess::IMU_init
(src/IMU_Processing.hpp:147-208, relative /root/reference/MA_LIO).

Independent oracle: shares no code with malio_tpu.runner. Follows the
reference verbatim: first-frame mean seeding from the front sample, the
running-mean/variance recursion with N incremented per sample, gravity as
S2(-mean_acc/|mean_acc| * G), bg = mean_gyr, the banded init_P diagonal
(written for DOF n = 17 + 6L), and Q from the measured covariances plus
the configured bias random walks.
"""
import numpy as np

G_M_S2 = 9.81  # common_lib.h:20
S2_LENGTH = 98090.0 / 10000.0  # use-ikfom.hpp:8


class RefImuInit:
    def __init__(self):
        # Reset() state (IMU_Processing.hpp:107-125)
        self.b_first_frame = True
        self.N = 1
        self.mean_acc = np.array([0.0, 0.0, -1.0])
        self.mean_gyr = np.zeros(3)
        self.cov_acc = np.full(3, 0.1)
        self.cov_gyr = np.full(3, 0.1)

    def feed(self, gyr_acc_rows):
        """One MeasureGroup's IMU deque: rows of [gyro(3), acc(3)]."""
        rows = np.asarray(gyr_acc_rows, float)
        if self.b_first_frame:
            self.N = 1
            self.b_first_frame = False
            self.mean_acc = rows[0, 3:6].copy()
            self.mean_gyr = rows[0, 0:3].copy()
        for row in rows:
            cur_gyr, cur_acc = row[0:3], row[3:6]
            N = self.N
            self.mean_acc += (cur_acc - self.mean_acc) / N
            self.mean_gyr += (cur_gyr - self.mean_gyr) / N
            self.cov_acc = (
                self.cov_acc * (N - 1.0) / N
                + (cur_acc - self.mean_acc) ** 2 * (N - 1.0) / (N * N)
            )
            self.cov_gyr = (
                self.cov_gyr * (N - 1.0) / N
                + (cur_gyr - self.mean_gyr) ** 2 * (N - 1.0) / (N * N)
            )
            self.N += 1

    def init_state(self, L):
        """(grav(3,), bg(3,)) after init (IMU_Processing.hpp:182-186).
        The S2 constructor renormalizes -mean_acc/|mean_acc|*9.81 to the
        manifold length 98090/10000 = 9.809 (S2.hpp:106-110), so the
        stored vector is direction * S2_LENGTH."""
        grav = -self.mean_acc / np.linalg.norm(self.mean_acc) * S2_LENGTH
        return grav, self.mean_gyr.copy()

    def init_P(self, L):
        """Banded diagonal (IMU_Processing.hpp:189-199), DOF n = 17+6L."""
        n = 17 + 6 * L
        P = np.eye(n)
        for i in range(6, n):
            if i < n - 8:
                P[i, i] = 0.000001
            elif i < n - 5:
                P[i, i] = 0.0001
            elif i < n - 2:
                P[i, i] = 0.001
            else:
                P[i, i] = 0.00001
        return P

    def init_Q(self, cov_bias_gyr, cov_bias_acc):
        """12x12 process noise (IMU_Processing.hpp:203-207): measured
        gyr/acc variances + configured bias random walks."""
        return np.diag(
            np.concatenate(
                [
                    self.cov_gyr,
                    self.cov_acc,
                    np.full(3, cov_bias_gyr),
                    np.full(3, cov_bias_acc),
                ]
            )
        )
