"""eval/ate.py unit tests: TUM IO round-trip, stamp association,
Umeyama alignment, ATE/RPE — the external evo-style tooling the
reference expects users to run on Log/trajectory.txt
(laserMapping.cpp:1070-1071, README.md:203)."""
import numpy as np

from malio_tpu.eval import ate


def _traj(n=200, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.05, axis=0)
    quat = np.tile([1.0, 0, 0, 0], (n, 1))
    return t, pos, quat


def test_tum_roundtrip(tmp_path):
    t, pos, quat = _traj()
    p = tmp_path / "traj.txt"
    ate.write_tum(p, t, pos, quat)
    t2, pos2, quat2 = ate.read_tum(p)
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_allclose(pos2, pos, atol=1e-6)
    np.testing.assert_allclose(quat2, quat, atol=1e-9)


def test_associate_window():
    ta = np.array([0.0, 0.1, 0.2, 0.5])
    tb = np.array([0.001, 0.099, 0.35, 0.501])
    ia, ib = ate.associate(ta, tb, max_dt=0.02)
    # 0.2 has no partner within 0.02; 0.35 matches nothing
    np.testing.assert_array_equal(ta[ia], [0.0, 0.1, 0.5])
    np.testing.assert_array_equal(tb[ib], [0.001, 0.099, 0.501])


def test_umeyama_recovers_rigid_transform():
    _, pos, _ = _traj()
    ang = 0.7
    R_true = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1.0],
        ]
    )
    t_true = np.array([5.0, -2.0, 1.5])
    moved = pos @ R_true.T + t_true
    R, t = ate.umeyama_se3(pos, moved)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    # ATE of the aligned trajectory is ~0; raw is not
    assert ate.ate_rmse(pos, moved, align=True) < 1e-9
    assert ate.ate_rmse(pos, moved, align=False) > 1.0


def test_rpe_drift_insensitive_but_scale_sensitive():
    """RPE over a fixed delta ignores a constant offset entirely and a
    slow linear drift almost entirely, but sees a local scale error."""
    _, pos, _ = _traj()
    assert ate.rpe_rmse(pos + np.array([10.0, 0, 0]), pos) < 1e-12
    n = pos.shape[0]
    drift = np.linspace(0, 0.5, n)[:, None] * np.array([1.0, 0, 0])
    assert ate.rpe_rmse(pos + drift, pos, delta=10) < 0.05
    scaled = pos * 1.1
    assert ate.rpe_rmse(scaled, pos, delta=10) > 0.01
    # too-short trajectory -> nan, not crash
    assert np.isnan(ate.rpe_rmse(pos[:5], pos[:5], delta=10))


# ---------------------------------------------------------------------
# SE(3) RPE + rotation ATE (evo-equivalent; hand-computed cases)
# ---------------------------------------------------------------------


def _yaw_quat(a):
    return np.array([np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)])


def test_se3_rpe_hand_computed():
    """Two-pose case with known relative errors: gt moves 1 m forward and
    yaws 90 deg; est adds 0.1 m lateral slip and theta extra yaw."""
    theta = 0.05
    gt_pos = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    gt_quat = np.stack([_yaw_quat(0.0), _yaw_quat(np.pi / 2)])
    est_pos = np.array([[0.0, 0, 0], [1.0, 0.1, 0]])
    est_quat = np.stack([_yaw_quat(0.0), _yaw_quat(np.pi / 2 + theta)])
    r = ate.se3_rpe(est_pos, est_quat, gt_pos, gt_quat, delta=1)
    assert np.isclose(r["trans_rmse"], 0.1, atol=1e-12)
    assert np.isclose(r["rot_rmse"], theta, atol=1e-12)
    # translation-part wrapper agrees
    assert np.isclose(
        ate.rpe_rmse(est_pos, gt_pos, 1, est_quat, gt_quat), 0.1, atol=1e-12
    )


def test_se3_rpe_sees_frame_rotation_error():
    """A pure orientation error at the anchor pose rotates the relative
    translation into the wrong body frame — the position-only drift proxy
    could never see this."""
    gt_pos = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    gt_quat = np.stack([_yaw_quat(0.0), _yaw_quat(0.0)])
    est_pos = gt_pos.copy()  # positions identical!
    est_quat = np.stack([_yaw_quat(np.pi / 2), _yaw_quat(np.pi / 2)])
    r = ate.se3_rpe(est_pos, est_quat, gt_pos, gt_quat, delta=1)
    # t_rel_est = Rz(-90)(1,0,0) = (0,-1,0); |(0,-1,0)-(1,0,0)| = sqrt(2)
    assert np.isclose(r["trans_rmse"], np.sqrt(2.0), atol=1e-12)
    assert np.isclose(r["rot_rmse"], 0.0, atol=1e-12)  # relative rot exact


def test_se3_rpe_short_trajectory_nan():
    r = ate.se3_rpe(np.zeros((3, 3)), np.tile([1.0, 0, 0, 0], (3, 1)),
                    np.zeros((3, 3)), np.tile([1.0, 0, 0, 0], (3, 1)), delta=5)
    assert np.isnan(r["trans_rmse"]) and np.isnan(r["rot_rmse"])


def test_rot_ate_constant_offset():
    """est = fixed extra yaw on every gt orientation -> rot ATE = that
    angle exactly (align=False)."""
    rng = np.random.default_rng(3)
    n = 50
    gt_quat = np.stack([_yaw_quat(a) for a in rng.uniform(-2, 2, n)])
    off = 0.15
    est_quat = np.stack(
        [ate._quat_mul(_yaw_quat(off), q) for q in gt_quat]
    )
    err = ate.rot_ate_rmse(est_quat, gt_quat, align=False)
    assert np.isclose(err, off, atol=1e-12)
    # sign flip of a quaternion is the same rotation
    est_quat[::2] *= -1.0
    assert np.isclose(ate.rot_ate_rmse(est_quat, gt_quat, align=False), off,
                      atol=1e-12)


def test_rot_ate_alignment_absorbs_global_rotation():
    """Rotating the whole trajectory (positions AND orientations) is
    gauge, not error: aligned translation AND rotation ATE both vanish."""
    rng = np.random.default_rng(5)
    n = 80
    t = np.arange(n) * 0.1
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    quat = np.stack([_yaw_quat(a) for a in np.sin(t)])
    ang = 1.1
    Rg = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1.0]]
    )
    qg = ate._mat_to_quat(Rg)
    est_pos = pos @ Rg.T + np.array([3.0, -1.0, 2.0])
    est_quat = np.stack([ate._quat_mul(qg, q) for q in quat])
    assert ate.ate_rmse(est_pos, pos, align=True) < 1e-9
    assert ate.rot_ate_rmse(est_quat, quat, est_pos, pos, align=True) < 1e-9
    # unaligned it is exactly the applied angle
    assert np.isclose(ate.rot_ate_rmse(est_quat, quat, align=False), ang,
                      atol=1e-9)


def test_mat_to_quat_roundtrip():
    rng = np.random.default_rng(9)
    for _ in range(50):
        v = rng.normal(size=3)
        a = np.linalg.norm(v)
        q = np.concatenate([[np.cos(a / 2)], np.sin(a / 2) * v / a])
        # quat -> matrix (via rotating basis vectors) -> quat
        R = np.stack([ate._quat_rot(q, e) for e in np.eye(3)], axis=1)
        q2 = ate._mat_to_quat(R)
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-9
