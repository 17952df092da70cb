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
