"""IMU-initialization parity: runner.{ImuInitializer, initial_state,
initial_covariance, process_noise} vs the line-faithful IMU_init oracle
(tests/oracle/ref_imu_init.py, IMU_Processing.hpp:147-208)."""
import numpy as np
import jax.numpy as jnp

from malio_tpu import config as cfg_mod, runner, state as st
from tests.oracle.ref_imu_init import RefImuInit

rng = np.random.default_rng(11)


def _random_imu(n, t0=0.0, rate=100.0):
    t = t0 + np.arange(n) / rate
    gyr = rng.normal(0.002, 0.01, size=(n, 3))
    acc = np.array([0.05, -0.03, 9.79]) + rng.normal(0, 0.05, size=(n, 3))
    return np.concatenate([t[:, None], gyr, acc], axis=1)


def test_imu_init_statistics_and_seeds():
    cfg = cfg_mod.city_config()
    L = cfg.num_lidars

    imu = _random_imu(37)
    # split across "measure groups" the way the runner feeds them
    splits = np.split(imu, [9, 21, 30])

    init = runner.ImuInitializer()
    ref = RefImuInit()
    for chunk in splits:
        init.update(chunk, np.ones(chunk.shape[0], bool))
        ref.feed(chunk[:, 1:7])

    # running statistics (the mean/variance recursion incl. the
    # first-frame seeding quirk)
    np.testing.assert_allclose(init.mean_acc, ref.mean_acc, rtol=1e-12)
    np.testing.assert_allclose(init.mean_gyr, ref.mean_gyr, rtol=1e-12)
    np.testing.assert_allclose(init.cov_acc, ref.cov_acc, rtol=1e-12)
    np.testing.assert_allclose(init.cov_gyr, ref.cov_gyr, rtol=1e-12)
    assert init.n == ref.N

    # seeded state: gravity on the S2 manifold + gyro bias
    x0 = runner.initial_state(cfg, init, jnp.float64)
    grav_ref, bg_ref = ref.init_state(L)
    np.testing.assert_allclose(np.asarray(x0.grav), grav_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x0.bg), bg_ref, rtol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x0.grav)), st.S2_LENGTH, rtol=1e-12
    )

    # banded init_P (needs the reference's 1e-6 extrinsic prior)
    cfg_p = cfg_mod.city_config(ext_cov_init=1e-6)
    P0 = np.asarray(runner.initial_covariance(cfg_p, jnp.float64))
    np.testing.assert_allclose(P0, ref.init_P(L), rtol=0, atol=0)

    # Q: measured gyr/acc variances + configured bias walks
    Q = np.asarray(runner.process_noise(cfg, init, jnp.float64))
    np.testing.assert_allclose(
        Q, ref.init_Q(cfg.b_gyr_cov, cfg.b_acc_cov), rtol=1e-12
    )


def test_imu_init_first_frame_seeding():
    """The first sample seeds the mean and then re-enters the recursion at
    N=1 as a no-op — a quirk both sides must share exactly."""
    init = runner.ImuInitializer()
    ref = RefImuInit()
    imu = _random_imu(3)
    init.update(imu, np.ones(3, bool))
    ref.feed(imu[:, 1:7])
    np.testing.assert_allclose(init.mean_acc, ref.mean_acc, rtol=1e-14)
    np.testing.assert_allclose(init.cov_acc, ref.cov_acc, rtol=1e-14)
    assert init.n == ref.N == 4
