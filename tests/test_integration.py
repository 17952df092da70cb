"""End-to-end integration: synthetic sequence -> full pipeline -> ATE.

This is the repo's equivalent of the reference's operational validation
(replay a sequence, compare trajectory; SURVEY §4): a known analytic
trajectory with simulated IMU + LiDAR drives deskew, correspondence, the
IEKF with all three weighting laws, and incremental mapping.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from malio_tpu.config import Config
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.io.assemble import assemble_groups
from malio_tpu import runner
from malio_tpu.eval import ate


def _cfg(L, pts):
    ext_t = np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])[:L]
    return Config(
        num_lidars=L,
        lid_type=tuple([3] * L),
        n_scans=tuple([64] * L),
        point_filter_num=tuple([1] * L),
        extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
        extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (L, 1)).reshape(-1).tolist()),
        max_raw_points=pts,
        max_points_per_scan=pts,
        max_imu_per_group=32,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        map_capacity=1 << 17,
        filter_size_surf=0.4,
        filter_size_map=0.4,
        cube_len=300.0,
        det_range=60.0,
        plane_th=0.1,
        cov_threshold=30.0,
    )


@pytest.mark.slow
def test_single_lidar_tracks_trajectory():
    cfg = _cfg(1, 2048)
    seq = SyntheticSequence(
        duration=5.0, num_lidars=1, points_per_scan=2048,
        ext_t=np.array([[0.2, 0.0, 0.0]]),
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64)
    assert len(res["t"]) > 30
    gt = traj.pos(res["t"])
    err_aligned = ate.ate_rmse(res["pos"], gt, align=True)
    err_raw = ate.ate_rmse(res["pos"], gt, align=False)
    assert np.isfinite(err_raw)
    # the robot travels ~8 m; dead-reckoning alone diverges to meters
    assert err_aligned < 0.10, (err_aligned, err_raw)
    assert err_raw < 0.25, (err_aligned, err_raw)
    # rotation ATE + SE(3) RPE against the analytic trajectory (Rz-only)
    gt_quat = np.stack(
        [np.array([np.cos(a / 2), 0, 0, np.sin(a / 2)])
         for a in SyntheticSequence.rot_angles(traj, res["t"])]
    )
    rot_err = ate.rot_ate_rmse(res["quat"], gt_quat, res["pos"], gt, align=True)
    assert rot_err < np.radians(2.0), np.degrees(rot_err)
    rpe = ate.se3_rpe(res["pos"], res["quat"], gt, gt_quat, delta=10)
    assert rpe["trans_rmse"] < 0.10, rpe
    assert rpe["rot_rmse"] < np.radians(1.0), np.degrees(rpe["rot_rmse"])
    # effective correspondences must bootstrap, not decay
    assert res["n_effective"][-1] > 500
    # per-round pose covariance: SPD, shrinking as the map constrains the
    # estimate (odometry covariance output, laserMapping.cpp:510-520)
    pc = res["pose_cov"]
    assert pc.shape == (len(res["t"]), 6, 6)
    assert np.isfinite(pc).all()
    assert (np.linalg.eigvalsh(pc) > 0).all()
    assert np.trace(pc[-1]) < np.trace(pc[0])
    # map grows as the platform moves
    assert res["map_size"][-1] > 2 * res["map_size"][0]


@pytest.mark.slow
def test_smoother_produces_refined_trajectory():
    from malio_tpu.smoother import WindowSmoother

    cfg = _cfg(1, 1024)
    seq = SyntheticSequence(
        duration=5.0, num_lidars=1, points_per_scan=1024,
        ext_t=np.array([[0.2, 0.0, 0.0]]),
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)
    sm = WindowSmoother(
        window_size=4, keyframe_every=4, optimize_every=1, max_points=1024,
        dtype=jnp.float64,
    )
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64, smoother=sm)
    ts, ps, qs = res["smoothed"]
    assert len(ts) >= 4
    assert np.all(np.diff(ts) > 0)
    gt = traj.pos(ts)
    err = ate.ate_rmse(ps, gt, align=True)
    # sanity bound: the window BA is gauge-anchored on its oldest keyframe,
    # so its absolute error tracks the odometry's (it optimizes window
    # consistency, not global accuracy); it must stay the same order
    odo_err = ate.ate_rmse(res["pos"], traj.pos(res["t"]), align=True)
    assert np.isfinite(err)
    assert err < max(3 * odo_err, 0.3), (err, odo_err)


@pytest.mark.slow
def test_two_lidar_async_fusion():
    cfg = _cfg(2, 1024)
    seq = SyntheticSequence(
        duration=4.0, num_lidars=2, points_per_scan=1024,
    )
    imu, rounds, traj = seq.generate()
    # staggered phases -> asynchronous scan ends (SyntheticSequence.phase)
    assert rounds[0][0]["end_t"] != rounds[0][1]["end_t"]
    groups = assemble_groups(cfg, imu, rounds)
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64)
    gt = traj.pos(res["t"])
    err_aligned = ate.ate_rmse(res["pos"], gt, align=True)
    assert err_aligned < 0.15, err_aligned
    assert res["n_effective"][-1] > 300


@pytest.mark.slow
def test_three_lidar_city_style_fusion():
    """Three asynchronous LiDARs (the City configuration shape): base
    selection rotates with scan-end order; extrinsic slots stay fixed."""
    cfg = _cfg(3, 768)
    seq = SyntheticSequence(duration=3.5, num_lidars=3, points_per_scan=768)
    imu, rounds, traj = seq.generate()
    ends = [s["end_t"] for s in rounds[0]]
    assert len(set(np.round(ends, 6))) == 3  # all asynchronous
    groups = assemble_groups(cfg, imu, rounds)
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64)
    gt = traj.pos(res["t"])
    err_aligned = ate.ate_rmse(res["pos"], gt, align=True)
    assert err_aligned < 0.15, err_aligned
    assert res["n_effective"][-1] > 300


@pytest.mark.slow
def test_three_lidar_city_rig_rotated_extrinsics():
    """The actual City rig geometry (config/City.yaml:24-29): Livox Avia
    mounted ~90 deg yawed, Livox Tele ~180 deg flipped. Rotation
    extrinsics exercise deskew/fusion paths that identity quaternions
    cancel out of (a sign error in the ext sandwich is invisible at
    R = I)."""
    import dataclasses

    from malio_tpu.config import city_config

    city = city_config()
    ext_t = np.asarray(city.extrinsic_T).reshape(3, 3)
    ext_q = np.asarray(city.extrinsic_R).reshape(3, 4)
    cfg = dataclasses.replace(
        _cfg(3, 768),
        extrinsic_T=tuple(ext_t.reshape(-1)),
        extrinsic_R=tuple(ext_q.reshape(-1)),
        extrinsic_est_en=False,
    )
    seq = SyntheticSequence(
        duration=3.5, num_lidars=3, points_per_scan=768,
        ext_t=ext_t, ext_q_wxyz=ext_q,
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64)
    gt = traj.pos(res["t"])
    err_aligned = ate.ate_rmse(res["pos"], gt, align=True)
    assert err_aligned < 0.15, err_aligned
    assert res["n_effective"][-1] > 300


def test_process_noise_source_switch():
    """Q's gyr/acc block: 'measured' uses the init window's sample
    variance (the reference quirk, IMU_Processing.hpp:142-186);
    'config' uses the YAML gyr_cov/acc_cov directly."""
    import dataclasses

    cfg = _cfg(1, 256)
    init = runner.ImuInitializer()
    rng = np.random.default_rng(7)
    imu = np.concatenate(
        [rng.normal(0.02, 0.003, (20, 3)), rng.normal([0, 0, 9.8], 0.05, (20, 3))],
        axis=1,
    )
    imu = np.concatenate([np.linspace(0, 0.2, 20)[:, None], imu], axis=1)
    init.update(imu, np.ones(20, bool))
    assert init.done

    q_meas = np.diag(np.asarray(runner.process_noise(cfg, init, jnp.float64)))
    np.testing.assert_allclose(q_meas[0:3], init.cov_gyr, rtol=1e-12)
    np.testing.assert_allclose(q_meas[3:6], init.cov_acc, rtol=1e-12)

    cfg_y = dataclasses.replace(cfg, imu_noise_source="config")
    q_cfg = np.diag(np.asarray(runner.process_noise(cfg_y, init, jnp.float64)))
    np.testing.assert_allclose(q_cfg[0:3], cfg.gyr_cov, rtol=1e-12)
    np.testing.assert_allclose(q_cfg[3:6], cfg.acc_cov, rtol=1e-12)
    # bias random-walk block always comes from the config
    np.testing.assert_allclose(q_meas[6:9], cfg.b_gyr_cov, rtol=1e-12)
    np.testing.assert_allclose(q_cfg[9:12], cfg.b_acc_cov, rtol=1e-12)

    with pytest.raises(ValueError):
        runner.process_noise(
            dataclasses.replace(cfg, imu_noise_source="bogus"), init, jnp.float64
        )


@pytest.mark.slow
def test_config_noise_source_tracks_trajectory():
    """End-to-end with imu_noise_source='config': the YAML-noise path must
    track, not just construct (guards Q plumbing through init_carry)."""
    import dataclasses

    cfg = dataclasses.replace(
        _cfg(1, 1024), imu_noise_source="config", gyr_cov=0.01, acc_cov=0.02
    )
    seq = SyntheticSequence(
        duration=3.0, num_lidars=1, points_per_scan=1024,
        ext_t=np.array([[0.2, 0.0, 0.0]]),
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)
    res = runner.run_sequence(cfg, groups, dtype=jnp.float64)
    gt = traj.pos(res["t"])
    err_aligned = ate.ate_rmse(res["pos"], gt, align=True)
    assert err_aligned < 0.15, err_aligned
    # 1024-pt scans settle near ~70 effective correspondences (the
    # measured-noise control at identical settings shows the same tail)
    assert res["n_effective"][-1] > 50


def test_ros_pose_covariance_matches_reference_loop():
    """metrics.ros_pose_covariance vs a transliteration of the publish
    loop (publish_odometry, laserMapping.cpp:510-520)."""
    from malio_tpu import metrics

    rng = np.random.default_rng(3)
    A = rng.normal(size=(6, 6))
    P = A @ A.T
    ref = np.zeros((6, 6))
    for i in range(6):
        k = i + 3 if i < 3 else i - 3
        ref[i, 0:3] = P[k, 3:6]
        ref[i, 3:6] = P[k, 0:3]
    np.testing.assert_allclose(metrics.ros_pose_covariance(P), ref, atol=0)
    # batch shape passes through
    batch = np.stack([P, 2 * P])
    np.testing.assert_allclose(
        metrics.ros_pose_covariance(batch)[1], 2 * ref, atol=0
    )


@pytest.mark.slow
def test_extrinsic_estimation_converges():
    """Online extrinsic calibration: with a ~5 cm translation error on
    LiDAR 1's extrinsic, estimation at the reference's 1e-6 prior
    (IMU_Processing.hpp:191-192) pulls the estimate toward truth, and
    with extrinsic_est_en=False the extrinsic never moves (zero process
    derivative + zeroed H block, laserMapping.cpp:291-308)."""
    import dataclasses

    true_ext = np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1]])
    seq = SyntheticSequence(
        duration=4.0, num_lidars=2, points_per_scan=1024, ext_t=true_ext
    )
    imu, rounds, traj = seq.generate()
    pert = true_ext.copy()
    pert[1] += np.array([0.04, -0.03, 0.02])
    err0 = np.linalg.norm(pert[1] - true_ext[1])

    base = dataclasses.replace(_cfg(2, 1024), extrinsic_T=tuple(pert.reshape(-1)))

    res_on = runner.run_sequence(
        cfg := dataclasses.replace(base, extrinsic_est_en=True),
        assemble_groups(cfg, imu, rounds),
        dtype=jnp.float64,
    )
    ext_on = np.asarray(res_on["carry"].x.ext_t)
    err_on = np.linalg.norm(ext_on[1] - true_ext[1])
    # measured 5.39 -> 3.51 cm on this sequence; assert >=25% reduction
    assert err_on < 0.75 * err0, (err0, err_on)

    res_off = runner.run_sequence(
        cfg2 := dataclasses.replace(base, extrinsic_est_en=False),
        assemble_groups(cfg2, imu, rounds),
        dtype=jnp.float64,
    )
    ext_off = np.asarray(res_off["carry"].x.ext_t)
    np.testing.assert_allclose(ext_off[1], pert[1], atol=1e-12)
    # both still track
    for res in (res_on, res_off):
        gt = traj.pos(res["t"])
        assert ate.ate_rmse(res["pos"], gt, align=True) < 0.15


def test_meas_compaction_permutation_invariance():
    """cfg.max_meas_points compaction with live < cap is a pure lane
    permutation: per-round outputs must match the uncompacted run to
    f64 reduction-order noise, with zero counted drops; a cap BELOW the
    live count must count the overflow and keep tracking."""
    import dataclasses

    L, pts = 2, 512
    base = _cfg(L, pts)
    seq = SyntheticSequence(
        duration=2.5, num_lidars=L, points_per_scan=pts,
        ext_t=np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1]]),
    )
    imu, rounds_ = seq.generate()[:2]
    groups = assemble_groups(base, imu, rounds_)

    def run(cfg, n_rounds=10):
        res = runner.run_sequence(cfg, groups[: n_rounds + 4], dtype=jnp.float64)
        return res

    res_off = run(base)
    live_max = int(res_off["n_effective"].max())
    # choose a cap comfortably above the observed live count but < M
    cap = min(L * pts - 1, max(live_max * 2, L * pts * 7 // 8))
    cfg_cap = dataclasses.replace(base, max_meas_points=cap)
    res_cap = run(cfg_cap)
    n = min(len(res_off["pos"]), len(res_cap["pos"]))
    assert n > 5
    np.testing.assert_allclose(
        res_cap["pos"][:n], res_off["pos"][:n], atol=1e-6
    )
    np.testing.assert_array_equal(
        res_cap["map_size"][:n], res_off["map_size"][:n]
    )

    # a cap below the live count: overflow dropped but the filter tracks
    cfg_tiny = dataclasses.replace(base, max_meas_points=(L * pts) // 4)
    res_tiny = run(cfg_tiny)
    assert np.isfinite(res_tiny["pos"]).all()
