"""OnlineEstimator (push-style live feed) vs the offline replay path."""
import numpy as np
import jax.numpy as jnp
import pytest

from malio_tpu.config import Config
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.io.assemble import assemble_groups
from malio_tpu import runner
from malio_tpu.online import OnlineEstimator
from malio_tpu.eval import ate


def _cfg(L, pts):
    ext_t = np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1]])[:L]
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


def _push_events(est, imu, rounds, skip=None):
    """Feed IMU samples and scans in arrival order (a scan 'arrives' at
    its end time, an IMU sample at its stamp). skip: set of (round, lidar)
    scans to withhold, emulating lost messages."""
    events = [("imu", row[0], row) for row in imu]
    for ri, rnd in enumerate(rounds):
        for l, s in enumerate(rnd):
            if skip and (ri, l) in skip:
                continue
            rel = s["pts"].copy()
            rel[:, 3] -= s["beg_t"]
            dur = s["end_t"] - s["beg_t"]
            events.append(("scan", s["end_t"], (l, s["beg_t"], rel, dur)))
    events.sort(key=lambda e: e[1])
    for kind, _, payload in events:
        if kind == "imu":
            est.push_imu(payload[0], payload[1:4], payload[4:7])
        else:
            l, beg, rel, dur = payload
            est.push_scan(l, beg, rel, duration=dur)


def test_online_grouping_and_counters():
    """Grouping/gating semantics without ever compiling: with too few IMU
    samples the estimator stays in init, but scan bookkeeping (drops,
    regression guard, lookahead gating) is fully exercised."""
    cfg = _cfg(2, 8)
    est = OnlineEstimator(cfg, dtype=jnp.float64)
    pts = np.zeros((4, 4))

    # IMU regression guard
    est.push_imu(0.00, np.zeros(3), np.array([0, 0, 9.8]))
    est.push_imu(0.01, np.zeros(3), np.array([0, 0, 9.8]))
    est.push_imu(0.005, np.zeros(3), np.array([0, 0, 9.8]))  # out of order
    assert est.n_imu_regressions == 1
    assert len(est._imu) == 2

    # stream 0 loses its first scan; stream 1's 0.05-scan gets jumped over
    est.push_scan(1, 0.00, pts, duration=0.05)
    est.push_scan(0, 0.10, pts, duration=0.05)
    est.push_scan(1, 0.10, pts, duration=0.05)
    # no fusion yet: IMU lookahead (0.2 s past round end) not satisfied
    assert est.n_rounds == 0 and est._carry is None and est._n_init_groups == 0
    for k in range(2, 45):
        est.push_imu(k * 0.01, np.zeros(3), np.array([0, 0, 9.8]))
    # round formed at pivot 0.15: stream 1's early scan was dropped
    assert est.n_dropped_scans == 1
    assert est._n_init_groups == 1  # consumed by IMU init, no compile
    assert est.n_rounds == 0
    assert all(len(b) == 0 for b in est._scans)


@pytest.mark.slow
def test_online_matches_replay():
    """The push-style path must reproduce the replay path bit-for-bit on
    the same data (same grouping, init, rebasing, stepping)."""
    cfg = _cfg(2, 768)
    seq = SyntheticSequence(
        duration=2.5, num_lidars=2, points_per_scan=768,
        ext_t=np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1]]),
    )
    imu, rounds, traj = seq.generate()

    groups = assemble_groups(cfg, imu, rounds)
    ref = runner.run_sequence(cfg, groups, dtype=jnp.float64)

    est = OnlineEstimator(cfg, dtype=jnp.float64)
    _push_events(est, imu, rounds)
    est.flush()
    out = est.poll()

    assert len(out) == len(ref["t"])
    np.testing.assert_allclose([o["t"] for o in out], ref["t"], atol=1e-9)
    np.testing.assert_allclose(
        np.stack([o["pos"] for o in out]), ref["pos"], atol=1e-9
    )
    np.testing.assert_allclose(
        np.stack([o["quat"] for o in out]), ref["quat"], atol=1e-9
    )
    assert est.n_dropped_scans == 0


@pytest.mark.slow
def test_online_survives_dropped_scan():
    """Losing one scan mid-sequence desynchronizes exactly one round and
    the estimator keeps tracking (ApproximateTime recovery)."""
    cfg = _cfg(2, 768)
    seq = SyntheticSequence(
        duration=2.5, num_lidars=2, points_per_scan=768,
        ext_t=np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1]]),
    )
    imu, rounds, traj = seq.generate()

    est = OnlineEstimator(cfg, dtype=jnp.float64)
    _push_events(est, imu, rounds, skip={(10, 0)})
    est.flush()
    out = est.poll()

    assert est.n_rounds >= len(rounds) - 4  # one round lost, not the tail
    t = np.asarray([o["t"] for o in out])
    pos = np.stack([o["pos"] for o in out])
    gt = traj.pos(t)
    err = ate.ate_rmse(pos, gt, align=True)
    assert err < 0.15, err
