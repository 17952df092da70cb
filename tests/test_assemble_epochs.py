"""Focused tests: measure-group assembly semantics (sync_packages parity)
and the uncertainty-epoch indexing in undistort."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from malio_tpu.config import Config
from malio_tpu.io.assemble import assemble_groups


def _mk_round(beg, dur=0.095, n=16, L=1):
    out = []
    for l in range(L):
        pts = np.zeros((n, 4))
        pts[:, 0] = 5.0
        pts[:, 3] = np.linspace(beg, beg + dur, n)
        out.append(dict(beg_t=beg + 0.001 * l, end_t=beg + dur + 0.001 * l, pts=pts))
    return out


def _cfg(L=1):
    return Config(
        num_lidars=L,
        lid_type=tuple([3] * L),
        n_scans=tuple([16] * L),
        point_filter_num=tuple([1] * L),
        extrinsic_T=tuple([0.0] * 3 * L),
        extrinsic_R=tuple(([1.0, 0, 0, 0] * L)),
        max_raw_points=32,
        max_imu_per_group=32,
        imu_cont_len=8,
    )


def _imu(t0, t1, hz=100.0):
    ts = np.arange(t0, t1, 1.0 / hz)
    rec = np.zeros((ts.size, 7))
    rec[:, 0] = ts
    rec[:, 6] = 9.81
    return rec


def test_imu_drain_non_overlapping():
    """Each group drains IMU strictly up to its scan end; windows don't
    overlap (sync_packages, laserMapping.cpp:363-375)."""
    cfg = _cfg()
    imu = _imu(0.0, 2.0)
    rounds = [_mk_round(0.1 + 0.1 * k) for k in range(10)]
    groups = assemble_groups(cfg, imu, rounds)
    prev_end = -1.0
    seen = set()
    for g in groups:
        ts = g["imu"][g["imu_mask"], 0]
        if ts.size:
            assert ts.min() > prev_end
            assert ts.max() <= g["end_t"].max() + 1e-9
            prev_end = ts.max()
            for t in ts:
                assert t not in seen
                seen.add(t)


def test_imu_cont_window():
    """Continuation = last drained sample + the next imu_cont_len-1 future
    samples (laserMapping.cpp:377-385)."""
    cfg = _cfg()
    imu = _imu(0.0, 3.0)
    rounds = [_mk_round(0.1 + 0.1 * k) for k in range(10)]
    groups = assemble_groups(cfg, imu, rounds)
    g = groups[3]
    drained = g["imu"][g["imu_mask"], 0]
    cont = g["imu_cont"][g["imu_cont_mask"], 0]
    assert cont[0] == drained[-1]
    assert np.all(np.diff(cont) > 0)
    assert cont.size == cfg.imu_cont_len


def test_trailing_rounds_without_imu_coverage_dropped():
    cfg = _cfg()
    imu = _imu(0.0, 1.0)
    rounds = [_mk_round(0.1 + 0.1 * k) for k in range(10)]  # up to ~1.1 s
    groups = assemble_groups(cfg, imu, rounds)
    # the 0.2 s lookahead gate drops rounds ending after ~0.8 s
    assert len(groups) < 10
    for g in groups:
        assert imu[-1, 0] - g["end_t"].max() >= cfg.sync_lookahead - 1e-9


def test_epoch_indices_monotone_with_point_time():
    """Later points get smaller epoch indices (epochs count backward from
    the scan end, IMU_Processing.hpp:484-494)."""
    import __graft_entry__ as ge
    from malio_tpu import propagate as prop

    cfg = ge._tiny_cfg(L=1, pts=128)
    carry, group = ge._dummy_inputs(cfg, dtype=jnp.float64)
    und = prop.undistort(
        cfg, carry.x, carry.P, carry.hist, group, carry.Q,
        carry.last_in, carry.last_imu, carry.last_end_t, carry.mean_acc_norm,
    )
    t = np.asarray(group.pts[0, :, 3])
    e = np.asarray(und.pt_epoch[0])
    order = np.argsort(t)
    # epoch index is non-increasing as point time increases
    assert np.all(np.diff(e[order]) <= 0)
    assert e.min() >= 0
    assert int(und.epoch_count[0]) >= 1
