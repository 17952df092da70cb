"""MetricsLogger: JSONL records + the visualize_state-style dashboard
(laserMapping.cpp:762-829), including the round-2 extrinsic/velocity
lines pulled from the carry."""
import json
from types import SimpleNamespace

import numpy as np

from malio_tpu.metrics import MetricsLogger, ros_pose_covariance


def _fake_out(t=1.0, pos=(1.0, 2.0, 3.0)):
    return SimpleNamespace(
        pos=np.asarray(pos),
        quat=np.asarray([1.0, 0, 0, 0]),
        end_time=np.asarray(t),
        iterations=np.asarray(3),
        n_effective=np.asarray(1200),
        map_size=np.asarray(50000),
        map_load=np.asarray(0.02),
        map_dropped=np.asarray(0),
        n_insert=np.asarray(900),
    )


def _fake_carry(L=2):
    x = SimpleNamespace(
        vel=np.asarray([0.5, -0.25, 0.0]),
        ext_t=np.zeros((L, 3)) + [0.2, 0.0, 0.1],
        ext_r=np.tile(np.asarray([1.0, 0, 0, 0]), (L, 1)),
    )
    return SimpleNamespace(x=x)


def test_jsonl_records(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLogger(jsonl_path=str(p))
    log.update(_fake_carry(), _fake_out(t=1.0))
    # out.end_time is chunk-relative on device; t_base restores absolute
    log.update(_fake_carry(), _fake_out(t=0.1, pos=(2.0, 2.0, 3.0)), t_base=1.0)
    log.close()
    recs = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["round"] == 1 and recs[1]["round"] == 2
    assert recs[0]["t"] == 1.0 and recs[1]["t"] == 1.1
    assert recs[1]["distance_m"] == 1.0  # accumulated travel
    assert recs[0]["map_size"] == 50000


def test_dashboard_renders_extrinsics(capsys):
    log = MetricsLogger(dashboard=True, every=1)
    log.update(_fake_carry(L=3), _fake_out())
    out = capsys.readouterr().out
    assert "malio_tpu" in out
    assert "[Velocity]" in out
    assert out.count("[LiDAR-IMU ext") == 3
    assert "[Map voxels]" in out and "50000" in out


def test_ros_pose_covariance_layout():
    P = np.arange(36, dtype=float).reshape(6, 6)
    out = ros_pose_covariance(P)
    # rotation block leads (laserMapping.cpp:510-520)
    assert out[0, 0] == P[3, 3]
    assert out[3, 3] == P[0, 0]
    assert out[0, 3] == P[3, 0]
    # batch shape passthrough
    outB = ros_pose_covariance(np.stack([P, P]))
    assert outB.shape == (2, 6, 6)
    np.testing.assert_array_equal(outB[0], out)
