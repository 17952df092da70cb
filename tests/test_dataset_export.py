"""Dataset exporter round-trip + the run_dataset.py CLI driven end to end
on an exported synthetic tree (binary decode -> grouping -> pipeline ->
ATE) — the closest available stand-in for a real City run."""
import pathlib
import re
import subprocess
import sys

import numpy as np
import pytest

from malio_tpu.io import dataset as ds
from malio_tpu.io.export import write_dataset, EPOCH_NS
from malio_tpu.io.synthetic import SyntheticSequence


def test_export_roundtrip_ouster(tmp_path):
    """export -> load_sequence reproduces the original scans up to f32
    record quantization and the configured decimation."""
    seq = SyntheticSequence(duration=2.0, num_lidars=1, points_per_scan=512)
    imu, rounds, traj = seq.generate()
    write_dataset(tmp_path, imu, rounds, ["ouster"], traj=traj)

    imu2, rounds2 = ds.load_sequence(
        tmp_path, ["ouster"], [ds.OUST64], [2], [128], blind=0.0
    )
    # IMU: stamps rebased to the sequence origin; values round-trip the csv
    assert imu2.shape[0] == imu.shape[0]
    np.testing.assert_allclose(imu2[:, 0], imu[:, 0], atol=2e-6)
    np.testing.assert_allclose(imu2[:, 1:], imu[:, 1:], atol=1e-9)

    assert len(rounds2) == len(rounds)
    for r_orig, r_back in zip(rounds, rounds2):
        p0 = r_orig[0]["pts"][::2]  # the point_filter_num=2 decimation
        p1 = r_back[0]["pts"]
        assert p1.shape == p0.shape
        np.testing.assert_allclose(p1[:, :3], p0[:, :3], atol=1e-4)  # f32
        np.testing.assert_allclose(p1[:, 3], p0[:, 3], atol=2e-6)  # ns + t0
        assert abs(r_back[0]["beg_t"] - r_orig[0]["beg_t"]) < 2e-6


def test_export_roundtrip_livox_velodyne(tmp_path):
    """Two-LiDAR export across the other record formats."""
    seq = SyntheticSequence(duration=1.5, num_lidars=2, points_per_scan=256)
    imu, rounds, traj = seq.generate()
    write_dataset(tmp_path, imu, rounds, ["livox_avia", "vlp_left"], n_scans=[8, 16])

    imu2, rounds2 = ds.load_sequence(
        tmp_path,
        ["livox_avia", "vlp_left"],
        [ds.AVIA, ds.VELO16],
        [1, 1],
        [8, 16],
        blind=0.0,
    )
    assert len(rounds2) == len(rounds)
    r_orig, r_back = rounds[2], rounds2[2]
    # livox decode drops index 0 of every file (reference loop from i=1)
    np.testing.assert_allclose(
        r_back[0]["pts"][:, :3], r_orig[0]["pts"][1:, :3], atol=1e-4
    )
    np.testing.assert_allclose(
        r_back[1]["pts"][:, :3], r_orig[1]["pts"][:, :3], atol=1e-4
    )
    # velodyne time field is f32 seconds -> ~1e-7 quantization
    np.testing.assert_allclose(
        r_back[1]["pts"][:, 3], r_orig[1]["pts"][:, 3], atol=2e-6
    )


@pytest.mark.slow
def test_run_dataset_cli_urbannav_end_to_end(tmp_path):
    """The UrbanNav workflow end to end: 2 asynchronous Velodynes (one
    with the rig's large rotation extrinsic), 400 Hz IMU, f32-seconds
    per-point time fields (timestamp_unit=SEC), driven through the real
    CLI with the urbannav config (config/UrbanNav.yaml:1-48)."""
    from malio_tpu.config import urbannav_config

    cfg = urbannav_config()
    ext_t = np.asarray(cfg.extrinsic_T).reshape(2, 3)
    ext_q = np.asarray(cfg.extrinsic_R).reshape(2, 4)
    seq = SyntheticSequence(
        duration=3.0,
        num_lidars=2,
        points_per_scan=4096,
        imu_rate=400.0,
        ext_t=ext_t,
        ext_q_wxyz=ext_q,
    )
    imu, rounds, traj = seq.generate()
    root = tmp_path / "UrbanNavSynth"
    write_dataset(root, imu, rounds, ["vlp_left", "vlp_right"], traj=traj)

    repo = pathlib.Path(__file__).resolve().parents[1]
    out = tmp_path / "traj.txt"
    r = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts" / "run_dataset.py"),
            str(root),
            "--config", "urbannav",
            "--cpu", "--f64",
            "--max-points", "2048",
            "--map-capacity", str(1 << 17),
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = np.loadtxt(out)
    assert rows.shape[0] >= 20 and rows.shape[1] == 8
    m = re.search(r"ATE RMSE \(aligned\) vs groundtruth: ([0-9.]+) m", r.stdout)
    assert m, r.stdout[-2000:]
    assert float(m.group(1)) < 0.5, r.stdout[-1500:]


@pytest.mark.slow
def test_run_dataset_cli_end_to_end(tmp_path):
    """The real CLI on an exported tree: decode (8x decimation), grouping,
    fusion, TUM output, groundtruth ATE — the City workflow end to end."""
    ext_t = np.array([[0.215, 0.0, 0.018]])  # city-ouster extrinsic
    seq = SyntheticSequence(
        duration=3.0, num_lidars=1, points_per_scan=8192, ext_t=ext_t
    )
    imu, rounds, traj = seq.generate()
    root = tmp_path / "CitySynth"
    write_dataset(root, imu, rounds, ["ouster"], traj=traj)
    assert (root / "Groundtruth.txt").exists()
    assert (root / "sensor_data" / "data_stamp.csv").exists()

    repo = pathlib.Path(__file__).resolve().parents[1]
    out = tmp_path / "traj.txt"
    r = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts" / "run_dataset.py"),
            str(root),
            "--config", "city-ouster",
            "--cpu", "--f64",
            "--max-points", "2048",
            "--map-capacity", str(1 << 17),
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert out.exists()
    rows = np.loadtxt(out)
    assert rows.shape[0] >= 20 and rows.shape[1] == 8
    m = re.search(r"ATE RMSE \(aligned\) vs groundtruth: ([0-9.]+) m", r.stdout)
    assert m, r.stdout[-2000:]
    assert float(m.group(1)) < 0.5, r.stdout[-1500:]
