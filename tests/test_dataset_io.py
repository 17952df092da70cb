"""Round-trip tests for the dataset binary readers: write files in the
file-player layout, read them back, check decode + preprocess semantics."""
import numpy as np
import pytest

from malio_tpu.io import dataset as ds


def _write(tmp_path, sensor, stamp_ns, recs):
    d = tmp_path / "sensor_data" / ds.SENSOR_DIRS[sensor][0]
    d.mkdir(parents=True, exist_ok=True)
    recs.tofile(d / f"{stamp_ns}.bin")
    return d / f"{stamp_ns}.bin"


def test_ouster_decode(tmp_path):
    n = 100
    r = np.zeros(n, ds.OUSTER_DTYPE)
    r["x"] = np.arange(n)
    r["y"] = 1.0
    r["z"] = 2.0
    r["t"] = (np.arange(n) * 1e6).astype(np.uint32)  # 1 ms apart
    f = _write(tmp_path, "ouster", 10**18, r)
    pts, dur = ds.decode_ouster(f, point_filter_num=2)
    assert pts.shape[0] == 50
    np.testing.assert_allclose(pts[1, 3], 2e-3, atol=1e-9)  # idx 2 -> 2 ms
    np.testing.assert_allclose(dur, 98e-3, atol=1e-9)


def test_ouster_blind_filter(tmp_path):
    r = np.zeros(10, ds.OUSTER_DTYPE)
    r["x"] = np.linspace(0.1, 5.0, 10)
    f = _write(tmp_path, "ouster", 10**18, r)
    pts, _ = ds.decode_ouster(f, point_filter_num=1, blind=1.0)
    assert (np.linalg.norm(pts[:, :3], axis=1) >= 1.0).all()


def test_livox_tag_filter(tmp_path):
    n = 12
    r = np.zeros(n, ds.LIVOX_DTYPE)
    r["x"] = np.arange(n) + 1.0
    r["line"] = 1
    r["tag"] = 0x10
    r["tag"][3] = 0x20  # rejected tag bits
    r["line"][4] = 99  # line >= n_scans
    r["offset_time"] = (np.arange(n) * 1e6).astype(np.uint32)
    f = _write(tmp_path, "livox_avia", 10**18, r)
    pts, dur = ds.decode_livox(f, point_filter_num=1, n_scans=8)
    # i=0 skipped (loop from 1), idx 3 and 4 filtered
    assert pts.shape[0] == n - 3
    assert not np.any(np.isclose(pts[:, 0], 4.0))  # tag-rejected
    assert not np.any(np.isclose(pts[:, 0], 5.0))  # line-rejected


def test_velodyne_decode(tmp_path):
    n = 20
    r = np.zeros(n, ds.VELODYNE_DTYPE)
    r["x"] = 3.0
    r["time"] = np.linspace(0, 0.09, n).astype(np.float32)  # seconds
    f = _write(tmp_path, "vlp_left", 10**18, r)
    pts, dur = ds.decode_velodyne(f, point_filter_num=1)
    np.testing.assert_allclose(dur, 0.09, atol=1e-6)
    np.testing.assert_allclose(pts[-1, 3], 0.09, atol=1e-6)


def test_imu_csv_formats(tmp_path):
    p = tmp_path / "xsens_imu.csv"
    rows = [
        # 8-col (orientation only) -> skipped
        "1000000000,0,0,0,1,0.1,0.2,0.3",
        # 11-col
        "1010000000,0,0,0,1,0.01,0.02,0.03,0.1,0.2,9.8",
        # 17-col: stamp,q(4),gyro(3),acc(3),a_raw(3),mag(3)
        "1020000000,0,0,0,1,0.04,0.05,0.06,0.5,0.6,9.7,1,2,3,0.1,0.2,0.3",
    ]
    p.write_text("\n".join(rows) + "\n")
    imu = ds.read_imu_csv(p)
    assert imu.shape == (2, 7)
    np.testing.assert_allclose(imu[0, 0], 1.01, atol=1e-9)
    np.testing.assert_allclose(imu[0, 1:4], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imu[0, 4:7], [0.1, 0.2, 9.8])
    np.testing.assert_allclose(imu[1, 1:4], [0.04, 0.05, 0.06])
    np.testing.assert_allclose(imu[1, 4:7], [0.5, 0.6, 9.7])


def test_load_sequence_rounds(tmp_path):
    # two sensors, 3 scans each at 10 Hz, slightly offset
    base = 10**18
    for k in range(3):
        r = np.zeros(50, ds.OUSTER_DTYPE)
        r["x"] = 5.0
        r["t"] = (np.arange(50) * 1.8e6).astype(np.uint32)
        _write(tmp_path, "ouster", base + k * 10**8, r)
        r2 = np.zeros(50, ds.LIVOX_DTYPE)
        r2["x"] = 6.0
        r2["line"] = 0
        r2["offset_time"] = (np.arange(50) * 1.8e6).astype(np.uint32)
        _write(tmp_path, "livox_avia", base + 3 * 10**7 + k * 10**8, r2)
    imu_rows = []
    for i in range(120):
        t = base - 10**8 + i * 10**7  # 100 Hz covering the scans
        imu_rows.append(f"{t},0,0,0,1,0,0,0,0,0,9.81")
    (tmp_path / "sensor_data" / "xsens_imu.csv").write_text("\n".join(imu_rows))

    imu, rounds = ds.load_sequence(
        tmp_path, ["ouster", "livox_avia"], [ds.OUST64, ds.AVIA], [1, 1], [8, 8]
    )
    assert len(rounds) == 3
    assert imu.shape[0] == 120
    r0 = rounds[0]
    assert abs(r0[1]["beg_t"] - r0[0]["beg_t"] - 0.03) < 1e-6
    # per-point times are absolute (relative to sequence t0)
    assert r0[0]["pts"][0, 3] >= r0[0]["beg_t"] - 1e-9
    assert r0[0]["end_t"] > r0[0]["beg_t"]


def test_dropped_file_desyncs_one_round(tmp_path):
    """ApproximateTime semantics: a missing scan file in one stream costs
    one round; later rounds re-align by timestamp (round-1 index pairing
    drifted for the rest of the sequence)."""
    base = 10**18
    ks = list(range(8))
    for k in ks:
        r = np.zeros(20, ds.OUSTER_DTYPE)
        r["x"] = 5.0
        r["t"] = (np.arange(20) * 1.8e6).astype(np.uint32)
        _write(tmp_path, "ouster", base + k * 10**8, r)
    for k in ks:
        if k == 3:
            continue  # dropped file in the livox stream
        r2 = np.zeros(20, ds.LIVOX_DTYPE)
        r2["x"] = 6.0
        r2["line"] = 0
        r2["offset_time"] = (np.arange(20) * 1.8e6).astype(np.uint32)
        _write(tmp_path, "livox_avia", base + 10**7 + k * 10**8, r2)
    imu_rows = []
    for i in range(200):
        t = base - 10**8 + i * 10**7
        imu_rows.append(f"{t},0,0,0,1,0,0,0,0,0,9.81")
    (tmp_path / "sensor_data" / "xsens_imu.csv").write_text("\n".join(imu_rows))

    imu, rounds = ds.load_sequence(
        tmp_path, ["ouster", "livox_avia"], [ds.OUST64, ds.AVIA], [1, 1], [8, 8]
    )
    # every surviving round pairs scans within half a period
    paired = 0
    for rnd in rounds:
        dt = abs(rnd[1]["beg_t"] - rnd[0]["beg_t"])
        if dt <= 0.05 + 1e-9:
            paired += 1
    assert paired >= len(ks) - 2, (paired, len(rounds))


def test_imu_time_offset_applied(tmp_path):
    base = 10**18
    for k in range(3):
        r = np.zeros(20, ds.OUSTER_DTYPE)
        r["x"] = 5.0
        r["t"] = (np.arange(20) * 1.8e6).astype(np.uint32)
        _write(tmp_path, "ouster", base + k * 10**8, r)
    (tmp_path / "sensor_data" / "xsens_imu.csv").write_text(
        "\n".join(f"{base + i * 10**7},0,0,0,1,0,0,0,0,0,9.81" for i in range(20))
    )
    imu0, rounds0 = ds.load_sequence(
        tmp_path, ["ouster"], [ds.OUST64], [1], [8]
    )
    imu1, rounds1 = ds.load_sequence(
        tmp_path, ["ouster"], [ds.OUST64], [1], [8],
        time_offset_lidar_to_imu=0.05,
    )
    # IMU stream moves 50 ms earlier relative to the scans
    d0 = imu0[0, 0] - rounds0[0][0]["beg_t"]
    d1 = imu1[0, 0] - rounds1[0][0]["beg_t"]
    # f64 resolution at absolute-ns stamps (~1e9 s) is ~0.1 us
    np.testing.assert_allclose(d0 - d1, 0.05, atol=1e-6)


def test_velodyne_timestamp_unit(tmp_path):
    n = 10
    r = np.zeros(n, ds.VELODYNE_DTYPE)
    r["x"] = 3.0
    r["time"] = np.linspace(0, 90000.0, n).astype(np.float32)  # microseconds
    f = _write(tmp_path, "vlp_left", 10**18, r)
    pts, dur = ds.decode_velodyne(
        f, point_filter_num=1, time_unit_scale=ds.TIME_UNIT_SCALE[2]
    )
    np.testing.assert_allclose(dur, 0.09, atol=1e-6)
