"""Native (C++) decoder vs NumPy decoder cross-validation."""
import numpy as np
import pytest

from malio_tpu.io import native, dataset as ds

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def test_native_matches_numpy_ouster(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    for k in range(4):
        r = np.zeros(500, ds.OUSTER_DTYPE)
        r["x"] = rng.normal(size=500) * 10
        r["y"] = rng.normal(size=500) * 10
        r["z"] = rng.normal(size=500)
        r["t"] = np.sort(rng.uniform(0, 95e6, 500)).astype(np.uint32)
        f = tmp_path / f"{10**18 + k}.bin"
        r.tofile(f)
        files.append(f)
    out, counts, durs = native.batch_decode(
        files, "ouster", point_filter_num=2, blind=1.0, cap=1000
    )
    for k, f in enumerate(files):
        pts, dur = ds.decode_ouster(f, point_filter_num=2, blind=1.0)
        assert counts[k] == pts.shape[0]
        np.testing.assert_allclose(out[k, : counts[k]], pts, atol=1e-12)
        np.testing.assert_allclose(durs[k], dur, atol=1e-12)


def test_native_matches_numpy_livox(tmp_path):
    rng = np.random.default_rng(1)
    files = []
    for k in range(3):
        r = np.zeros(400, ds.LIVOX_DTYPE)
        r["x"] = rng.normal(size=400) * 5 + 10
        r["line"] = rng.integers(0, 8, 400).astype(np.uint8)
        r["tag"] = 0x10
        r["tag"][::7] = 0x20
        r["offset_time"] = np.sort(rng.uniform(0, 95e6, 400)).astype(np.uint32)
        f = tmp_path / f"lv{k}.bin"
        r.tofile(f)
        files.append(f)
    out, counts, durs = native.batch_decode(
        files, "livox", point_filter_num=3, n_scans=8, cap=1000
    )
    for k, f in enumerate(files):
        pts, dur = ds.decode_livox(f, point_filter_num=3, n_scans=8)
        assert counts[k] == pts.shape[0]
        np.testing.assert_allclose(out[k, : counts[k]], pts, atol=1e-12)


def test_native_matches_numpy_velodyne(tmp_path):
    rng = np.random.default_rng(2)
    r = np.zeros(300, ds.VELODYNE_DTYPE)
    r["x"] = rng.normal(size=300) * 8 + 5
    r["time"] = np.sort(rng.uniform(0, 0.095, 300)).astype(np.float32)
    f = tmp_path / "v.bin"
    r.tofile(f)
    out, counts, durs = native.batch_decode([f], "velodyne", point_filter_num=2, cap=500)
    pts, dur = ds.decode_velodyne(f, point_filter_num=2)
    assert counts[0] == pts.shape[0]
    np.testing.assert_allclose(out[0, : counts[0]], pts, atol=1e-12)
    np.testing.assert_allclose(durs[0], dur, atol=1e-6)


@pytest.mark.slow
def test_sanitizers_clean(tmp_path):
    """Thread/address-sanitized decoder stress (SURVEY §5 host-code
    sanitizers): oversubscribed batch_decode over all three record types
    plus the missing-file error path must produce zero TSan/ASan/UBSan
    reports."""
    import pathlib
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    nat = pathlib.Path(__file__).resolve().parents[1] / "native"
    build = subprocess.run(
        ["make", "-C", str(nat), "san_tsan", "san_asan"],
        capture_output=True, text=True,
    )
    assert build.returncode == 0, build.stderr
    for exe in ("san_tsan", "san_asan"):
        scratch = tmp_path / exe
        scratch.mkdir()
        r = subprocess.run(
            [str(nat / exe), str(scratch)], capture_output=True, text=True,
            timeout=300,
        )
        blob = r.stdout + r.stderr
        assert r.returncode == 0, (exe, blob[-2000:])
        assert "WARNING: ThreadSanitizer" not in blob, blob[-2000:]
        assert "ERROR: AddressSanitizer" not in blob, blob[-2000:]
        assert "runtime error" not in blob, blob[-2000:]  # UBSan
