import numpy as np
from malio_tpu.io.pcd import write_pcd, read_pcd


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(size=100).astype(np.float32)
    p = tmp_path / "a.pcd"
    write_pcd(p, pts, inten)
    data = read_pcd(p)
    np.testing.assert_allclose(data[:, :3], pts, atol=1e-7)
    np.testing.assert_allclose(data[:, 3], inten, atol=1e-7)


def test_pcd_ascii(tmp_path):
    pts = np.array([[1.0, 2, 3], [4, 5, 6]], np.float32)
    p = tmp_path / "b.pcd"
    write_pcd(p, pts, binary=False)
    data = read_pcd(p)
    np.testing.assert_allclose(data, pts, atol=1e-5)
