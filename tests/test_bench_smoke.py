"""Smoke test of the bench code path (miniature batched replay on CPU) so
driver benchmark runs can't break silently."""
import numpy as np
import pytest

from malio_tpu.batched import synthetic_batched_benchmark


@pytest.mark.slow
def test_batched_benchmark_smoke():
    res = synthetic_batched_benchmark(batch=2, duration=3.0, points=512, warmup=2)
    assert res["rounds"] > 10
    assert np.isfinite(res["aggregate_scans_per_sec"])
    assert len(res["ates"]) == 2
    assert all(np.isfinite(a) for a in res["ates"])


@pytest.mark.slow
def test_flagship_benchmark_smoke():
    """Miniature City config-3 shape through the flagship bench path (3
    LiDARs, City extrinsics, wide-reach k-NN) so bench.py can't break
    silently; full scale runs on the TPU driver."""
    from malio_tpu.batched import flagship_benchmark

    res = flagship_benchmark(
        batch=2, duration=3.0, points_per_lidar=256, passes=2, chunk=4,
        warmup=2,
    )
    assert res["rounds"] > 8
    assert len(res["values"]) == 2
    assert np.isfinite(res["median"]) and np.isfinite(res["best"])
    assert res["best"] >= res["median"]
    assert all(np.isfinite(a) for a in res["ates"])
    assert res["points_per_round"] == 3 * 256
