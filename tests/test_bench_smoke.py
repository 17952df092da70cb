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
