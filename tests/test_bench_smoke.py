"""Smoke test of the bench code path (miniature batched replay on CPU) so
driver benchmark runs can't break silently."""
import numpy as np
import pytest

from malio_tpu.batched import synthetic_batched_benchmark


@pytest.mark.slow
def test_batched_benchmark_smoke():
    # chunk=4: with the default chunk of 16 this short stream is a
    # single chunk, so the timed window is empty and the aggregate is
    # (correctly) reported as no-measurement
    res = synthetic_batched_benchmark(
        batch=2, duration=3.0, points=512, warmup=2, chunk=4
    )
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


@pytest.mark.slow
def test_f32_city_params_stay_stable_with_f64_solve_island():
    """Regression for the f32 filter detonation at the City working point:
    with ALL-f32 arrays (the TPU bench condition; x64 enabled so the
    esekf solve island runs f64) the stored-covariance median and P must
    stay bounded — the all-f32 solve grew P ~1.5x/round and reached
    normal_y ~1e10 by round 12."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from malio_tpu.batched import _flagship_config, _build_sequences, _init_seq
    from malio_tpu import pipeline
    from malio_tpu.runner import _stack_chunk

    cfg = _flagship_config(1024, 1 << 17, False)
    ext_t = np.asarray(cfg.extrinsic_T).reshape(3, 3)
    ext_q = np.asarray(cfg.extrinsic_R).reshape(3, 4)
    seqs = _build_sequences(
        cfg, 1, 4.0, 1024, dict(ext_t=ext_t, ext_q_wxyz=ext_q, range_max=24.0)
    )
    carry, stream, b0 = _init_seq(cfg, seqs[0][0], jnp.float32)
    prev = b0
    meds = []
    for g in stream[:16]:
        gd, bs = _stack_chunk([g], np.dtype(np.float32), prev)
        prev = float(bs[-1])
        g1 = jtu.tree_map(lambda a: a[0], gd)
        carry, out = pipeline.step(cfg, carry, g1)
        meds.append(float(out.med_normal_y))
    assert carry.P.dtype == jnp.float32  # stored state stays f32
    assert float(jnp.abs(carry.P).max()) < 0.1, float(jnp.abs(carry.P).max())
    # first fused round carries the reference's huge initial-P spike; the
    # steady state must settle to O(1) traces, not grow without bound
    assert max(meds[2:]) < 100.0, meds
    assert all(np.isfinite(m) for m in meds)
