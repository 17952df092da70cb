#!/usr/bin/env python
"""Benchmark: steady-state fusion throughput (scans/sec) on the default
JAX device (the TPU chip under axon; CPU if forced).

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s", "vs_baseline": R}

Baseline: the C++ reference runs the 3-LiDAR City sequences at roughly
real time on a desktop CPU — its instrumented per-scan compute time is
~50 ms (laserMapping.cpp:825-826 prints it live; README recommends a
desktop-class machine), i.e. ~20 scan-groups/sec. vs_baseline = value / 20.
"""
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

BASELINE_SCANS_PER_SEC = 20.0


def main():
    import jax
    import jax.numpy as jnp

    from malio_tpu import cache as _cache
    _cache.enable()

    from malio_tpu.config import Config
    from malio_tpu.io.synthetic import SyntheticSequence
    from malio_tpu.io.assemble import assemble_groups
    from malio_tpu import runner, pipeline, propagate as prop

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    dtype = jnp.float32 if on_tpu else (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    L = 3
    ext_t = np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])
    cfg = Config(
        num_lidars=L,
        lid_type=(3, 1, 1),
        n_scans=(64, 8, 8),
        point_filter_num=(1, 1, 1),
        extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
        extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (L, 1)).reshape(-1).tolist()),
        max_raw_points=4096,
        max_points_per_scan=4096,
        max_imu_per_group=32,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        map_capacity=1 << 19,
        filter_size_surf=0.4,
        filter_size_map=0.4,
        cube_len=300.0,
        det_range=60.0,
        plane_th=0.1,
        cov_threshold=30.0,
    )
    seq = SyntheticSequence(duration=8.0, num_lidars=L, points_per_scan=4096, ext_t=ext_t)
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)

    # steady-state throughput with async dispatch: mark wall time at round 8
    # (after compile + map bootstrap), sync only at the very end — host prep
    # of round k+1 overlaps device compute of round k
    marks = {}

    def cb(carry, out):
        k = marks.setdefault("n", 0) + 1
        marks["n"] = k
        if k == 8:
            out.pos.block_until_ready()
            marks["t8"] = time.perf_counter()
        marks["last"] = out

    res = runner.run_sequence(cfg, groups, dtype=dtype, callback=cb)
    n = marks.get("n", 0)
    if n < 16 or "t8" not in marks:
        print(json.dumps({"metric": "scans_per_sec", "value": 0.0, "unit": "scans/s", "vs_baseline": 0.0}))
        return
    marks["last"].pos.block_until_ready()
    t_end = time.perf_counter()
    value = (n - 8) / (t_end - marks["t8"])
    print(
        json.dumps(
            {
                "metric": "scans_per_sec",
                "value": round(value, 3),
                "unit": "scans/s",
                "vs_baseline": round(value / BASELINE_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
