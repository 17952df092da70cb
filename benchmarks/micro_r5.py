#!/usr/bin/env python
"""Round-5 step-cost attribution A/Bs at the flagship shape.

Each variant replays the SAME pre-stacked flagship stream through the
scan-chunked path and reports steady-state scans/s; differences against
the baseline attribute cost to one knob at a time:

  base        : flagship defaults (max_iteration=3, chunk=8)
  iter1       : max_iteration=1 -> marginal cost of the 2-3 extra IEKF
                iterations (h_share re-rank + solve each)
  chunk16     : 16 rounds per dispatch -> remaining dispatch overhead
  single      : single_search=True -> cost of in-loop re-ranks alone

Run on the TPU host: python benchmarks/micro_r5.py [variants...]
"""
import sys
import pathlib
import dataclasses

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from malio_tpu import cache as _cache

_cache.enable()

import jax.numpy as jnp

from malio_tpu import batched as bt


def run(tag, duration=6.0, points=4096, chunk=8, **cfg_over):
    cfg = bt._flagship_config(points, 1 << 21, False)
    if cfg_over:
        cfg = dataclasses.replace(cfg, **cfg_over)
    ext_t = np.asarray(cfg.extrinsic_T, np.float64).reshape(3, 3)
    ext_q = np.asarray(cfg.extrinsic_R, np.float64).reshape(3, 4)
    seqs = bt._build_sequences(
        cfg, 1, duration, points,
        dict(
            ext_t=ext_t, ext_q_wxyz=ext_q, range_max=35.0,
            world_kwargs=dict(n_planes=96, extent=40.0, patch=10.0, grid=0.3),
        ),
    )
    values, ates, n_rounds, stats = bt._run_benchmark(
        cfg, seqs, jnp.float32, chunk, 8, 2
    )
    v = float(np.median(values)) if values else float("nan")
    print(
        f"{tag:10s} {v:7.2f} scans/s  ate={ates[0]:.4f} "
        f"miss_p50={stats['nn_miss_p50']:.0f} rounds={n_rounds}"
    )
    return v


def main():
    which = sys.argv[1:] or ["base", "iter1", "chunk16", "single"]
    if "base" in which:
        run("base")
    if "iter1" in which:
        run("iter1", max_iteration=1)
    if "chunk16" in which:
        run("chunk16", chunk=16)
    if "single" in which:
        run("single", single_search=True)
    if "nocap" in which:
        run("nocap", max_meas_points=None)
    if "nowide" in which:
        run("nowide", knn_wide_budget=0)


if __name__ == "__main__":
    main()
