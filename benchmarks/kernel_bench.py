#!/usr/bin/env python
"""Per-kernel benchmarks (the BASELINE 'kernel time' first-class metrics):
NN-search, IEKF update, map insert, undistortion, downsample — median wall
time over repeated same-input jitted calls on the default device.

Usage: python benchmarks/kernel_bench.py [--points N] [--map-capacity LOG2]
Prints a JSON object per kernel.
"""
import argparse
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--map-capacity", type=int, default=19)
    ap.add_argument("--lidars", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--trace",
        default="",
        help="also capture a JAX profiler trace of one full-step call into "
        "this directory (open with TensorBoard / xprof)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from malio_tpu import cache as _cache

    _cache.enable()
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from malio_tpu.config import Config
    from malio_tpu import pipeline, propagate as prop, measurement as meas, preprocess as pre
    from malio_tpu.map import voxel_hash as vh
    from malio_tpu.filter import esekf
    from malio_tpu.metrics import kernel_timer

    L = args.lidars
    ext_t = np.array([[0.2, 0, 0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])[:L]
    cfg = Config(
        num_lidars=L,
        lid_type=tuple([3] * L),
        n_scans=tuple([64] * L),
        point_filter_num=tuple([1] * L),
        extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
        extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (L, 1)).reshape(-1).tolist()),
        max_raw_points=args.points,
        max_points_per_scan=args.points,
        max_imu_per_group=32,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        map_capacity=1 << args.map_capacity,
        filter_size_surf=0.4,
        filter_size_map=0.4,
        cube_len=300.0,
        det_range=60.0,
        plane_th=0.1,
        cov_threshold=30.0,
    )
    carry, group = ge._dummy_inputs(cfg)
    dtype = jnp.float32
    M = L * cfg.max_points_per_scan

    results = {}

    und_j = jax.jit(
        lambda c, g: prop.undistort(
            cfg, c.x, c.P, c.hist, g, c.Q, c.last_in, c.last_imu, c.last_end_t, c.mean_acc_norm
        )
    )
    t, und = kernel_timer(und_j, carry, group)
    results["undistort"] = t

    ds_j = jax.jit(
        lambda u, g: jax.vmap(
            lambda p, e, m: pre.voxel_downsample(
                p, e[:, None].astype(dtype), m, cfg.filter_size_surf, cfg.max_points_per_scan
            )
        )(u.pts_deskewed, u.pt_epoch, g.pts_mask)
    )
    t, ds = kernel_timer(ds_j, und, group)
    results["downsample"] = t

    pts = ds[0].reshape(M, 3)
    msk = ds[2].reshape(M)
    ins_j = jax.jit(lambda m, p, mk: vh.insert(m, p, jnp.full((M,), 0.01, dtype), mk))
    t, m2 = kernel_timer(ins_j, carry.map, pts, msk)
    results["map_insert"] = t

    knn_j = jax.jit(lambda m, q: vh.knn(m, q, k=5, radius=cfg.knn_radius))
    t, _ = kernel_timer(knn_j, m2, pts)
    results["nn_search"] = t

    sd = meas.ScanData(
        pts_body=pts,
        pt_lidar=jnp.repeat(jnp.arange(L, dtype=jnp.int32), cfg.max_points_per_scan),
        pt_epoch=jnp.zeros((M,), jnp.int32),
        pt_mask=msk,
        tc_q=und.tc_q,
        tc_t=und.tc_t,
        base=und.base,
        unc_q=und.unc_q,
        unc_t=und.unc_t,
        unc_cov=und.unc_cov,
        epoch_count=und.epoch_count,
    )
    # make_h_share must be called INSIDE the jit: calling it eagerly would
    # close the jitted lambda over device arrays (map/scan tensors), which
    # the axon runtime punishes with a permanent ~24 ms per-dispatch penalty
    # for the rest of the process (see benchmarks/RESULTS.md round 2).
    # It now also performs the round's one gathering search and returns
    # the prefilled candidate cache.
    def _upd(x, P, m, s):
        h, c0 = meas.make_h_share(cfg, m, s, x)
        return esekf.update_iterated(x, P, h, c0, max_iter=cfg.max_iteration)

    upd_j = jax.jit(_upd)
    t, _ = kernel_timer(upd_j, carry.x, carry.P, m2, sd)
    results["iekf_update"] = t

    step_j = jax.jit(lambda c, g: pipeline.step(cfg, c, g))
    t, _ = kernel_timer(step_j, carry, group)
    results["full_step"] = t

    if args.trace:
        # structured tracing (SURVEY §5: the reference has only wall-clock
        # printfs; profiler traces are the rebuild's first-class analog)
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(step_j(carry, group))
        print(json.dumps({"trace": args.trace}))

    dev = jax.devices()[0].platform
    for k, v in results.items():
        print(
            json.dumps(
                {"kernel": k, "ms": round(v * 1000, 2), "points": M, "device": dev}
            )
        )


if __name__ == "__main__":
    main()
