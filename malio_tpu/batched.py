"""Batched multi-sequence replay (BASELINE config 5): B independent
sequences fused in lockstep through a vmapped step. On one chip this fills
occupancy a single sequence leaves idle (the per-round graph is small);
on a mesh the batch axis shards over dp. Used by scripts/run_batched.py
and bench.py."""
from __future__ import annotations

import time

import numpy as np


def synthetic_batched_benchmark(
    batch=16, duration=6.0, points=2048, dtype=None, chunk=16, warmup=8,
    single_search=False,
):
    """Run B synthetic sequences through the vmapped step; returns a dict
    with aggregate scans/s and per-sequence aligned ATE."""
    import jax
    import jax.numpy as jnp

    from malio_tpu.config import Config
    from malio_tpu.io.synthetic import SyntheticSequence
    from malio_tpu.io.assemble import assemble_groups
    from malio_tpu import runner, pipeline
    from malio_tpu.runner import _stack_chunk, group_base
    from malio_tpu.eval import ate

    if dtype is None:
        dtype = jnp.float32
    B = batch
    L = 1
    cfg = Config(
        num_lidars=L,
        lid_type=(3,),
        n_scans=(64,),
        point_filter_num=(1,),
        extrinsic_T=(0.2, 0.0, 0.0),
        extrinsic_R=(1.0, 0, 0, 0),
        max_raw_points=points,
        max_points_per_scan=points,
        max_imu_per_group=32,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        map_capacity=1 << 17,
        filter_size_surf=0.4,
        filter_size_map=0.4,
        cube_len=300.0,
        det_range=60.0,
        plane_th=0.1,
        cov_threshold=30.0,
        single_search=single_search,
    )

    seqs = []
    for b in range(B):
        seq = SyntheticSequence(
            duration=duration, num_lidars=L, points_per_scan=points,
            ext_t=np.array([[0.2, 0.0, 0.0]]), seed=b,
        )
        imu, rounds, traj = seq.generate()
        groups = assemble_groups(cfg, imu, rounds)
        seqs.append((groups, traj))

    carries, streams, bases = [], [], []
    for groups, _ in seqs:
        init = runner.ImuInitializer()
        start = 0
        prev_last = np.zeros(7)
        for gi, g in enumerate(groups):
            m = np.asarray(g["imu_mask"])
            last = (
                np.asarray(g["imu"], np.float64)[m.nonzero()[0][-1]]
                if m.any()
                else prev_last
            )
            if gi > 0 and init.done:
                start = gi
                break
            init.update(np.asarray(g["imu"], np.float64), g["imu_mask"])
            prev_last = last
        x0 = runner.initial_state(cfg, init, dtype)
        P0 = runner.initial_covariance(cfg, dtype)
        Q = runner.process_noise(cfg, init, dtype)
        c = pipeline.init_carry(cfg, x0, P0, Q, dtype)
        b0 = group_base(groups[start])
        c = c._replace(
            mean_acc_norm=jnp.asarray(np.linalg.norm(init.mean_acc), dtype),
            last_imu=jnp.asarray(prev_last, dtype).at[0].add(-b0),
        )
        carries.append(c)
        streams.append(groups[start:])
        bases.append(b0)

    n_rounds = min(len(s) for s in streams)
    # full chunks only: the benchmark scans each chunk as ONE dispatch
    n_rounds -= n_rounds % chunk
    batched_carry = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    vscan = jax.jit(
        lambda c, gs: jax.lax.scan(
            lambda cc, g: jax.vmap(lambda c1, g1: pipeline.step(cfg, c1, g1))(cc, g),
            c,
            gs,
        )
    )

    np_dtype = np.float32
    outs = []  # (stacked StepOutput with leading (K, B), bases (K, B))
    t_mark = None
    n_done = 0
    prev_bases = list(bases)
    for c0 in range(0, n_rounds, chunk):
        per_seq = []
        for b in range(B):
            ch = streams[b][c0 : c0 + chunk]
            g, bs = _stack_chunk(ch, np_dtype, prev_bases[b])
            prev_bases[b] = float(bs[-1])
            per_seq.append((g, bs))
        gb = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=1), *[p[0] for p in per_seq]
        )
        batched_carry, stacked = vscan(batched_carry, gb)
        outs.append((stacked, np.stack([p[1] for p in per_seq], axis=1)))
        n_done += chunk
        if t_mark is None and n_done >= warmup:
            stacked.pos.block_until_ready()
            t_mark = time.perf_counter()
            n_warm = n_done
    outs[-1][0].pos.block_until_ready()
    t_end = time.perf_counter()
    agg = (n_done - n_warm) * B / (t_end - t_mark) if t_mark else float("nan")

    ates = []
    for b in range(B):
        pos = np.concatenate([np.asarray(o.pos[:, b]) for o, _ in outs])
        ts = np.concatenate(
            [np.asarray(o.end_time[:, b]) + bs[:, b] for o, bs in outs]
        )
        gt = seqs[b][1].pos(ts)
        ates.append(ate.ate_rmse(pos, gt))
    return dict(aggregate_scans_per_sec=agg, per_seq=agg / B, ates=ates, rounds=n_done)
