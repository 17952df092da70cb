"""Batched multi-sequence replay (BASELINE config 5): B independent
sequences fused in lockstep through a vmapped step. On one chip this fills
occupancy a single sequence leaves idle (the per-round graph is small);
on a mesh the batch axis shards over dp. Used by scripts/run_batched.py
and bench.py.

Two benchmark entry points:

  * ``synthetic_batched_benchmark`` — the light round-1/2 configuration
    (1 LiDAR, 2048 pts, 1<<17-slot map), kept for cross-round
    comparability with BENCH_r01/r02.
  * ``flagship_benchmark`` — the City config-3 working point (VERDICT
    round-2 item 3): 3 LiDARs with the City rig extrinsics
    (config/City.yaml:24-39), ~12k downsampled points per fusion round,
    a 1<<21-slot map, City weighting laws and reference-reach k-NN
    (launch/mapping_city.launch:9-15). Reports the MEDIAN across timed
    passes as the honest steady-state number and the best as an upper
    bound on relay jitter.
"""
from __future__ import annotations

import time

import numpy as np


def _light_config(points, single_search):
    from malio_tpu.config import Config

    return Config(
        num_lidars=1,
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


def _flagship_config(points_per_lidar, map_slots, single_search):
    """City config-3 shape with benchmark-sized rolling capacities.

    The estimator parameters (weighting laws, iteration budget, filter
    sizes, det_range, wide-reach k-NN) are the City launch values via
    city_config(); only the static array capacities are set to the
    benchmark working point."""
    from malio_tpu.config import city_config

    # max_imu_per_group 16: the City rig runs a 100 Hz IMU against 10 Hz
    # fusion rounds (~10-11 samples + sync slack per group); the padded
    # propagation scans run max_imu steps regardless of fill, so a 32
    # capacity paid ~2x the sequential scan length for nothing
    return city_config(
        max_raw_points=points_per_lidar,
        max_points_per_scan=points_per_lidar,
        max_imu_per_group=16,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        map_capacity=map_slots,
        single_search=single_search,
        # measurement-lane compaction at 13/16 (~81%): ~30% of flagship
        # lanes are downsample padding (round-4 SoL). The first 75% cap
        # clipped 160 live lanes at peak (BENCH r5 meas_dropped) — 13/16
        # clears the measured peak with margin while still dropping ~19%
        # of dead-lane work; overflow is counted in n_meas_dropped and
        # watched by the bench stats
        max_meas_points=(3 * points_per_lidar) * 13 // 16,
    )


def _build_sequences(cfg, batch, duration, points_per_scan, seq_kwargs):
    """Generate B synthetic sequences and assemble their measure groups."""
    from malio_tpu.io.synthetic import SyntheticSequence
    from malio_tpu.io.assemble import assemble_groups

    seqs = []
    for b in range(batch):
        seq = SyntheticSequence(
            duration=duration,
            num_lidars=cfg.num_lidars,
            points_per_scan=points_per_scan,
            seed=b,
            **seq_kwargs,
        )
        imu, rounds, traj = seq.generate()
        groups = assemble_groups(cfg, imu, rounds)
        seqs.append((groups, traj))
    return seqs


def _init_seq(cfg, groups, dtype):
    """IMU-initialize one sequence; returns (carry, post-init groups, base)."""
    import jax.numpy as jnp

    from malio_tpu import runner, pipeline
    from malio_tpu.runner import group_base

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
    return c, groups[start:], b0


def _stack_batched_chunks(streams, bases, n_rounds, chunk, np_dtype):
    """Pre-stack every (chunk, B) device group so timed passes measure pure
    device work, not host marshalling. Returns [(group, bases (K, B))]."""
    import jax
    import jax.numpy as jnp

    from malio_tpu.runner import _stack_chunk

    B = len(streams)
    chunks = []
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
        chunks.append((gb, np.stack([p[1] for p in per_seq], axis=1)))
    return chunks


def _timed_pass(vscan, carry0, chunks, warmup, chunk):
    """One replay of all chunks from the initial carry. Times rounds after
    the first `warmup` rounds; returns (scans/s aggregate, stacked outs).

    The timing fences are HOST FETCHES (np.asarray), not
    block_until_ready: through the remote-TPU relay a block can return
    before the remote execution has actually retired, which inflates
    throughput ~10x; a materialized host value cannot lie."""
    outs = []
    t_mark = None
    n_warm = 0
    n_done = 0
    carry = carry0
    for gb, bs in chunks:
        carry, stacked = vscan(carry, gb)
        outs.append((stacked, bs))
        n_done += chunk
        if t_mark is None and n_done >= warmup:
            np.asarray(stacked.pos)
            t_mark = time.perf_counter()
            n_warm = n_done
    np.asarray(outs[-1][0].pos)
    t_end = time.perf_counter()
    B = outs[-1][0].pos.shape[1]
    # n_done == n_warm means the warmup threshold was only reached on the
    # final chunk: there is no timed window, so report no-measurement
    # (0/epsilon = 0.0 would pass the isfinite filter and drag medians)
    agg = (
        (n_done - n_warm) * B / (t_end - t_mark)
        if t_mark is not None and n_done > n_warm
        else float("nan")
    )
    return agg, outs


def _ates_from_outs(outs, seqs):
    from malio_tpu.eval import ate

    B = len(seqs)
    ates = []
    for b in range(B):
        pos = np.concatenate([np.asarray(o.pos[:, b]) for o, _ in outs])
        ts = np.concatenate(
            [np.asarray(o.end_time[:, b]) + bs[:, b] for o, bs in outs]
        )
        gt = seqs[b][1].pos(ts)
        ates.append(ate.ate_rmse(pos, gt))
    return ates


def _run_benchmark(cfg, seqs, dtype, chunk, warmup, passes):
    """Shared driver: init carries, pre-stack chunks, run `passes` timed
    replays of the identical stream, compute ATE from the last pass."""
    import jax
    import jax.numpy as jnp

    from malio_tpu import pipeline

    carries, streams, bases = [], [], []
    for groups, _ in seqs:
        c, stream, b0 = _init_seq(cfg, groups, dtype)
        carries.append(c)
        streams.append(stream)
        bases.append(b0)

    n_rounds = min(len(s) for s in streams)
    # full chunks only: the benchmark scans each chunk as ONE dispatch
    n_rounds -= n_rounds % chunk
    carry0 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    if chunk == 1:
        # per-round async dispatch. NOTE (round 4): each dispatch through
        # the relay pays ~15-30 ms of non-pipelined submission overhead,
        # so chunked lax.scan (one dispatch per K rounds) is the honest
        # production shape now that the flagship scan compiles (the
        # round-3 scoped-vmem failures are fixed); chunk=1 remains for
        # per-round observation
        vstep = jax.jit(
            lambda c, g: jax.vmap(lambda c1, g1: pipeline.step(cfg, c1, g1))(c, g)
        )

        def vscan(c, gs):
            g1 = jax.tree_util.tree_map(lambda a: a[0], gs)
            c2, o = vstep(c, g1)
            return c2, jax.tree_util.tree_map(lambda a: a[None], o)
    else:
        vscan = jax.jit(
            lambda c, gs: jax.lax.scan(
                lambda cc, g: jax.vmap(lambda c1, g1: pipeline.step(cfg, c1, g1))(cc, g),
                c,
                gs,
            )
        )
    chunks = _stack_batched_chunks(
        streams, bases, n_rounds, chunk, np.dtype(np.float32)
    )

    values = []
    outs = None
    for _ in range(max(1, passes)):
        agg, outs = _timed_pass(vscan, carry0, chunks, warmup, chunk)
        if np.isfinite(agg):
            values.append(float(agg))
    ates = _ates_from_outs(outs, seqs)
    # escalation-demand signal: per-round acceptance misses after the
    # wide pass (sizes knn_wide_budget from data, VERDICT round-3 item 2)
    miss = np.concatenate(
        [np.asarray(o.nn_miss).reshape(-1) for o, _ in outs]
    ) if outs and hasattr(outs[0][0], "nn_miss") else np.zeros(0)
    drops = np.concatenate(
        [np.asarray(o.map_dropped).reshape(-1) for o, _ in outs]
    ) if outs else np.zeros(0)
    mdrop = np.concatenate(
        [np.asarray(o.n_meas_dropped).reshape(-1) for o, _ in outs]
    ) if outs and hasattr(outs[0][0], "n_meas_dropped") else np.zeros(0)
    stats = dict(
        nn_miss_p50=float(np.median(miss)) if miss.size else 0.0,
        nn_miss_p99=float(np.percentile(miss, 99)) if miss.size else 0.0,
        nn_miss_max=float(miss.max()) if miss.size else 0.0,
        map_dropped_final=float(drops.max()) if drops.size else 0.0,
        # live lanes clipped by the measurement-compaction cap: nonzero
        # means the 75% cap is undersized for this world — raise it
        meas_dropped_max=float(mdrop.max()) if mdrop.size else 0.0,
    )
    return values, ates, n_rounds, stats


def synthetic_batched_benchmark(
    batch=16, duration=6.0, points=2048, dtype=None, chunk=16, warmup=8,
    single_search=False,
):
    """Run B synthetic sequences through the vmapped step; returns a dict
    with aggregate scans/s and per-sequence aligned ATE. One timed pass
    (callers that want multiple passes loop themselves, matching the
    round-1/2 bench.py behavior)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    cfg = _light_config(points, single_search)
    seqs = _build_sequences(
        cfg, batch, duration, points, dict(ext_t=np.array([[0.2, 0.0, 0.0]]))
    )
    values, ates, n_rounds, _stats = _run_benchmark(cfg, seqs, dtype, chunk, warmup, 1)
    agg = values[0] if values else float("nan")
    return dict(
        aggregate_scans_per_sec=agg, per_seq=agg / batch, ates=ates,
        rounds=n_rounds,
    )


def flagship_benchmark(
    batch=16, duration=6.0, points_per_lidar=4096, passes=3, chunk=8,
    warmup=8, map_slots=None, single_search=False, dtype=None,
):
    """City config-3 flagship-shape benchmark: 3 LiDARs (City extrinsics),
    3*points_per_lidar downsampled points per fusion round, a 1<<21-slot
    map at full scale, City weighting laws + reference-reach k-NN.

    Runs `passes` timed replays of the same pre-stacked stream (pass 1
    includes compile; warmup rounds inside each pass are excluded) and
    reports the per-pass throughputs plus their median and best.

    Matches the workload of launch/mapping_city.launch + config/City.yaml:
    Ouster-128 + Livox Avia + Livox Tele at filter_size 0.5 yields ~4k
    points per LiDAR per round into a multi-million-point local map."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    if map_slots is None:
        # full scale gets the City map; miniature smoke shapes scale down
        map_slots = (1 << 21) if points_per_lidar >= 2048 else (1 << 15)
    cfg = _flagship_config(points_per_lidar, map_slots, single_search)
    ext_t = np.asarray(cfg.extrinsic_T, np.float64).reshape(3, 3)
    ext_q = np.asarray(cfg.extrinsic_R, np.float64).reshape(3, 4)
    # dense urban-like world (~100k plane anchors): the City environment
    # has surfaces everywhere, so acceptance failures (and therefore the
    # wide-kNN escalation budget) stay a small fraction of the queries —
    # a sparse world makes the budget silently undersized instead
    seqs = _build_sequences(
        cfg, batch, duration, points_per_lidar,
        dict(
            ext_t=ext_t, ext_q_wxyz=ext_q, range_max=35.0,
            world_kwargs=dict(n_planes=96, extent=40.0, patch=10.0, grid=0.3),
        ),
    )
    values, ates, n_rounds, stats = _run_benchmark(
        cfg, seqs, dtype, chunk, warmup, passes
    )
    return dict(
        stats=stats,
        values=values,
        median=float(np.median(values)) if values else float("nan"),
        best=float(np.max(values)) if values else float("nan"),
        per_seq_median=(float(np.median(values)) / batch) if values else float("nan"),
        ates=ates,
        rounds=n_rounds,
        points_per_round=cfg.num_lidars * points_per_lidar,
        map_slots=map_slots,
        batch=batch,
    )
