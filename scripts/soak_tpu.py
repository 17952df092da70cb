#!/usr/bin/env python
"""City01-length on-TPU soak (VERDICT round-4 item 8).

~13k continuous fusion rounds (City01 is 1309 s at 10 Hz, reference
README.md:209-214) through the scan-chunked production path on the real
chip, with a circular revisiting trajectory so the sliding local map and
eviction run the whole time. Point count is soak-sized (1024/LiDAR;
host RAM bounds the 13k-round synthetic stream, not the chip) — the
purpose is the failure modes a 40-round oracle cannot see: NaN creep,
covariance growth, map-slot leaks, throughput drift.

Checks reported (one JSON line):
  * finite trajectory + P bounded at the end;
  * cumulative map drops / evictions / measurement-cap drops;
  * nn_miss p50/p99 over the whole run;
  * throughput of the first vs last quartile (drift detector);
  * ATE vs the synthetic ground truth (sanity, loose gate).

Run: python scripts/soak_tpu.py [--duration 1309] [--points 1024]
"""
import argparse
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from malio_tpu import cache as _cache

_cache.enable()

import jax
import jax.numpy as jnp

from malio_tpu import pipeline
from malio_tpu.batched import _flagship_config, _init_seq
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.io.assemble import assemble_groups
from malio_tpu.runner import _stack_chunk, group_base
from malio_tpu.eval import ate as ate_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=1309.0)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    import dataclasses

    cfg = _flagship_config(args.points, 1 << 19, False)
    # the 13/16 lane cap is sized for the 4096-pt flagship live fraction;
    # at soak point counts the downsample dedups less and the cap would
    # clip real points every round — run uncapped
    cfg = dataclasses.replace(cfg, max_meas_points=None)
    ext_t = np.asarray(cfg.extrinsic_T, np.float64).reshape(3, 3)
    ext_q = np.asarray(cfg.extrinsic_R, np.float64).reshape(3, 4)
    t_gen0 = time.time()
    seq = SyntheticSequence(
        duration=args.duration,
        num_lidars=3,
        points_per_scan=args.points,
        ext_t=ext_t,
        ext_q_wxyz=ext_q,
        range_max=35.0,
        seed=0,
        # circular revisit: radius speed/yaw_rate ~ 13 m, a lap every
        # ~42 s -> ~30 map revisits over City01 length
        world_kwargs=dict(n_planes=96, extent=40.0, patch=10.0, grid=0.3),
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)
    print(f"generated {len(groups)} rounds in {time.time()-t_gen0:.0f}s",
          file=sys.stderr)

    dtype = jnp.float32
    carry, stream, base0 = _init_seq(cfg, groups, dtype)
    np_dtype = np.dtype(np.float32)

    chunk = args.chunk
    n = len(stream) - (len(stream) % chunk)
    times = []
    outs_small = []
    prev_base = base0
    t0 = time.time()
    for c0 in range(0, n, chunk):
        ch = stream[c0 : c0 + chunk]
        gdev, bases = _stack_chunk(ch, np_dtype, prev_base)
        prev_base = float(bases[-1])
        t_a = time.perf_counter()
        carry, st = pipeline.scan_steps(cfg, carry, gdev)
        # host fetch fences the chunk (relay-safe)
        pos = np.asarray(st.pos)
        t_b = time.perf_counter()
        times.append(t_b - t_a)
        outs_small.append(
            dict(
                pos=pos,
                t=np.asarray(st.end_time) + bases,
                nn_miss=np.asarray(st.nn_miss),
                dropped=np.asarray(st.map_dropped),
                meas_dropped=np.asarray(st.n_meas_dropped),
                map_size=np.asarray(st.map_size),
                w_loc=np.asarray(st.w_loc),
                p_tr=np.einsum("kii->k", np.asarray(st.pose_cov)),
                iters=np.asarray(st.iterations),
                n_eff=np.asarray(st.n_effective),
                med_ny=np.asarray(st.med_normal_y),
            )
        )
        if (c0 // chunk) % 100 == 0:
            print(
                f"round {c0}/{n} map={int(outs_small[-1]['map_size'][-1])} "
                f"chunk={times[-1]*1000:.0f}ms",
                file=sys.stderr,
            )
    wall = time.time() - t0

    pos = np.concatenate([o["pos"] for o in outs_small])
    ts = np.concatenate([o["t"] for o in outs_small])
    miss = np.concatenate([o["nn_miss"] for o in outs_small])
    mdrop = np.concatenate([o["meas_dropped"] for o in outs_small])
    np.savez_compressed(
        "/tmp/soak_traj.npz", pos=pos, t=ts,
        p_tr=np.concatenate([o["p_tr"] for o in outs_small]),
        iters=np.concatenate([o["iters"] for o in outs_small]),
        n_eff=np.concatenate([o["n_eff"] for o in outs_small]),
        med_ny=np.concatenate([o["med_ny"] for o in outs_small]),
        w_loc=np.concatenate([o["w_loc"] for o in outs_small]),
        map_size=np.concatenate([o["map_size"] for o in outs_small]),
    )
    gt = traj.pos(ts)
    q = len(times) // 4
    thr_first = chunk * q / sum(times[:q])
    thr_last = chunk * q / sum(times[-q:])
    P = np.asarray(carry.P)
    finite = bool(np.isfinite(pos).all() and np.isfinite(P).all())
    n_nonfinite = int((~np.isfinite(pos).all(axis=-1)).sum())
    try:
        ate_v = float(ate_mod.ate_rmse(pos, gt, align=True))
    except Exception:
        ok = np.isfinite(pos).all(axis=-1)
        ate_v = (
            float(np.sqrt(np.mean(np.sum((pos[ok] - gt[ok]) ** 2, -1))))
            if ok.any()
            else float("nan")
        )
    out = dict(
        rounds=int(n),
        wall_s=round(wall, 1),
        scans_per_sec=round(n / sum(times), 2),
        thr_first_quartile=round(thr_first, 2),
        thr_last_quartile=round(thr_last, 2),
        finite=finite,
        n_nonfinite_rounds=n_nonfinite,
        P_max=float(np.abs(P).max()),
        ate_m=round(ate_v, 3),
        map_size_final=int(outs_small[-1]["map_size"][-1]),
        map_dropped_final=int(outs_small[-1]["dropped"][-1]),
        n_evicted_final=int(np.asarray(carry.map.n_evicted)),
        meas_dropped_total=int(mdrop.sum()),
        nn_miss_p50=float(np.median(miss)),
        nn_miss_p99=float(np.percentile(miss, 99)),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
