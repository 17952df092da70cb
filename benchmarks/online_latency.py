#!/usr/bin/env python
"""Online (live-feed) latency benchmark: per-round wall latency through
OnlineEstimator from the moment the fusing scan arrives (push_scan) to
the pose being available on the host (poll), the online analogue of the
reference's per-round [Computation Time] print (laserMapping.cpp:825-826,
~50 ms/group on the City sequences).

Runs on the default JAX device. Prints one JSON line with p50/p90/p99
latency (ms) and the steady-state online rate.
"""
import json
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main(duration=8.0, points=2048, lidars=2):
    from malio_tpu import cache as _cache

    _cache.enable()
    import jax.numpy as jnp
    from malio_tpu.config import Config
    from malio_tpu.io.synthetic import SyntheticSequence
    from malio_tpu.online import OnlineEstimator

    ext_t = np.array([[0.2, 0.0, 0.0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])[:lidars]
    cfg = Config(
        num_lidars=lidars,
        lid_type=tuple([3] * lidars),
        n_scans=tuple([64] * lidars),
        point_filter_num=tuple([1] * lidars),
        extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
        extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (lidars, 1)).reshape(-1).tolist()),
        max_raw_points=points,
        max_points_per_scan=points,
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
    seq = SyntheticSequence(
        duration=duration, num_lidars=lidars, points_per_scan=points, ext_t=ext_t
    )
    imu, rounds, _ = seq.generate()

    # arrival-ordered event tape (scan arrives at its end time)
    events = [("imu", row[0], row) for row in imu]
    for rnd in rounds:
        for l, s in enumerate(rnd):
            rel = s["pts"].copy()
            rel[:, 3] -= s["beg_t"]
            events.append(
                ("scan", s["end_t"], (l, s["beg_t"], rel, s["end_t"] - s["beg_t"]))
            )
    events.sort(key=lambda e: e[1])

    est = OnlineEstimator(cfg, dtype=jnp.float32)
    lat = []
    for kind, _, payload in events:
        if kind == "imu":
            est.push_imu(payload[0], payload[1:4], payload[4:7])
        else:
            l, beg, rel, dur = payload
            est.push_scan(l, beg, rel, duration=dur)
        if est._pending:
            # realistic online usage: the consumer wants the pose as soon
            # as the round fuses -> sync immediately and charge the wall
            # time of dispatch+compute+transfer to this round
            t0 = time.perf_counter()
            est.poll()
            lat.append((time.perf_counter() - t0) * 1e3)

    if len(lat) < 8:
        raise SystemExit("too few fused rounds to measure")
    warm = np.asarray(lat[4:])  # skip compile/cache-warm rounds
    out = {
        "metric": "online_latency_p50",
        "value": round(float(np.percentile(warm, 50)), 3),
        "unit": "ms",
        "p90_ms": round(float(np.percentile(warm, 90)), 3),
        "p99_ms": round(float(np.percentile(warm, 99)), 3),
        "rounds": int(warm.size),
        "online_rate_hz": round(1e3 / float(np.percentile(warm, 50)), 1),
        "reference_ms_per_round": 50.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
