"""Long-run soak (VERDICT round 2, item 6): thousands of fusion rounds on
a circling trajectory whose sliding local-map box slides and evicts
continuously at high map load — City01 is 1309 s ~ 1.3e4 rounds of exactly
this regime (many U-turns; /root/reference README.md:209-214).

Asserts what the drop/load counters added in round 2 were built to
constrain: NaN-free state end to end, bounded insert-overflow rate,
bounded map load, dozens of box slide/evict cycles, and ATE within
tolerance after ~10 laps over the same world (implicit re-localization
against previously mapped, evicted, and re-mapped surfaces).
"""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from malio_tpu import pipeline, runner
from malio_tpu.config import Config
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.io.assemble import assemble_groups
from malio_tpu.eval import ate

CHUNK = 50


def _soak_cfg(single_search=False):
    return Config(
        num_lidars=1,
        lid_type=(3,),
        n_scans=(64,),
        point_filter_num=(1,),
        extrinsic_T=(0.2, 0.0, 0.0),
        extrinsic_R=(1.0, 0, 0, 0),
        max_raw_points=256,
        max_points_per_scan=256,
        max_imu_per_group=32,
        traj_capacity=64,
        spline_capacity=64,
        epoch_capacity=32,
        # sized so the live map runs at ~2/3 load (calibrated: the box
        # is floor-dominated, ~(cube/0.45)^2 cells; at cube 40 the load
        # hit 0.93+ and open addressing degenerated into ~45% drops)
        map_capacity=1 << 13,
        filter_size_surf=0.45,
        filter_size_map=0.45,
        # small box + short det_range force slides: the circle has
        # radius ~13 m and the box is smaller than the circle, so the
        # box slides continuously around every lap
        # (lasermap_fov_segment regime, laserMapping.cpp:171-224)
        cube_len=30.0,
        det_range=8.0,
        plane_th=0.1,
        # at 256 pts/scan the pose covariance floor keeps the x10000
        # point-uncertainty traces at ~35-65 (measured); 30 would block
        # every insert and the map would never grow past round 0. 100
        # keeps the gate live for the worst points at this density.
        cov_threshold=100.0,
        # sparse-bootstrap reach: 256-pt scans need the escalating k-NN
        # to fill 5-neighbor sets while the map is thin
        knn_wide_radius=6,
        knn_wide_budget=256,
        single_search=single_search,
    )


def _run_soak(duration=510.0, seed=11, single_search=False):
    """Drive ~duration*10 rounds through chunked scans; returns metrics."""
    cfg = _soak_cfg(single_search)
    seq = SyntheticSequence(
        duration=duration, num_lidars=1, points_per_scan=256,
        ext_t=np.array([[0.2, 0.0, 0.0]]), seed=seed,
    )
    imu, rounds, traj = seq.generate()
    groups = assemble_groups(cfg, imu, rounds)

    # IMU init (the runner's first-scan + init handshake)
    init = runner.ImuInitializer()
    start = 0
    prev_last = np.zeros(7)
    for gi, g in enumerate(groups):
        m = np.asarray(g["imu_mask"])
        last = (
            np.asarray(g["imu"], np.float64)[m.nonzero()[0][-1]]
            if m.any() else prev_last
        )
        if gi > 0 and init.done:
            start = gi
            break
        init.update(np.asarray(g["imu"], np.float64), g["imu_mask"])
        prev_last = last
    x0 = runner.initial_state(cfg, init, jnp.float64)
    P0 = runner.initial_covariance(cfg, jnp.float64)
    Q = runner.process_noise(cfg, init, jnp.float64)
    carry = pipeline.init_carry(cfg, x0, P0, Q, jnp.float64)
    b0 = runner.group_base(groups[start])
    carry = carry._replace(
        mean_acc_norm=jnp.asarray(np.linalg.norm(init.mean_acc), jnp.float64),
        last_imu=jnp.asarray(prev_last, jnp.float64).at[0].add(-b0),
    )

    streams = groups[start:]
    n_rounds = len(streams) - (len(streams) % CHUNK)
    prev_base = b0
    pos, ts = [], []
    load, dropped, n_insert, iters = [], [], [], []
    box_mins = []
    for c0 in range(0, n_rounds, CHUNK):
        chunk = streams[c0 : c0 + CHUNK]
        gdev, bases = runner._stack_chunk(chunk, np.float64, prev_base)
        prev_base = float(bases[-1])
        carry, out = pipeline.scan_steps(cfg, carry, gdev)
        pos.append(np.asarray(out.pos))
        ts.append(np.asarray(out.end_time) + bases)
        load.append(np.asarray(out.map_load))
        dropped.append(np.asarray(out.map_dropped))
        n_insert.append(np.asarray(out.n_insert))
        iters.append(np.asarray(out.iterations))
        box_mins.append(np.asarray(carry.box_min))
        # fail fast on divergence instead of soaking 5k broken rounds
        assert np.isfinite(pos[-1]).all(), f"NaN pose in chunk at {c0}"
    pos = np.concatenate(pos)
    ts = np.concatenate(ts)
    load = np.concatenate(load)
    dropped = np.concatenate(dropped)
    n_insert = np.concatenate(n_insert)
    iters = np.concatenate(iters)
    box_mins = np.stack(box_mins)
    slides = int(
        (np.abs(np.diff(box_mins, axis=0)).sum(axis=1) > 1e-9).sum()
    )
    gt = traj.pos(ts)
    return dict(
        cfg=cfg,
        carry=carry,
        n_rounds=n_rounds,
        pos=pos,
        ts=ts,
        gt=gt,
        ate_aligned=ate.ate_rmse(pos, gt, align=True),
        ate_raw=ate.ate_rmse(pos, gt, align=False),
        load=load,
        dropped=dropped,
        n_insert=n_insert,
        iters=iters,
        slides=slides,
    )


@pytest.mark.slow
def test_soak_5k_rounds_slide_evict_high_load():
    res = _run_soak()
    assert res["n_rounds"] >= 5000, res["n_rounds"]

    # NaN-free state through ~10 laps
    assert np.isfinite(res["pos"]).all()
    assert np.isfinite(np.asarray(res["carry"].P)).all()
    assert np.isfinite(np.asarray(res["carry"].x.pos)).all()

    # the local-map box actually slid and evicted, many times
    assert res["slides"] >= 40, res["slides"]

    # sustained high map load (the regime where probe windows saturate)
    assert res["load"].max() >= 0.5, res["load"].max()

    # bounded insert-overflow rate: cumulative drops stay a bounded
    # fraction of insert candidates (a dropped candidate re-offers next
    # scan; calibrated ~11% at 0.7 peak load), and the rate does not
    # accelerate in the second half (no degradation over evict cycles)
    total_offered = float(res["n_insert"].sum())
    total_dropped = float(res["dropped"][-1])
    assert total_dropped <= 0.15 * total_offered, (total_dropped, total_offered)
    half = res["n_rounds"] // 2
    d1 = res["dropped"][half] - res["dropped"][0]
    d2 = res["dropped"][-1] - res["dropped"][half]
    assert d2 <= 2.0 * max(d1, 500.0), (int(d1), int(d2))

    # trajectory quality after 5k rounds of slide/evict/re-map. This
    # world runs the map BEYOND the supervoxel layout's documented
    # operating load (~0.65 peak vs the recommended <= ~0.35, see
    # tests/test_map.py sizing analysis), so some drop-induced quality
    # cost is expected and bounded — the marginal trajectory cost of
    # overload is quantified directly in
    # test_chained_oracle.py::test_insert_drop_policy_trajectory_cost
    # (round-4 measurement here: 0.63 aligned).
    assert res["ate_aligned"] < 0.75, (res["ate_aligned"], res["ate_raw"])

    # the IEKF keeps converging (not saturating at max_iteration forever)
    assert res["iters"][-1000:].mean() < res["cfg"].max_iteration + 1


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    r = _run_soak(duration=float(sys.argv[1]) if len(sys.argv) > 1 else 510.0)
    print(
        f"rounds={r['n_rounds']} slides={r['slides']} "
        f"load max={r['load'].max():.3f} mean={r['load'].mean():.3f} "
        f"dropped={int(r['dropped'][-1])}/{int(r['n_insert'].sum())} "
        f"ate={r['ate_aligned']:.3f}/{r['ate_raw']:.3f} "
        f"iters_mean={r['iters'].mean():.2f}"
    )
