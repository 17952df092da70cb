#!/usr/bin/env python
"""Round-4 decision microbenchmarks (host-fetch fenced, TPU).

Measures the primitives the round-4 redesign choices hang on:

  scatter:   12k-row scatters into a 2M-row table — plain vs sorted vs
             sorted+unique-hinted vs unique-dump-row variants (the insert
             redesign target: ONE hinted scatter).
  gather:    supervoxel-row fetch (Q, 8) rows of 16x5 vs the round-3
             paired 27-cell window (Q, 27) of 16x5 from the concat view.
  topk:      lax.top_k over (Q, 432) [27*16 candidates] vs (Q, 128)
             [8*16 supervoxel candidates].
  eig3:      jnp.linalg.eigvalsh on one 3x3 vs a closed-form trig solve.
  chol:      35x35 SPD inverse via _spd_inverse in f64 vs f32.
  sort:      argsort 36864 u32 (downsample) and 2-key sort 12288.
  iekf:      stage decomposition — h_share call alone, solve-only loop,
             full update (VERDICT round-3 item 1c).

Usage: python benchmarks/micro_r4.py [--section all|scatter|gather|...]
"""
import argparse
import json  # noqa: F401
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


from micro_timing import timeit  # tiny-slice fence (see micro_timing.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    args = ap.parse_args()
    from malio_tpu import cache as _cache

    _cache.enable()
    import jax
    import jax.numpy as jnp

    sec = args.section
    rng = np.random.default_rng(0)
    N = 12288
    T = 1 << 21

    if sec in ("all", "scatter"):
        tab = jnp.zeros((T + N, 5), jnp.float32)
        rec = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
        idx_r = jnp.asarray(rng.choice(T, N, replace=False), jnp.int32)
        idx_s = jnp.sort(idx_r)

        f_plain = jax.jit(lambda t, i, r: t.at[i].set(r))
        f_hint = jax.jit(
            lambda t, i, r: t.at[i].set(r, unique_indices=True, indices_are_sorted=True)
        )
        f_uniq = jax.jit(lambda t, i, r: t.at[i].set(r, unique_indices=True))
        timeit("scatter_plain_random", f_plain, tab, idx_r, rec)
        timeit("scatter_plain_sorted", f_plain, tab, idx_s, rec)
        timeit("scatter_uniq_random", f_uniq, tab, idx_r, rec)
        timeit("scatter_hint_sorted", f_hint, tab, idx_s, rec)
        # dump-row variant: losers target T+i (unique, partially sorted)
        half = np.arange(N) % 2 == 0
        mix = np.where(half, np.sort(rng.choice(T, N, replace=False)), T + np.arange(N))
        timeit("scatter_uniq_mixdump", f_uniq, tab, jnp.asarray(mix, jnp.int32), rec)
        # scatter-min (u32 packed cov|id) — the dedup primitive
        packed = jnp.asarray(rng.integers(0, 1 << 31, N), jnp.uint32)
        f_min = jax.jit(lambda t, i, r: t.at[i].min(r, unique_indices=True))
        tab_u = jnp.full((T + N,), np.uint32(0xFFFFFFFF), jnp.uint32)
        timeit("scatter_min_u32_uniq", f_min, tab_u, idx_s, packed)

    if sec in ("all", "gather"):
        R = 1 << 18  # 256k rows of 16 slots
        tab16 = jnp.asarray(rng.normal(size=(R, 16, 5)), jnp.float32)
        b8 = jnp.asarray(rng.choice(R, (N, 8)), jnp.int32)
        g8 = jax.jit(lambda t, b: t[b])  # (N, 8, 16, 5)
        timeit("gather_8rows_16x5", g8, tab16, b8)
        tabB = jnp.asarray(rng.normal(size=(T // 8, 8, 5)), jnp.float32)
        b27 = jnp.asarray(rng.choice(T // 8 - 1, (N, 27)), jnp.int32)

        def g27(t, b):
            paired = jnp.concatenate([t[:-1], t[1:]], axis=1)
            return paired[b]

        timeit("gather_27pairs_r3", jax.jit(g27), tabB, b27)
        # one row per window (no pair) for comparison
        g27s = jax.jit(lambda t, b: t[b])
        timeit("gather_27rows_8x5", g27s, tabB, b27)

    if sec in ("all", "topk"):
        d432 = jnp.asarray(rng.normal(size=(N, 432)), jnp.float32)
        d128 = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
        tk = jax.jit(lambda d: jax.lax.top_k(-d, 16))
        timeit("topk16_of_432", tk, d432)
        timeit("topk16_of_128", tk, d128)
        tk5 = jax.jit(lambda d: jax.lax.top_k(-d, 5))
        timeit("topk5_of_128", tk5, d128)

    if sec in ("all", "eig3"):
        A = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
        G = A @ A.T
        timeit("eigvalsh_3x3", jax.jit(jnp.linalg.eigvalsh), G)

        def eig3_closed(M):
            # closed-form symmetric 3x3 eigenvalues (trigonometric form)
            q = jnp.trace(M) / 3.0
            B = M - q * jnp.eye(3, dtype=M.dtype)
            p2 = jnp.sum(B * B) / 6.0
            p = jnp.sqrt(jnp.maximum(p2, 1e-30))
            detB = jnp.linalg.det(B / p)
            r = jnp.clip(detB / 2.0, -1.0, 1.0)
            phi = jnp.arccos(r) / 3.0
            e1 = q + 2 * p * jnp.cos(phi)
            e3 = q + 2 * p * jnp.cos(phi + 2 * np.pi / 3)
            e2 = 3 * q - e1 - e3
            return jnp.stack([e3, e2, e1])

        timeit("eig3_closed_form", jax.jit(eig3_closed), G)

    if sec in ("all", "chol"):
        from malio_tpu.filter.esekf import _spd_inverse

        A35 = np.asarray(rng.normal(size=(35, 35)))
        S = jnp.asarray(A35 @ A35.T + 35 * np.eye(35))
        timeit("spdinv_35_f64", jax.jit(_spd_inverse), S.astype(jnp.float64))
        timeit("spdinv_35_f32", jax.jit(_spd_inverse), S.astype(jnp.float32))
        ch = jax.jit(jnp.linalg.cholesky)
        timeit("chol_35_f64", ch, S.astype(jnp.float64))
        timeit("chol_35_f32", ch, S.astype(jnp.float32))
        mm = jax.jit(lambda a: a @ a)
        timeit("matmul_35_f64", mm, S.astype(jnp.float64))

    if sec in ("all", "sort"):
        u = jnp.asarray(rng.integers(0, 1 << 32, 3 * N, dtype=np.uint32))
        timeit("argsort_36864_u32", jax.jit(jnp.argsort), u)
        k1 = jnp.asarray(rng.integers(0, 1 << 31, N), jnp.int32)
        k2 = jnp.asarray(rng.normal(size=N), jnp.float32)
        s2 = jax.jit(
            lambda a, b: jax.lax.sort((a, b, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        )
        timeit("sort2key_12288", s2, k1, k2)

    if sec in ("all", "iekf"):
        import __graft_entry__ as ge
        from malio_tpu.config import Config
        from malio_tpu import measurement as meas, propagate as prop
        from malio_tpu.filter import esekf
        from malio_tpu.map import voxel_hash as vh

        L = 3
        pts_n = 4096
        ext_t = np.array([[0.2, 0, 0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])
        cfg = Config(
            num_lidars=L,
            lid_type=(3,) * L,
            n_scans=(64,) * L,
            point_filter_num=(1,) * L,
            extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
            extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (L, 1)).reshape(-1).tolist()),
            max_raw_points=pts_n,
            max_points_per_scan=pts_n,
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
            max_iteration=3,
        )
        carry, group = ge._dummy_inputs(cfg)
        M = L * pts_n
        und = jax.jit(
            lambda c, g: prop.undistort(
                cfg, c.x, c.P, c.hist, g, c.Q, c.last_in, c.last_imu,
                c.last_end_t, c.mean_acc_norm,
            )
        )(carry, group)
        pts = jnp.asarray(rng.normal(size=(M, 3)) * 15, jnp.float32)
        m2 = jax.jit(lambda m, p: vh.insert(m, p, jnp.full((M,), 0.01, jnp.float32), jnp.ones((M,), bool)))(carry.map, pts)
        sd = meas.ScanData(
            pts_body=pts,
            pt_lidar=jnp.repeat(jnp.arange(L, dtype=jnp.int32), pts_n),
            pt_epoch=jnp.zeros((M,), jnp.int32),
            pt_mask=jnp.ones((M,), bool),
            tc_q=und.tc_q,
            tc_t=und.tc_t,
            base=und.base,
            unc_q=und.unc_q,
            unc_t=und.unc_t,
            unc_cov=und.unc_cov,
            epoch_count=und.epoch_count,
        )

        # stage A: the gathering search + cache build (make_h_share body)
        def mk(x, m, s):
            h, c0 = meas.make_h_share(cfg, m, s, x)
            return c0

        timeit("iekf_make_h_share", jax.jit(mk), carry.x, m2, sd)

        # stage B: ONE h_share evaluation (re-rank + weighting + H rows)
        def one_eval(x, m, s):
            h, c0 = meas.make_h_share(cfg, m, s, x)
            res, c1 = h(x, jnp.asarray(True), c0)
            return res.h, c1.normal_y

        timeit("iekf_hshare_1eval", jax.jit(one_eval), carry.x, m2, sd)

        # stage C: solve-only — fixed random H/R through the while_loop
        Hfix = jnp.asarray(rng.normal(size=(M, 24)), jnp.float32)
        hfix = jnp.asarray(rng.normal(size=(M,)), jnp.float32)
        Rfix = jnp.full((M,), 1e-3, jnp.float32)
        mfix = jnp.ones((M,), bool)

        def h_const(x, search, cache):
            return esekf.HShareResult(
                valid=jnp.asarray(True), h=hfix, H=Hfix, R=Rfix, mask=mfix
            ), cache

        def solve_only(x, P):
            return esekf.update_iterated(x, P, h_const, (), max_iter=cfg.max_iteration)

        timeit("iekf_solve_only", jax.jit(solve_only), carry.x, carry.P)

        # stage D: the full update
        def full(x, P, m, s):
            h, c0 = meas.make_h_share(cfg, m, s, x)
            return esekf.update_iterated(x, P, h, c0, max_iter=cfg.max_iteration)

        timeit("iekf_full", jax.jit(full), carry.x, carry.P, m2, sd)


if __name__ == "__main__":
    main()
