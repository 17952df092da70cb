#!/usr/bin/env python
"""Round-4 follow-up: scatter scaling + merge-pass insert prototypes."""
import json
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def fetch(out):
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    np.asarray(leaves[0])
    return out


def timeit(name, fn, *args, iters=10):
    out = fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"bench": name, "ms": round(ms, 3)}))
    return ms


def main():
    from malio_tpu import cache as _cache

    _cache.enable()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N = 12288

    # --- scatter cost vs table size ---
    for logT in (17, 19, 21):
        T = 1 << logT
        tab = jnp.zeros((T, 5), jnp.float32)
        rec = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
        idx = jnp.asarray(np.sort(rng.choice(T, N, replace=False)), jnp.int32)
        f = jax.jit(lambda t, i, r: t.at[i].set(r))
        timeit(f"scatter_set_T{logT}", f, tab, idx, rec)

    # --- searchsorted merge pass (scatter replacement) ---
    T = 1 << 21
    tab = jnp.zeros((T, 5), jnp.float32)
    rec = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
    idx = jnp.asarray(np.sort(rng.choice(T, N, replace=False)), jnp.int32)

    def merge(t, i, r):
        rows = jnp.arange(T, dtype=jnp.int32)
        j = jnp.searchsorted(i, rows)
        j = jnp.minimum(j, N - 1)
        hit = i[j] == rows
        return jnp.where(hit[:, None], r[j], t)

    timeit("merge_searchsorted_T21", jax.jit(merge), tab, idx, rec)

    # --- pallas tile merge ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 1 << 14

    def merge_kernel(idx_ref, rec_ref, tab_ref, out_ref):
        t0 = pl.program_id(0) * TILE
        rows = t0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
        iv = idx_ref[:]
        # binary search for each row over the sorted idx (VMEM resident)
        lo = jnp.zeros((TILE,), jnp.int32)
        hi = jnp.full((TILE,), N, jnp.int32)

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            v = iv[mid]
            go_r = v < rows
            return jnp.where(go_r, mid + 1, lo), jnp.where(go_r, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 14, body, (lo, hi))
        j = jnp.minimum(lo, N - 1)
        hit = iv[j] == rows
        out_ref[:] = jnp.where(hit[:, None], rec_ref[j], tab_ref[:])

    def pallas_merge(t, i, r):
        return pl.pallas_call(
            merge_kernel,
            out_shape=jax.ShapeDtypeStruct((T, 5), jnp.float32),
            grid=(T // TILE,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 5), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, 5), lambda g: (g, 0), memory_space=pltpu.VMEM),
        )(i, r, t)

    timeit("merge_pallas_T21", jax.jit(pallas_merge), tab, idx, rec)

    # --- gather section rerun at matched dtypes ---
    R = 1 << 18
    tab16 = jnp.asarray(rng.normal(size=(R, 16, 5)), jnp.float32)
    b8 = jnp.asarray(rng.choice(R, (N, 8)), jnp.int32)
    timeit("gather_8rows_16x5", jax.jit(lambda t, b: t[b]), tab16, b8)


if __name__ == "__main__":
    main()
