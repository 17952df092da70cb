"""Shared honest-timing helpers for the round-4 microbenches.

Fence rule learned the hard way (round 4): np.asarray of a FULL output
leaf is a valid fence but also TRANSFERS the leaf through the axon
tunnel at ~10-40 MB/s — a 40 MB table fetch adds ~1-4 s to the timed
window and silently dominates any kernel measurement whose output is
large (this inflated several round-3 "kernel" numbers: the benchmark was
measuring tunnel bandwidth). Fetching a TINY slice of the last output
has identical fence strength (the slice op depends on the full result
and the stream executes in order) with ~zero transfer cost.
"""
import json
import time

import numpy as np


def tiny_fetch(out):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    x = leaves[0]
    np.asarray(jnp.ravel(x)[:1])
    return out


def timeit(name, fn, *args, iters=10):
    out = tiny_fetch(fn(*args))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    tiny_fetch(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"bench": name, "ms": round(ms, 3)}), flush=True)
    return ms
