"""Pallas TPU kernel: fused k-NN candidate ranking + compaction.

The round-4 k-NN kept the RAW gathered candidate window — (Q, C, 5) with
C = 256 at the base radius — as the IEKF re-search cache, because
compacting it to a top-K with XLA primitives cost a take-along gather
pass (~3 ms at 12k queries) and the iterative top-k re-streamed the
(Q, C) distance tensor from HBM ~20 times (the round-4 speed-of-light
table put select/rank at ~5% efficiency, op-count bound). This kernel is
the north-star fusion (BASELINE.json): one VMEM-resident pass per query
block that

  computes squared distances to the query,
  runs K rounds of running-min selection entirely on-chip, and
  emits ONLY the top-K candidates (coords, stored covariance, d2),

so the HBM side is: read the gathered window once, write (Q, K) results
— no materialized distance tensor, no one-hot selection matmuls, and the
downstream IEKF re-rank shrinks from (M, 256) to (M, K) reductions.

Reference semantics preserved: the selection is exactly `k` smallest
valid distances, ties to the lowest lane (matching voxel_hash.topk_min,
which matches the reference tree search order, ikd_Tree.cpp:1073-1255);
invalid lanes carry d2 = BIG and are counted out by the caller exactly
as the jnp path does. Parity: tests/test_knn_pallas.py checks the kernel
against voxel_hash.topk_min + one-hot extraction bit-for-bit on f32.

Layout note: candidates arrive as PLANES (Q, C) per field — the natural
(Q, C, 5) record layout would pad the 5-lane minor axis to 128 in VMEM
(25x waste). The planes come from one XLA transpose of the gathered
rows, a bandwidth-bound reshuffle that costs far less than the ~20
re-streams it replaces.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

QBLOCK = 128  # queries per grid step; VMEM live set at C=256 is
# 5 planes x 128 x 256 x 4 B ~ 656 KB plus (128, K) outputs

BIG = 3.0e38  # invalid-lane distance (f32 max ~ 3.4e38; stay below so
# arithmetic never overflows to inf inside the kernel)


def _kernel(px_ref, py_ref, pz_ref, pc_ref, d2_ref,
            ox_ref, oy_ref, oz_ref, oc_ref, od_ref, *, K: int):
    px = px_ref[...]
    py = py_ref[...]
    pz = pz_ref[...]
    pc = pc_ref[...]
    cur = d2_ref[...]
    C = cur.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
    # mask selected lanes with the SAME sentinel the caller uses for
    # invalid lanes (finfo max): an exhausted row then keeps returning
    # lane 0 exactly like the jnp twin's argmin-over-all-equal
    big = jnp.asarray(jnp.finfo(cur.dtype).max, cur.dtype)

    # all integer arithmetic pinned to int32: under x64 a bare Python
    # int would promote the lane iota to int64, whose Mosaic
    # convert-element-type lowering recurses infinitely
    Ci = jnp.asarray(C, jnp.int32)

    xs, ys, zs, cs, ds = [], [], [], [], []
    for _ in range(K):
        m = jnp.min(cur, axis=1)  # (QB,)
        # first minimizing lane (ties to lowest lane, like argmin)
        li = jnp.min(jnp.where(cur == m[:, None], lanes, Ci), axis=1)
        sel = lanes == li[:, None]
        xs.append(jnp.sum(jnp.where(sel, px, 0.0), axis=1))
        ys.append(jnp.sum(jnp.where(sel, py, 0.0), axis=1))
        zs.append(jnp.sum(jnp.where(sel, pz, 0.0), axis=1))
        cs.append(jnp.sum(jnp.where(sel, pc, 0.0), axis=1))
        ds.append(m)
        cur = jnp.where(sel, big, cur)

    ox_ref[...] = jnp.stack(xs, axis=-1)
    oy_ref[...] = jnp.stack(ys, axis=-1)
    oz_ref[...] = jnp.stack(zs, axis=-1)
    oc_ref[...] = jnp.stack(cs, axis=-1)
    od_ref[...] = jnp.stack(ds, axis=-1)


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def topk_candidates(d2, cand_pts, cand_covs, K: int,
                    interpret: bool = False):
    """Top-K candidates per query by precomputed masked distance.

    d2 (Q, C) f32 with invalid lanes set >= BIG (computed by the caller
    so the jnp twin shares the exact array — both paths then select and
    extract identically, bit-for-bit); cand_pts (Q, C, 3);
    cand_covs (Q, C). Returns (pts (Q, K, 3), covs (Q, K), d2 (Q, K)
    ascending) — invalid results carry d2 >= BIG and the lane-0
    candidate's coordinates (exactly like topk_min + one-hot extraction
    on an all-invalid row)."""
    Q, C = cand_covs.shape
    dtype = cand_covs.dtype
    # planes: one transpose, bandwidth-bound (see module docstring)
    px = cand_pts[..., 0]
    py = cand_pts[..., 1]
    pz = cand_pts[..., 2]

    # query-block size: ~12 live (QB, C) f32 arrays (5 double-buffered
    # plane inputs + the kernel's running-min/select intermediates) must
    # fit the 16 MB scoped-VMEM stack; an 8 MB budget leaves headroom for
    # Mosaic's pipelining copies (measured: a 12 MB budget overflowed by
    # 0.5 MB at C = 6656)
    qblock = max(8, min(QBLOCK, ((8 << 20) // (12 * C * 4)) // 8 * 8))

    pad = (-Q) % qblock
    if pad:
        zp = jnp.zeros((pad, C), dtype)
        px = jnp.concatenate([px, zp], axis=0)
        py = jnp.concatenate([py, zp], axis=0)
        pz = jnp.concatenate([pz, zp], axis=0)
        cand_covs = jnp.concatenate([cand_covs, zp], axis=0)
        d2 = jnp.concatenate([d2, jnp.full((pad, C), BIG, dtype)], axis=0)
    Qp = Q + pad

    grid = (Qp // qblock,)
    # index maps return (i, i*0), not (i, 0): under x64 a literal 0
    # traces as i64 and Mosaic rejects the mixed (i32, i64) index tuple
    plane = pl.BlockSpec((qblock, C), lambda i: (i, i * 0))
    out_spec = pl.BlockSpec((qblock, K), lambda i: (i, i * 0))
    out_shape = jax.ShapeDtypeStruct((Qp, K), dtype)
    ox, oy, oz, oc, od = pl.pallas_call(
        functools.partial(_kernel, K=K),
        out_shape=(out_shape,) * 5,
        grid=grid,
        in_specs=[plane, plane, plane, plane, plane],
        out_specs=(out_spec,) * 5,
        interpret=interpret,
    )(px, py, pz, cand_covs, d2)
    pts = jnp.stack([ox[:Q], oy[:Q], oz[:Q]], axis=-1)
    return pts, oc[:Q], od[:Q]
