"""Device-side point-cloud preprocessing: voxel-grid downsampling.

Replaces pcl::VoxelGrid (laserMapping.cpp:968-983): centroid of the points
in each `voxel` cell, averaging the auxiliary channels too (PCL's
downsample_all_data), returned as a fixed-capacity padded batch.

TPU-first: sort by voxel hash + segment means — no dynamic allocation, one
bitonic sort + a few segment reductions, all fused by XLA.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

_P1 = np.uint32(73856093)
_P2 = np.uint32(19349663)
_P3 = np.uint32(83492791)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def voxel_downsample(pts, aux, mask, voxel_size, out_cap: int):
    """pts (P,3), aux (P,A), mask (P,) -> (out (out_cap,3), aux_out
    (out_cap,A), mask_out (out_cap,)).

    One output point per occupied voxel: the centroid (xyz and aux averaged).
    Voxels are identified by a 3-prime spatial hash of the integer cell
    coords; hash collisions (~P/2^32) merge cells and are acceptable for
    downsampling."""
    P = pts.shape[0]
    key3 = jnp.floor(pts / voxel_size).astype(jnp.int32).astype(jnp.uint32)
    h = (key3[:, 0] * _P1) ^ (key3[:, 1] * _P2) ^ (key3[:, 2] * _P3)
    # force masked-out lanes into a dedicated trailing key
    h = jnp.where(mask, h, jnp.uint32(0xFFFFFFFF))

    order = jnp.argsort(h)
    h_s = h[order]
    pts_s = pts[order]
    aux_s = aux[order]
    mask_s = mask[order]

    start = jnp.concatenate([jnp.ones((1,), bool), h_s[1:] != h_s[:-1]])
    seg_id = jnp.cumsum(start.astype(jnp.int32)) - 1  # (P,)

    num_seg = out_cap  # segments beyond out_cap overflow into the dump
    seg_clamped = jnp.minimum(seg_id, num_seg)
    ones = mask_s.astype(pts.dtype)
    cnt = jnp.zeros((num_seg + 1,), pts.dtype).at[seg_clamped].add(ones)[:num_seg]
    sum_xyz = (
        jnp.zeros((num_seg + 1, 3), pts.dtype)
        .at[seg_clamped]
        .add(pts_s * ones[:, None])[:num_seg]
    )
    sum_aux = (
        jnp.zeros((num_seg + 1, aux.shape[1]), aux.dtype)
        .at[seg_clamped]
        .add(aux_s * ones[:, None])[:num_seg]
    )
    valid = cnt > 0
    denom = jnp.maximum(cnt, 1.0)
    return sum_xyz / denom[:, None], sum_aux / denom[:, None], valid
