"""Multi-chip execution: mesh construction and the sharded fusion step.

Two scaling axes (SURVEY §2.4, BASELINE configs 4-5):

  dp — batched multi-sequence replay: independent sequences, one carry
       each, mapped over the mesh (pure data parallelism; zero
       communication between sequences);
  mp — within-sequence point parallelism: the padded measurement rows
       (LiDAR points) shard across chips. All per-point work (deskew,
       k-NN gathers against the replicated map, plane fits, weighting)
       is embarrassingly parallel; the only cross-chip exchanges are the
       masked min/max reductions of the weighting laws, the (act x act)
       HtH / Hth accumulations, and the map-insert scatters — XLA GSPMD
       lowers these to psum/all-reduce over ICI automatically because the
       whole pipeline is written as reductions over the point axis.

The reference has no distributed analog (single process + OpenMP over 3
threads, laserMapping.cpp:559-562); this module is the TPU-native
replacement for that concurrency layer.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Ps

from .. import pipeline
from .. import propagate as prop


def make_mesh(n_devices: int | None = None, mp: int | None = None) -> Mesh:
    """Build a (dp, mp) mesh over the first n devices."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if mp is None:
        mp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // mp
    return Mesh(np.asarray(devices[: dp * mp]).reshape(dp, mp), ("dp", "mp"))


def batch_carries(carries: Sequence[pipeline.LioCarry]) -> pipeline.LioCarry:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)


def batch_groups(groups: Sequence[prop.MeasureGroup]) -> prop.MeasureGroup:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *groups)


def group_sharding(mesh: Mesh, cfg, group: prop.MeasureGroup):
    """Shardings for a batched MeasureGroup: batch over dp; the raw point
    axis over mp."""

    def spec(arr):
        if arr.ndim >= 3 and arr.shape[2] == cfg.max_raw_points:
            return NamedSharding(mesh, Ps("dp", None, "mp"))
        return NamedSharding(mesh, Ps("dp"))

    return jax.tree_util.tree_map(spec, group)


def carry_sharding(mesh: Mesh, carry: pipeline.LioCarry):
    """Carry shardings: batch over dp; the MAP SLOT AXIS over mp.

    The voxel-hash table is by far the carry's largest member (fp + packed
    records ~ 40 MB per sequence at 1<<21 slots); replicating it over mp
    made batched replay HBM-working-set bound (round-1 RESULTS.md, B=32
    regression). Slot-range sharding makes each mp shard the OWNER of a
    contiguous hash range: XLA/GSPMD lowers the probe/candidate gathers to
    a masked local gather + psum over mp and routes insert scatters to the
    owning shard — the TPU-native form of owner-partitioning with the
    exchange riding ICI (SURVEY §2.4; VERDICT round-1 item 3)."""
    # tab is (dp, B_buckets, BUCKET, 5): shard the bucket-row axis over mp
    map_shard = NamedSharding(mesh, Ps("dp", "mp"))
    dp_only = NamedSharding(mesh, Ps("dp"))
    shardings = jax.tree_util.tree_map(lambda a: dp_only, carry)
    return shardings._replace(map=shardings.map._replace(tab=map_shard))


def make_sharded_step(cfg, mesh: Mesh, carry_template=None):
    """jit-compiled batched step with dp x mp shardings baked in.

    When carry_template is given, the carry's shardings (including the
    mp-sharded map) are pinned on both input and output so the map never
    silently re-replicates between steps."""

    def fn(carries, groups):
        return jax.vmap(lambda c, g: pipeline.step(cfg, c, g))(carries, groups)

    if carry_template is None:
        return jax.jit(fn)
    cs = carry_sharding(mesh, carry_template)
    return jax.jit(fn, in_shardings=(cs, None), out_shardings=(cs, None))


def run_batched(cfg, mesh, carries, group_stream, callback=None):
    """Replay a batch of sequences in lockstep over the mesh.

    group_stream: iterable of batched MeasureGroups (leading dim = dp
    batch). Returns the final carries and stacked per-round outputs."""
    step = make_sharded_step(cfg, mesh, carry_template=carries)
    outs = []
    with mesh:
        carries = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s), carries, carry_sharding(mesh, carries)
        )
        for groups in group_stream:
            g = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, s), groups, group_sharding(mesh, cfg, groups)
            )
            carries, out = step(carries, g)
            outs.append(out)
            if callback is not None:
                callback(carries, out)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs) if outs else None
    return carries, stacked
