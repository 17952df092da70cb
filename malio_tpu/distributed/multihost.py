"""Multi-host runtime: jax.distributed bring-up and cross-host meshes.

The reference is a single ROS process (laserMapping.cpp main); its only
concurrency is OpenMP. This module is the scale-out layer the TPU rebuild
adds on top (BASELINE config 4: ">=80% scaling at 2 hosts"): one process
per host, a global (dp, mp) mesh over every chip, and the mp axis laid out
to SPAN hosts so the measurement model's reductions (masked min/max of the
weighting laws, the HtH/Hth accumulations, the sharded-map k-NN psum)
exercise the cross-host interconnect.

Launch recipe (one command per host; also what tests/test_multihost.py
spawns, with CPU devices standing in for chips):

    # host 0                                       # host 1
    python -m malio_tpu.distributed.multihost \\
        --coordinator 10.0.0.1:9911 --nprocs 2 --pid 0   # ... --pid 1

On real TPU pods, coordinator/nprocs/pid resolve automatically from the
TPU environment: call initialize() with no arguments.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_count=None):
    """Bring up the distributed runtime (jax.distributed.initialize).

    On TPU pods all arguments resolve from the environment; on CPU/GPU
    fleets pass them explicitly (or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    import jax

    # Honor JAX_PLATFORMS=cpu explicitly: environments whose
    # sitecustomize registers a TPU plugin at interpreter start (the
    # axon terminal here) call jax.config.update("jax_platforms", ...)
    # which CLOBBERS the env var — without this, the "CPU" smoke
    # subprocesses silently grab the real TPU chip, the backend comes up
    # single-process (process_count()==1), and every cross-host assert
    # degenerates. Must run before the first backend query.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_count is not None:
        kw["num_local_devices"] = local_device_count
    jax.distributed.initialize(**kw)


def cross_host_mesh(mp: int | None = None):
    """Global ("dp", "mp") mesh with the mp axis spanning hosts.

    Devices are arranged so that each mp group pairs devices from DISTINCT
    processes whenever mp <= #processes: the within-sequence reductions
    then cross host boundaries, which is what a multi-host smoke must
    exercise (dp is embarrassingly parallel and never communicates)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    nproc = jax.process_count()
    if mp is None:
        mp = nproc if n % max(nproc, 1) == 0 and nproc > 1 else 1
    dp = n // mp
    if mp == nproc and n == dp * mp:
        # group by local index first -> each mesh row holds one device per
        # process: mp strides across hosts
        by_proc = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        locals_per = min(len(v) for v in by_proc.values())
        rows = []
        for li in range(locals_per):
            rows.append([by_proc[p][li] for p in sorted(by_proc)])
        arr = np.asarray(rows).reshape(dp, mp)
    else:
        arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def global_from_host(mesh, sharding, np_array):
    """Build a global array from identical host-local numpy data."""
    import jax

    return jax.make_array_from_callback(
        np_array.shape, sharding, lambda idx: np_array[idx]
    )


def _smoke():
    """2+-process smoke: full fusion step with points sharded over a
    cross-host mp axis and the voxel map slot-sharded over mp; every
    process checks its addressable output shards against a local
    single-device reference (same inputs)."""
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as Ps

    import __graft_entry__ as ge
    from malio_tpu import pipeline
    from . import sharding as shd

    mesh = cross_host_mesh()
    dp = mesh.shape["dp"]
    mp = mesh.shape["mp"]
    assert mp == jax.process_count(), (mp, jax.process_count())
    # every mp group must span all processes
    arr = np.asarray(mesh.devices)
    for r in range(arr.shape[0]):
        procs = {d.process_index for d in arr[r]}
        assert len(procs) == jax.process_count(), procs

    # Establish the gloo context NOW, while the processes are still in
    # lockstep: the first collective performs the TCP/KV rendezvous
    # under a hard ~30 s deadline inside XLA, and the reference/sharded
    # step compiles below take minutes on a contended 2-core host — if
    # the first collective ran after them, one process could reach it
    # >30 s before the other and the rendezvous would DEADLINE_EXCEED.
    probe = global_from_host(
        mesh,
        NamedSharding(mesh, Ps("dp", "mp")),
        np.ones((dp, mp), np.float32),
    )
    with mesh:
        total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, Ps()))(probe)
    assert float(total) == dp * mp, float(total)

    cfg = ge._tiny_cfg(L=2, pts=128)
    carry, group = ge._dummy_inputs(cfg, dtype=jnp.float64)

    # local single-device reference
    ref_carry, ref_out = jax.jit(
        lambda c, g: pipeline.step(cfg, c, g), device=jax.local_devices()[0]
    )(carry, group)
    ref_pos = np.asarray(ref_out.pos)
    ref_P = np.asarray(ref_carry.P)

    B = dp
    bcast = lambda a: np.broadcast_to(np.asarray(a)[None], (B,) + np.asarray(a).shape)
    b_carry = jax.tree_util.tree_map(lambda a: bcast(a), carry)
    b_group = jax.tree_util.tree_map(lambda a: bcast(a), group)

    cs = shd.carry_sharding(mesh, b_carry)

    def g_shard(a):
        if a.ndim >= 3 and a.shape[2] == cfg.max_raw_points:
            return NamedSharding(mesh, Ps("dp", None, "mp"))
        return NamedSharding(mesh, Ps("dp"))

    with mesh:
        gg = jax.tree_util.tree_map(
            lambda a: global_from_host(mesh, g_shard(a), np.asarray(a)), b_group
        )
        cc = jax.tree_util.tree_map(
            lambda a, s: global_from_host(mesh, s, np.asarray(a)), b_carry, cs
        )
        stepped = jax.jit(
            jax.vmap(lambda c, g: pipeline.step(cfg, c, g)),
            in_shardings=(cs, None),
            out_shardings=(cs, None),
        )
        new_carry, out = stepped(cc, gg)
        jax.block_until_ready(out.pos)

    # per-process verification on addressable shards
    for sh in out.pos.addressable_shards:
        rows = sh.index[0]
        np.testing.assert_allclose(np.asarray(sh.data), ref_pos[None], atol=1e-9)
    for sh in new_carry.P.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(sh.data), ref_P[None], atol=1e-8
        )
    # the map stayed sharded: each process holds only its mp slice
    T = new_carry.map.tab.shape[-3]  # bucket rows
    local_rows = new_carry.map.tab.addressable_shards[0].data.shape[-3]
    assert local_rows <= (T + mp - 1) // mp, (local_rows, T, mp)
    print(
        f"multihost smoke ok: pid {jax.process_index()}/{jax.process_count()}"
        f" mesh dp={dp} mp={mp} map shard rows {local_rows}/{T}",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--local-devices", type=int, default=None)
    args = ap.parse_args()
    if args.local_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
    initialize(args.coordinator, args.nprocs, args.pid)
    _smoke()
