#!/usr/bin/env python
"""Multi-host scaling evidence (VERDICT round-4 item 7).

Real 2-host TPU hardware is not reachable from this container, so the
>=80%-at-2-hosts target is argued from three measurable pieces instead
of hand-waving:

  1. **Collective bytes/step, from the compiled HLO.** The sharded
     flagship step is compiled for a (dp=1, mp=2) mesh and every
     collective op (all-reduce / all-gather / reduce-scatter /
     collective-permute / all-to-all) in the optimized module is
     enumerated with its shape — the EXACT cross-shard traffic GSPMD
     inserted for the mp exchanges (weighting-law min/max, HtH/Hth
     psums, map-owner routing), not a model of it.
  2. **Timed mp=1 vs mp=2 steps on the virtual-CPU mesh** — the
     compute-partition ratio with communication on shared memory
     (upper-bounds the partition efficiency of the program itself).
  3. **A projection**: comm time = bytes/step over the interconnect
     (ICI ~ 4.5e10 B/s effective per v5e link; 2-host DCN ~ 1.25e10
     B/s), overlapped worst-case against the measured single-chip step
     time.

Run:  python benchmarks/multihost_scaling.py          (CPU, virtual mesh)
Writes a summary to stdout; transcribe into benchmarks/RESULTS.md.
"""
import os
import re
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu-tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import __graft_entry__ as ge
from malio_tpu.distributed import sharding as shd

_DTYPE_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s64": 8, "u64": 8}

_COLL = re.compile(
    r"(\w+\[[^\]]*\]|\([^)]*\))\s+(all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)"
)
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(text):
    total = 0
    for dt, dims in _SHAPE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(compiled_text):
    """(count, bytes, per-op list) of collectives in an optimized HLO."""
    ops = []
    for line in compiled_text.splitlines():
        m = _COLL.search(line)
        if m and "start" not in line.split("=")[0]:
            b = _shape_bytes(m.group(1))
            ops.append((m.group(2), b, line.strip()[:100]))
    return len(ops), sum(b for _, b, _ in ops), ops


def build(mp):
    cfg = ge._dryrun_cfg()
    carry, group = ge._dummy_inputs(cfg, dtype=jnp.float64)
    mesh = shd.make_mesh(mp, mp=mp)  # dp=1 x mp
    carries = shd.batch_carries([carry])
    groups = shd.batch_groups([group])
    step = shd.make_sharded_step(cfg, mesh, carry_template=carries)
    with mesh:
        c = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s),
            carries, shd.carry_sharding(mesh, carries),
        )
        g = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s),
            groups, shd.group_sharding(mesh, cfg, groups),
        )
        lowered = step.lower(c, g)
        compiled = lowered.compile()
    return mesh, step, c, g, compiled


def timed_steps(mesh, step, c, g, iters=6):
    with mesh:
        c2, out = step(c, g)
        jax.block_until_ready(out.pos)
        t0 = time.perf_counter()
        cc = c
        for _ in range(iters):
            cc, out = step(cc, g)
        jax.block_until_ready(out.pos)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    print("== mp=2 sharded flagship-shape step ==")
    mesh2, step2, c2, g2, compiled2 = build(2)
    n, tot, ops = collective_bytes(compiled2.as_text())
    print(f"collectives in optimized HLO: {n} ops, {tot/1e6:.3f} MB/step")
    kinds = {}
    for k, b, _ in ops:
        kinds.setdefault(k, [0, 0])
        kinds[k][0] += 1
        kinds[k][1] += b
    for k, (cnt, b) in sorted(kinds.items()):
        print(f"  {k:20s} x{cnt:3d}  {b/1e6:9.3f} MB")
    for k, b, line in sorted(ops, key=lambda o: -o[1])[:8]:
        print(f"    {b/1e6:9.3f} MB  {line[:90]}")
    t2 = timed_steps(mesh2, step2, c2, g2)
    print(f"mp=2 virtual-CPU step: {t2:.1f} ms")

    print("== mp=1 single-shard reference ==")
    mesh1, step1, c1, g1, _ = build(1)
    t1 = timed_steps(mesh1, step1, c1, g1)
    print(f"mp=1 virtual-CPU step: {t1:.1f} ms")
    print(f"partition speedup mp=2/mp=1: {t1 / t2:.2f}x "
          f"(efficiency {t1 / t2 / 2 * 100:.0f}%)")

    # projection at the real flagship point (see RESULTS.md round-4/5):
    # single-chip step ~30-45 ms device; comm = bytes/step / link bw
    for name, bw in (("ICI (intra-host)", 4.5e10), ("DCN (2 hosts)", 1.25e10)):
        t_comm_ms = tot / bw * 1e3
        for t_step in (30.0, 45.0):
            t_half = t_step / 2.0
            eff = t_half / (t_half + t_comm_ms)
            print(
                f"projection {name}: comm {t_comm_ms:.2f} ms vs "
                f"step/2 {t_half:.1f} ms -> {eff * 100:.0f}% efficiency"
            )


if __name__ == "__main__":
    main()
