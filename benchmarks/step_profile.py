#!/usr/bin/env python
"""Profile ONE pipeline.step dispatch on the TPU and attribute device time
to JAX source ops via the compiled HLO's op_name metadata.

Round-4 tool for the VERDICT 'decompose and fix' directives: the
per-kernel benches measure pieces out of context; this measures the real
fused step and names where its milliseconds go.

Usage: python benchmarks/step_profile.py [--flagship] [--points N]
                                         [--map-capacity LOG2] [--top K]
"""
import argparse
import collections
import glob
import gzip
import json
import re
import sys
import pathlib
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def attribute(trace_dir, hlo_text, top):
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    d = json.load(gzip.open(sorted(files)[-1]))
    ev = d.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name")
    dev = [
        e
        for e in ev
        if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), ""))
    ]
    # locate the step's jit window = the longest jit_* event
    jits = [e for e in dev if str(e["name"]).startswith("jit")]
    if not jits:
        print("no jit event found on device")
        return
    main = max(jits, key=lambda e: e["dur"])
    t0, t1 = main["ts"], main["ts"] + main["dur"]
    inner = [
        e
        for e in dev
        if e is not main and e["ts"] >= t0 - 1 and e["ts"] + e["dur"] <= t1 + 1
    ]
    # op_name metadata per HLO instruction name
    meta = {}
    for m in re.finditer(
        r"%?([\w.\-]+)\.?\d* = .*?metadata={op_name=\"([^\"]+)\"", hlo_text
    ):
        pass  # fallback below is keyed on exact names
    for line in hlo_text.splitlines():
        mm = re.search(r"%([\w.\-]+) = ", line)
        if not mm:
            continue
        om = re.search(r'op_name="([^"]+)"', line)
        sm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        if om:
            src = om.group(1)
            if sm:
                src += " @" + sm.group(1).split("/")[-1] + ":" + sm.group(2)
            meta[mm.group(1)] = src

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in inner:
        name = str(e["name"])
        src = meta.get(name, meta.get(name.split(".")[0], name))
        # compress jax paths: keep the tail function chain
        src = re.sub(r"jit\(\w+\)/", "", src)
        agg[src] += e["dur"]
        cnt[src] += 1
    print(f"step device total: {main['dur']/1000:.3f} ms; attributed children:")
    other = main["dur"] - sum(agg.values())
    for n, us in agg.most_common(top):
        print(f"{us/1000:9.3f} ms  x{cnt[n]:4d}  {n[:150]}")
    print(f"{other/1000:9.3f} ms  (unattributed/self)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--map-capacity", type=int, default=19)
    ap.add_argument("--lidars", type=int, default=3)
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--solve-only", action="store_true")
    args = ap.parse_args()

    from malio_tpu import cache as _cache

    _cache.enable()
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from malio_tpu.config import Config, city_config
    from malio_tpu import pipeline

    L = args.lidars
    if args.flagship:
        cfg = city_config(
            max_raw_points=args.points,
            max_points_per_scan=args.points,
            max_imu_per_group=32,
            traj_capacity=64,
            spline_capacity=64,
            epoch_capacity=32,
            map_capacity=1 << 21,
        )
    else:
        ext_t = np.array([[0.2, 0, 0], [-0.3, 0.3, 0.1], [-0.3, -0.3, 0.1]])[:L]
        cfg = Config(
            num_lidars=L,
            lid_type=(3,) * L,
            n_scans=(64,) * L,
            point_filter_num=(1,) * L,
            extrinsic_T=tuple(ext_t.reshape(-1).tolist()),
            extrinsic_R=tuple(np.tile([1.0, 0, 0, 0], (L, 1)).reshape(-1).tolist()),
            max_raw_points=args.points,
            max_points_per_scan=args.points,
            max_imu_per_group=32,
            traj_capacity=64,
            spline_capacity=64,
            epoch_capacity=32,
            map_capacity=1 << args.map_capacity,
            filter_size_surf=0.4,
            filter_size_map=0.4,
            cube_len=300.0,
            det_range=60.0,
            plane_th=0.1,
            cov_threshold=30.0,
            max_iteration=3,
        )
    carry, group = ge._dummy_inputs(cfg)
    step_j = jax.jit(lambda c, g: pipeline.step(cfg, c, g))
    lowered = step_j.lower(carry, group)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # warm TWO rounds first: the fresh carry has map_init=False, which
    # skips the entire IEKF update branch — tracing the first step
    # attributes a step that never runs the filter (round-4 lesson)
    out = step_j(carry, group)
    out = step_j(out[0], group)
    carry = out[0]
    np.asarray(jnp.ravel(out[1].pos)[:1])
    tdir = tempfile.mkdtemp(prefix="steptrace_")
    with jax.profiler.trace(tdir):
        out = step_j(carry, group)
        np.asarray(jnp.ravel(out[1].pos)[:1])
    attribute(tdir, hlo, args.top)


if __name__ == "__main__":
    main()
