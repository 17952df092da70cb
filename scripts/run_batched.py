#!/usr/bin/env python
"""Batched multi-sequence replay (BASELINE config 5). See
malio_tpu.batched for the implementation.

Usage: python scripts/run_batched.py [--batch B] [--duration S] [--cpu]
"""
import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--single-search", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from malio_tpu import cache as _cache

    _cache.enable()
    from malio_tpu.batched import synthetic_batched_benchmark

    res = synthetic_batched_benchmark(
        batch=args.batch, duration=args.duration, points=args.points,
        single_search=args.single_search,
    )
    r = res
    print(
        "batch=%d rounds=%d aggregate %.2f scans/s (%.2f per sequence)"
        % (args.batch, r["rounds"], r["aggregate_scans_per_sec"], r["per_seq"])
    )
    for b, a in enumerate(res["ates"]):
        print(f"  seq {b}: ATE aligned {a:.4f} m")


if __name__ == "__main__":
    main()
