#!/usr/bin/env python
"""Run the odometry on a City/UrbanNav-format dataset directory and write
the TUM trajectory (the reference's Log/trajectory.txt equivalent).

Usage:
  python scripts/run_dataset.py /path/to/City01 --config city \
      [--out trajectory.txt] [--cpu] [--f64] [--max-rounds N]
      [--checkpoint-every K --checkpoint-dir ckpts/]
"""
import argparse
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


CONFIGS = {
    "city": dict(
        sensors=["ouster", "livox_avia", "livox_tele"],
        factory="city_config",
    ),
    "city-ouster": dict(  # single-LiDAR subset (BASELINE config 1)
        sensors=["ouster"],
        factory="city_ouster_config",
    ),
    "urbannav": dict(
        sensors=["vlp_left", "vlp_right"],
        factory="urbannav_config",
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--config", choices=CONFIGS, default="city")
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=0)
    ap.add_argument("--skip-rounds", type=int, default=0, help="seek: skip leading rounds")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default="ckpts")
    ap.add_argument("--resume", default="")
    ap.add_argument(
        "--smoother",
        action="store_true",
        help="run the sliding-window plane-BA smoother alongside the filter "
        "and write <out>.smoothed",
    )
    ap.add_argument(
        "--save-cloud-every",
        type=int,
        default=0,
        help="accumulate registered clouds and write PCD/scans_*.pcd every N rounds"
        " (pcd_save, laserMapping.cpp:467-488)",
    )
    ap.add_argument("--cloud-dir", default="PCD")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    from malio_tpu import cache as _cache
    _cache.enable()
    import jax.numpy as jnp

    from malio_tpu import config as cfg_mod
    from malio_tpu.io import dataset as ds
    from malio_tpu.io.assemble import assemble_groups
    from malio_tpu import runner, checkpoint
    from malio_tpu.eval import ate

    spec = CONFIGS[args.config]
    cfg = getattr(cfg_mod, spec["factory"])()
    print(f"loading {args.root} ({args.config}, {cfg.num_lidars} LiDARs)...")
    imu, rounds = ds.load_sequence(
        args.root,
        spec["sensors"],
        list(cfg.lid_type),
        list(cfg.point_filter_num),
        list(cfg.n_scans),
        cfg.blind,
        timestamp_unit=cfg.timestamp_unit,
        time_offset_lidar_to_imu=cfg.time_offset_lidar_to_imu,
    )
    if args.skip_rounds:
        rounds = rounds[args.skip_rounds :]
    if args.max_rounds:
        rounds = rounds[: args.max_rounds]
    print(f"{len(rounds)} rounds, {len(imu)} imu samples")
    groups = assemble_groups(cfg, imu, rounds)

    dtype = jnp.float64 if args.f64 else jnp.float32
    t0 = time.time()
    k = [0]
    cloud_acc = []
    pcd_idx = [0]

    def cb(carry, out):
        k[0] += 1
        if args.checkpoint_every and k[0] % args.checkpoint_every == 0:
            checkpoint.save(
                pathlib.Path(args.checkpoint_dir) / f"round_{k[0]:06d}.npz", carry
            )
        if args.save_cloud_every:
            w = np.asarray(out.world_pts)[np.asarray(out.world_mask)]
            cloud_acc.append(w)
            if k[0] % args.save_cloud_every == 0:
                from malio_tpu.io.pcd import write_pcd

                pcd_idx[0] += 1
                write_pcd(
                    pathlib.Path(args.cloud_dir) / f"scans_{pcd_idx[0]:04d}.pcd",
                    np.concatenate(cloud_acc),
                )
                cloud_acc.clear()
        if k[0] % 50 == 1:
            print(
                f"round {k[0]} t={float(out.end_time):.2f} "
                f"eff={int(out.n_effective)} map={int(out.map_size)} "
                f"pos={np.asarray(out.pos).round(2)}",
                flush=True,
            )

    smoother = None
    if args.smoother:
        from malio_tpu.smoother import WindowSmoother

        smoother = WindowSmoother(dtype=dtype)
    res = runner.run_sequence(cfg, groups, dtype=dtype, callback=cb, smoother=smoother)
    dt = time.time() - t0
    n = len(res["t"])
    print(f"{n} rounds in {dt:.1f}s ({n / dt:.2f} scans/s)")
    ate.write_tum(args.out, res["t"], res["pos"], res["quat"])
    print(f"trajectory written to {args.out}")
    if smoother is not None and res["smoothed"] is not None:
        ts, ps, qs = res["smoothed"]
        if len(ts):
            ate.write_tum(args.out + ".smoothed", ts, ps, qs)
            print(f"smoothed keyframe trajectory written to {args.out}.smoothed")

    gt_file = pathlib.Path(args.root) / "Groundtruth.txt"
    if gt_file.exists():
        tg, pg, _ = ate.read_tum(gt_file)
        ia, ib = ate.associate(res["t"], tg - tg[0])
        if len(ia) > 10:
            err = ate.ate_rmse(res["pos"][ia], pg[ib], align=True)
            print(f"ATE RMSE (aligned) vs groundtruth: {err:.4f} m")


if __name__ == "__main__":
    main()
