"""Host driver: IMU initialization + sequence replay over the jitted step.

Mirrors the reference's main() flow (laserMapping.cpp:831-1082): the first
round is skipped, IMU statistics accumulate until >10 samples
(IMU_Processing.hpp:147-208), then the filter state, covariance and process
noise are seeded and the jitted per-round step takes over.
"""
from __future__ import annotations

import dataclasses
from typing import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from . import state as st
from . import pipeline
from . import propagate as prop


@dataclasses.dataclass
class ImuInitializer:
    """Running mean/cov of the first IMU samples (IMU_Processing.hpp:147-208)."""

    n: int = 0
    mean_acc: np.ndarray = None
    mean_gyr: np.ndarray = None
    cov_acc: np.ndarray = None
    cov_gyr: np.ndarray = None

    def __post_init__(self):
        self.mean_acc = np.zeros(3)
        self.mean_gyr = np.zeros(3)
        self.cov_acc = np.full(3, 0.1)
        self.cov_gyr = np.full(3, 0.1)

    def update(self, imu, mask):
        for row, m in zip(imu, mask):
            if not m:
                continue
            gyr, acc = row[1:4], row[4:7]
            if self.n == 0:
                self.mean_acc = acc.copy()
                self.mean_gyr = gyr.copy()
                self.n = 1
            N = self.n
            self.mean_acc += (acc - self.mean_acc) / N
            self.mean_gyr += (gyr - self.mean_gyr) / N
            self.cov_acc = self.cov_acc * (N - 1.0) / N + (acc - self.mean_acc) ** 2 * (
                N - 1.0
            ) / (N * N)
            self.cov_gyr = self.cov_gyr * (N - 1.0) / N + (gyr - self.mean_gyr) ** 2 * (
                N - 1.0
            ) / (N * N)
            self.n += 1

    @property
    def done(self):
        return self.n > 10  # MAX_INI_COUNT, IMU_Processing.hpp:32


def initial_state(cfg, init: ImuInitializer, dtype=jnp.float32) -> st.State:
    L = cfg.num_lidars
    x = st.identity_state(L, dtype)
    ext_t = jnp.asarray(np.asarray(cfg.extrinsic_T, np.float64).reshape(L, 3), dtype)
    ext_q = jnp.asarray(np.asarray(cfg.extrinsic_R, np.float64).reshape(L, 4), dtype)
    ext_q = ext_q / jnp.linalg.norm(ext_q, axis=-1, keepdims=True)
    grav = -init.mean_acc / np.linalg.norm(init.mean_acc) * st.S2_LENGTH
    return st.State(
        pos=x.pos,
        rot=x.rot,
        ext_r=ext_q,
        ext_t=ext_t,
        vel=x.vel,
        bg=jnp.asarray(init.mean_gyr, dtype),
        ba=x.ba,
        grav=jnp.asarray(grav, dtype),
    )


def initial_covariance(cfg, dtype=jnp.float32):
    """P init (IMU_Processing.hpp:187-199): pose 1, ext+vel 1e-6, bg 1e-4,
    ba 1e-3, grav 1e-5. cfg.ext_cov_init overrides the extrinsic block
    (default 1e-6 = the reference's slow-calibration prior; raise it to
    let online extrinsic estimation converge from a coarse guess)."""
    n = st.dof(cfg.num_lidars)
    d = np.ones(n)
    d[6 : n - 8] = 1e-6
    d[6 : 6 + 6 * cfg.num_lidars] = cfg.ext_cov_init
    d[n - 8 : n - 5] = 1e-4
    d[n - 5 : n - 2] = 1e-3
    d[n - 2 :] = 1e-5
    return jnp.asarray(np.diag(d), dtype)


def process_noise(cfg, init: ImuInitializer, dtype=jnp.float32):
    """Process-noise Q = diag([gyr, acc, b_gyr, b_acc]) (12x12).

    cfg.imu_noise_source selects the gyr/acc source:
    - "measured" (default) replicates the reference quirk: the IMU-init
      window's sample variances seed Q and the YAML gyr_cov/acc_cov are
      never read after init (IMU_Processing.hpp:142-186 overwrites
      cov_gyr/cov_acc with the measured statistics before Q is built).
    - "config" uses cfg.gyr_cov/acc_cov directly, the behavior most
      users expect from the YAML.
    Bias random-walk covs always come from the config (the reference
    never measures them)."""
    if cfg.imu_noise_source == "config":
        gyr, acc = np.full(3, cfg.gyr_cov), np.full(3, cfg.acc_cov)
    elif cfg.imu_noise_source == "measured":
        gyr, acc = init.cov_gyr, init.cov_acc
    else:
        raise ValueError(
            f"imu_noise_source must be 'measured' or 'config', "
            f"got {cfg.imu_noise_source!r}"
        )
    return jnp.asarray(
        np.diag(
            np.concatenate(
                [gyr, acc, np.full(3, cfg.b_gyr_cov), np.full(3, cfg.b_acc_cov)]
            )
        ),
        dtype,
    )


def group_base(g):
    """Per-group time base (f64): the earliest scan begin."""
    return float(np.min(np.asarray(g["beg_t"], np.float64)))


def _stack_chunk(chunk, dtype, prev_base):
    """Stack host group dicts into one batched MeasureGroup, rebased to
    per-group time origins (f32 keeps microsecond resolution regardless of
    sequence length) and shipped in a single transfer (per-round transfers
    through the TPU relay dominate otherwise).

    Returns (device group, last group's base)."""
    bases = np.asarray([group_base(g) for g in chunk], np.float64)
    shifts = np.diff(np.concatenate([[prev_base], bases]))

    pts = np.stack([np.asarray(g["pts"], np.float64) for g in chunk])
    pts[..., 3] -= bases[:, None, None]
    imu = np.stack([np.asarray(g["imu"], np.float64) for g in chunk])
    imu[..., 0] -= bases[:, None]
    cont = np.stack([np.asarray(g["imu_cont"], np.float64) for g in chunk])
    cont[..., 0] -= bases[:, None]
    beg = np.stack([np.asarray(g["beg_t"], np.float64) for g in chunk]) - bases[:, None]
    end = np.stack([np.asarray(g["end_t"], np.float64) for g in chunk]) - bases[:, None]

    out = prop.MeasureGroup(
        pts=jnp.asarray(pts.astype(dtype)),
        pts_mask=jnp.asarray(np.stack([g["pts_mask"] for g in chunk])),
        beg_t=jnp.asarray(beg.astype(dtype)),
        end_t=jnp.asarray(end.astype(dtype)),
        imu=jnp.asarray(imu.astype(dtype)),
        imu_mask=jnp.asarray(np.stack([g["imu_mask"] for g in chunk])),
        imu_cont=jnp.asarray(cont.astype(dtype)),
        imu_cont_mask=jnp.asarray(np.stack([g["imu_cont_mask"] for g in chunk])),
        t_shift=jnp.asarray(shifts.astype(dtype)),
    )
    return out, bases


def run_sequence(
    cfg,
    groups: Iterable[dict],
    dtype=jnp.float32,
    callback=None,
    smoother=None,
    posegraph=None,
    prefetch_chunk: int = 16,
):
    """Replay measure groups through the pipeline. Returns a dict with the
    trajectory (t, pos, quat) and per-round diagnostics. `smoother` and
    `posegraph` are optional observers (WindowSmoother /
    PoseGraphBackend): observe(out, t_base) per round, trajectory() at
    the end (result keys "smoothed" / "graph")."""
    groups = list(groups)
    init = ImuInitializer()
    carry = None
    outs = []
    last_imu_seed = np.zeros(7)

    def _track_last_imu(g):
        m = np.asarray(g["imu_mask"])
        if m.any():
            return np.asarray(g["imu"], np.float64)[m.nonzero()[0][-1]]
        return last_imu_seed

    # --- init phase (host-side): first-scan shortcut + IMU statistics ---
    start = 0
    for gi, g in enumerate(groups):
        prev_last_imu = last_imu_seed
        last_imu_seed = _track_last_imu(g)
        # flg_first_scan shortcut (laserMapping.cpp:945-951); subsequent
        # rounds feed IMU_init until >10 samples (IMU_Processing.hpp:147)
        if gi > 0 and init.done:
            x0 = initial_state(cfg, init, dtype)
            P0 = initial_covariance(cfg, dtype)
            Q = process_noise(cfg, init, dtype)
            carry = pipeline.init_carry(cfg, x0, P0, Q, dtype)
            carry = carry._replace(
                mean_acc_norm=jnp.asarray(np.linalg.norm(init.mean_acc), dtype),
                last_imu=jnp.asarray(prev_last_imu, dtype),
            )
            start = gi
            break
        init.update(np.asarray(g["imu"], np.float64), g["imu_mask"])

    if carry is None:
        return dict(
            t=np.zeros(0), pos=np.zeros((0, 3)), quat=np.zeros((0, 4)),
            iterations=np.zeros(0, int), n_effective=np.zeros(0, int),
            map_size=np.zeros(0, int), carry=None,
            smoothed=smoother.trajectory() if smoother is not None else None,
            graph=posegraph.trajectory() if posegraph is not None else None,
        )

    # --- fusion phase: chunked device transfers + async dispatch ---
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    small = (
        "pos",
        "quat",
        "pose_cov",
        "end_time",
        "iterations",
        "n_effective",
        "map_size",
    )
    # times are rebased per group; the first fused group's base is the
    # origin, so pre-rebase the carried last-IMU stamp
    base0 = group_base(groups[start])
    carry = carry._replace(
        last_imu=carry.last_imu.at[0].add(jnp.asarray(-base0, dtype))
    )
    prev_base = base0
    # per-round hooks force per-round dispatch; otherwise a whole chunk is
    # one lax.scan dispatch (one host<->device round-trip per K rounds)
    use_scan = callback is None and smoother is None and posegraph is None
    for c0 in range(start, len(groups), prefetch_chunk):
        chunk = groups[c0 : c0 + prefetch_chunk]
        gdev, bases = _stack_chunk(chunk, np_dtype, prev_base)
        prev_base = float(bases[-1])
        if use_scan and len(chunk) == prefetch_chunk:
            carry, stacked = pipeline.scan_steps(cfg, carry, gdev)
            host = {k: np.asarray(getattr(stacked, k)) for k in small}
            for k in range(len(chunk)):
                rec = {f: host[f][k] for f in small}
                rec["end_time"] = rec["end_time"] + float(bases[k])
                outs.append(rec)
            continue
        chunk_outs = []
        for k in range(len(chunk)):
            group = jax.tree_util.tree_map(lambda a: a[k], gdev)
            carry, out = pipeline.step(cfg, carry, group)
            # keep outputs as device arrays within the chunk: converting
            # per round would force a host sync and defeat async dispatch
            chunk_outs.append((out, float(bases[k])))
            if smoother is not None:
                smoother.observe(out, t_base=float(bases[k]))
            if posegraph is not None:
                posegraph.observe(out, t_base=float(bases[k]))
                corr = (
                    posegraph.take_correction()
                    if hasattr(posegraph, "take_correction")
                    else None
                )
                if corr is not None:
                    # loop closure: re-anchor the filter carry (state, P,
                    # history, map, box) onto the graph-corrected frame
                    dq, dtv = corr
                    carry = pipeline.apply_world_correction(
                        cfg,
                        carry,
                        jnp.asarray(np.asarray(dq), dtype),
                        jnp.asarray(np.asarray(dtv), dtype),
                    )
            if callback is not None:
                # out.end_time is group-relative (f32-safe on device);
                # bases[k] restores the absolute f64 timeline
                callback(carry, out, float(bases[k]))
        # one sync per chunk; keep only the small fields so long sequences
        # don't accumulate per-round point clouds in device memory
        for o, b in chunk_outs:
            rec = {k: np.asarray(getattr(o, k)) for k in small}
            rec["end_time"] = rec["end_time"] + b  # back to absolute f64
            outs.append(rec)

    return dict(
        t=np.asarray([o["end_time"] for o in outs]),
        pos=np.asarray([o["pos"] for o in outs]),
        quat=np.asarray([o["quat"] for o in outs]),
        pose_cov=np.asarray([o["pose_cov"] for o in outs]),
        iterations=np.asarray([int(o["iterations"]) for o in outs]),
        n_effective=np.asarray([int(o["n_effective"]) for o in outs]),
        map_size=np.asarray([int(o["map_size"]) for o in outs]),
        carry=carry,
        smoothed=smoother.trajectory() if smoother is not None else None,
        graph=posegraph.trajectory() if posegraph is not None else None,
    )
