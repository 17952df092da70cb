"""Sliding-window BA smoother riding alongside the filter odometry.

Collects keyframes (filter pose + body-frame points) every K rounds and
refines the window with the plane BA (malio_tpu.ba) as it slides. The
refined poses form a smoothed trajectory output; the filter itself is not
perturbed (odometry front-end + smoothing back-end, the standard split the
reference lacks entirely)."""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from . import ba


@dataclasses.dataclass
class WindowSmoother:
    window_size: int = 8
    keyframe_every: int = 5  # rounds between keyframes
    optimize_every: int = 2  # keyframes between BA solves
    max_points: int = 2048
    cell_size: float = 1.0
    num_cells: int = 16384
    min_pts: int = 6
    iters: int = 6
    dtype: object = jnp.float32

    def __post_init__(self):
        self.win = ba.empty_window(self.window_size, self.max_points, self.dtype)
        self._round = 0
        self._kf_count = 0
        self._kf_times = []
        self.refined = {}  # time -> (q, t)

    def observe(self, out, t_base=0.0):
        """Call once per fusion round with the StepOutput. t_base restores
        absolute time from the group-relative end_time."""
        self._round += 1
        if self._round % self.keyframe_every:
            return
        pts = jnp.asarray(out.kf_pts, self.dtype)[: self.max_points]
        mask = jnp.asarray(out.kf_mask)[: self.max_points]
        if pts.shape[0] < self.max_points:
            pad = self.max_points - pts.shape[0]
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3), self.dtype)])
            mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
        self.win = ba.push_keyframe(
            self.win,
            jnp.asarray(out.quat, self.dtype),
            jnp.asarray(out.pos, self.dtype),
            pts,
            mask,
        )
        self._kf_times = (self._kf_times + [float(out.end_time) + t_base])[
            -self.window_size :
        ]
        self._kf_count += 1
        if (
            self._kf_count % self.optimize_every == 0
            and bool(np.asarray(self.win.valid).all())
        ):
            win_opt, c_final, c0 = ba.optimize_window(
                self.win,
                cell_size=self.cell_size,
                num_cells=self.num_cells,
                min_pts=self.min_pts,
                iters=self.iters,
            )
            self.win = win_opt
            for i, t in enumerate(self._kf_times):
                self.refined[t] = (
                    np.asarray(win_opt.q[i]),
                    np.asarray(win_opt.t[i]),
                )

    def trajectory(self):
        """Refined keyframe trajectory (t, pos, quat) sorted by time."""
        if not self.refined:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        ts = np.asarray(sorted(self.refined))
        qs = np.stack([self.refined[t][0] for t in ts])
        ps = np.stack([self.refined[t][1] for t in ts])
        return ts, ps, qs
