"""Online (live-feed) estimator: the push-style counterpart of
runner.run_sequence.

The reference is a live ROS node — sensor callbacks buffer messages
(imu_cbk / livox_pcl_cbk / standard_pcl_cbk, laserMapping.cpp:226-282)
and the main loop fuses whenever sync_packages (laserMapping.cpp:310-396)
can assemble one scan per LiDAR with IMU coverage. runner.run_sequence
only covers offline replay of pre-assembled groups; OnlineEstimator
covers the live shape: callers push IMU samples and scans in arrival
order and poll fused poses out, with the same init, grouping, gating and
time-rebasing semantics as the replay path (bit-identical trajectories on
the same data — see tests/test_online.py).

Device dispatch is asynchronous: push_* enqueue work on the chip and
return; poll() is the only host sync point.
"""
from __future__ import annotations

import collections

import numpy as np
import jax
import jax.numpy as jnp

from . import pipeline
from . import runner


class OnlineEstimator:
    """Push-style multi-LiDAR inertial odometry.

    push_imu(t, gyr, acc)          — one IMU sample (absolute seconds).
    push_scan(lidar, beg_t, pts)   — one scan: pts (N, 4) with column 3 the
                                     per-point time in seconds SINCE beg_t
                                     (the Preprocess output convention,
                                     preprocess.cpp:59-212).
    poll()                         — drain fused rounds (host sync).

    Grouping is ApproximateTime (laserMapping.cpp:902-913): the pivot is
    the latest stream head; each stream contributes its buffered scan
    closest to the pivot; jumped-over scans are dropped (counted in
    n_dropped_scans). A round fuses only once every stream has a scan at
    or past the pivot (so the closest-choice is final under in-order
    arrival) and the IMU stream extends sync_lookahead past the round end
    (the 0.2 s gate, laserMapping.cpp:313).
    """

    def __init__(self, cfg, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self._np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
        L = cfg.num_lidars
        self._scans = [collections.deque() for _ in range(L)]
        self._imu = []  # list of (7,) float64 rows, strictly increasing t
        self._imu_cursor = 0  # first undrained IMU index
        self._init = runner.ImuInitializer()
        self._carry = None
        self._n_init_groups = 0
        self._prev_last_imu = np.zeros(7)
        self._last_group_imu = np.zeros(7)
        self._prev_base = None
        self._pending = []  # (StepOutput device arrays, base) awaiting poll
        self.n_rounds = 0
        self.n_dropped_scans = 0
        self.n_imu_regressions = 0

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------
    def push_imu(self, t, gyr, acc):
        """One IMU sample. Out-of-order stamps are dropped ("imu loop
        back", laserMapping.cpp:258-262)."""
        if self._imu and t <= self._imu[-1][0]:
            self.n_imu_regressions += 1
            return
        row = np.empty(7)
        row[0] = t
        row[1:4] = gyr
        row[4:7] = acc
        self._imu.append(row)
        self._try_fuse()

    def push_scan(self, lidar, beg_t, pts, duration=None):
        """One scan for physical LiDAR slot `lidar`. pts column 3 holds
        per-point offsets from beg_t; duration defaults to the max offset
        (lidar_end_time = stamp + curvature max, laserMapping.cpp:334)."""
        pts = np.asarray(pts, np.float64)
        if duration is None:
            duration = float(pts[:, 3].max()) if pts.shape[0] else 0.0
        p_abs = pts.copy()
        p_abs[:, 3] += beg_t
        self._scans[lidar].append(
            dict(beg_t=float(beg_t), end_t=float(beg_t) + duration, pts=p_abs)
        )
        self._try_fuse()

    def flush(self):
        """End-of-stream: fuse the remaining buffered rounds. Live
        operation must wait for a scan at/past the pivot before the
        closest-to-pivot choice is final; once the caller declares the
        stream over, that wait is dropped (the IMU lookahead gate still
        applies, so trailing rounds without IMU coverage stay unfused,
        matching the replay path's end-of-sequence behavior)."""
        self._try_fuse(final=True)

    # ------------------------------------------------------------------
    # results
    # ------------------------------------------------------------------
    def poll(self):
        """Drain fused rounds (forces one host sync). Returns a list of
        dicts: t (absolute end time), pos, quat, iterations, n_effective,
        map_size."""
        fields = (
            "end_time",
            "pos",
            "quat",
            "pose_cov",
            "iterations",
            "n_effective",
            "map_size",
        )
        # start every device->host copy before blocking on any: on a
        # remote-relay TPU each synchronous fetch is a full network round
        # trip (~25 ms); async-first turns 6 round trips into ~1
        for o, _ in self._pending:
            for f in fields:
                a = getattr(o, f)
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        out = []
        for o, base in self._pending:
            out.append(
                dict(
                    t=float(np.asarray(o.end_time)) + base,
                    pos=np.asarray(o.pos),
                    quat=np.asarray(o.quat),
                    pose_cov=np.asarray(o.pose_cov),
                    iterations=int(o.iterations),
                    n_effective=int(o.n_effective),
                    map_size=int(o.map_size),
                )
            )
        self._pending.clear()
        return out

    @property
    def carry(self):
        return self._carry

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------
    def _try_fuse(self, final=False):
        cfg = self.cfg
        while True:
            if any(len(b) == 0 for b in self._scans):
                return
            pivot = max(b[0]["end_t"] for b in self._scans)
            # closest-to-pivot is final only once every stream has reached
            # the pivot (later in-order arrivals are strictly farther);
            # flush() drops the wait at end of stream
            if not final and not all(
                b[-1]["end_t"] >= pivot for b in self._scans
            ):
                return
            sel = []
            for b in self._scans:
                while len(b) > 1 and abs(b[1]["end_t"] - pivot) <= abs(
                    b[0]["end_t"] - pivot
                ):
                    b.popleft()
                    self.n_dropped_scans += 1
                sel.append(b[0])
            lidar_end = max(s["end_t"] for s in sel)
            if not self._imu or self._imu[-1][0] - lidar_end < cfg.sync_lookahead:
                return  # wait for IMU lookahead
            group = self._pad_group(sel)
            for b in self._scans:
                b.popleft()
            self._process(group)

    def _pad_group(self, sel):
        """assemble_groups' padding for one round (io/assemble.py), with a
        persistent IMU cursor over the live buffer."""
        cfg = self.cfg
        L, P, I, IC = (
            cfg.num_lidars,
            cfg.max_raw_points,
            cfg.max_imu_per_group,
            cfg.imu_cont_len,
        )
        imu_arr = np.asarray(self._imu)
        imu_t = imu_arr[:, 0]
        lidar_end = max(s["end_t"] for s in sel)
        hi = int(np.searchsorted(imu_t, lidar_end, side="right"))
        n_imu = hi - self._imu_cursor
        if n_imu > I:
            raise ValueError(f"imu window {n_imu} exceeds capacity {I}")
        imu = np.zeros((I, 7))
        imu_mask = np.zeros((I,), bool)
        imu[:n_imu] = imu_arr[self._imu_cursor : hi]
        imu_mask[:n_imu] = True

        cont = np.zeros((IC, 7))
        cont_mask = np.zeros((IC,), bool)
        cont_src = []
        if n_imu > 0:
            cont_src.append(imu_arr[hi - 1])
        cont_src.extend(imu_arr[hi : hi + IC - 1])
        nc = min(len(cont_src), IC)
        if nc:
            cont[:nc] = np.stack(cont_src[:nc])
            cont_mask[:nc] = True

        pts = np.zeros((L, P, 4))
        pts_mask = np.zeros((L, P), bool)
        beg = np.zeros((L,))
        end = np.zeros((L,))
        for l, s in enumerate(sel):
            p = s["pts"]
            n = min(p.shape[0], P)
            pts[l, :n] = p[:n]
            pts_mask[l, :n] = True
            beg[l] = s["beg_t"]
            end[l] = s["end_t"]

        self._imu_cursor = hi
        # trim consumed IMU prefix (keep one sample of history for the
        # continuation window's "last drained" element)
        if self._imu_cursor > 4096:
            keep = self._imu_cursor - 1
            del self._imu[:keep]
            self._imu_cursor -= keep
        return dict(
            pts=pts,
            pts_mask=pts_mask,
            beg_t=beg,
            end_t=end,
            imu=imu,
            imu_mask=imu_mask,
            imu_cont=cont,
            imu_cont_mask=cont_mask,
        )

    def _process(self, g):
        cfg, dtype = self.cfg, self.dtype
        m = np.asarray(g["imu_mask"])
        last = (
            np.asarray(g["imu"], np.float64)[m.nonzero()[0][-1]]
            if m.any()
            else self._last_group_imu
        )
        if self._carry is None:
            # init phase: flg_first_scan shortcut + IMU_init statistics
            # (laserMapping.cpp:945-951, IMU_Processing.hpp:147)
            if self._n_init_groups > 0 and self._init.done:
                x0 = runner.initial_state(cfg, self._init, dtype)
                P0 = runner.initial_covariance(cfg, dtype)
                Q = runner.process_noise(cfg, self._init, dtype)
                carry = pipeline.init_carry(cfg, x0, P0, Q, dtype)
                base0 = runner.group_base(g)
                carry = carry._replace(
                    mean_acc_norm=jnp.asarray(
                        np.linalg.norm(self._init.mean_acc), dtype
                    ),
                    last_imu=jnp.asarray(
                        self._prev_last_imu - np.eye(7)[0] * base0, dtype
                    ),
                )
                self._carry = carry
                self._prev_base = base0
                # fall through: this group is the first fused round
            else:
                self._init.update(np.asarray(g["imu"], np.float64), g["imu_mask"])
                self._prev_last_imu = last
                self._last_group_imu = last
                self._n_init_groups += 1
                return
        self._prev_last_imu = last
        self._last_group_imu = last
        gdev, bases = runner._stack_chunk([g], self._np_dtype, self._prev_base)
        self._prev_base = float(bases[0])
        group = jax.tree_util.tree_map(lambda a: a[0], gdev)
        self._carry, out = pipeline.step(cfg, self._carry, group)
        self._pending.append((out, float(bases[0])))
        self.n_rounds += 1
