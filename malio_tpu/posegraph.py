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


def _edge_blocks(q, t, edges: EdgeSet):
    """Vmapped per-edge Gauss-Newton pieces: He (E,12,12), Je (E,6,12),
    be (E,12), ce (E,) — the building blocks shared by the dense and the
    structured solvers. The plane/landmark blocks of each loop edge were
    already eliminated when ICP condensed the cloud overlap into one
    relative-pose measurement, so He IS the per-edge Schur complement
    onto the two pose blocks."""
    dtype = t.dtype

    def one(ei, ej, zq, zt, w, m):
        qi, ti, qj, tj = q[ei], t[ei], q[ej], t[ej]
        z12 = jnp.zeros((12,), dtype)

        def res(dx12):
            return _edge_residual(qi, ti, qj, tj, zq, zt, dx12[:6], dx12[6:])

        r = res(z12)
        J = jax.jacfwd(res)(z12)  # (6, 12)
        wm = w * m.astype(dtype)
        sw = jnp.sqrt(wm)
        return wm * (J.T @ J), sw * J, wm * (J.T @ r), wm * (r @ r)

    return jax.vmap(one)(
        edges.i, edges.j, edges.zq, edges.zt, edges.w, edges.mask
    )


def _chol6(A):
    """Unrolled Cholesky + inverse for a 6x6 SPD block (no While-loop
    linalg kernels — they dominate inside lax.scan bodies; see
    filter/esekf._chol_unrolled)."""
    n = 6
    idx = jnp.arange(n)
    L = jnp.zeros_like(A)
    M = A
    for j in range(n):
        piv = jnp.sqrt(jnp.maximum(M[j, j], 1e-30))
        col = jnp.where(idx >= j, M[:, j] / piv, 0.0)
        L = L.at[:, j].set(col)
        M = M - col[:, None] * col[None, :]
    I = jnp.eye(n, dtype=A.dtype)
    V = jnp.zeros_like(L)
    for i in range(n):
        s = L[i] @ V
        V = V.at[i].set((I[i] - s) / L[i, i])
    return V.T @ V


def _block_tridiag_solve(D, Boff, RHS):
    """Solve the block-tridiagonal SPD system T Y = RHS by block Thomas.

    D (K,6,6) diagonal blocks, Boff (K-1,6,6) super-diagonal blocks
    (T[i, i+1] = Boff[i]), RHS (K,6,r). Two lax.scans (forward
    elimination, back substitution) with unrolled 6x6 inverses — the
    TPU-friendly exact solver for the odometry-chain part of the graph."""
    K = D.shape[0]
    # forward elimination carries (C_i = S_i^-1 Boff[i], W_i); each row
    # sees its predecessor's off-diagonal block and its own
    B_prev = jnp.concatenate([jnp.zeros_like(Boff[:1]), Boff], axis=0)  # (K,6,6)
    B_cur = jnp.concatenate([Boff, jnp.zeros_like(Boff[:1])], axis=0)  # (K,6,6)

    def fwd2(carry, inp):
        C_prev, W_prev = carry
        Di, Bp, Bc, Ri = inp
        S = Di - Bp.T @ C_prev
        Sinv = _chol6(0.5 * (S + S.T))
        Ci = Sinv @ Bc
        Wi = Sinv @ (Ri - Bp.T @ W_prev)
        return (Ci, Wi), (Ci, Wi)

    r = RHS.shape[-1]
    init = (jnp.zeros_like(D[0]), jnp.zeros((6, r), D.dtype))
    _, (Cs, Ws) = jax.lax.scan(fwd2, init, (D, B_prev, B_cur, RHS))

    def bwd(carry, inp):
        Y_next = carry
        Ci, Wi = inp
        Yi = Wi - Ci @ Y_next
        return Yi, Yi

    _, Ys = jax.lax.scan(
        bwd, jnp.zeros((6, r), D.dtype), (Cs, Ws), reverse=True
    )
    return Ys  # (K, 6, r)


@functools.partial(jax.jit, static_argnames=("iters", "gauge"))
def optimize_sparse(
    q, t, odo: EdgeSet, loops: EdgeSet, iters: int = 10,
    damping=1e-4, gauge: int = 0,
):
    """Structured Gauss-Newton over all keyframe poses: the odometry
    chain assembles into a block-tridiagonal system T (solved exactly by
    block Thomas, two lax.scans) and each loop edge contributes a rank-6
    coupling U_e U_e^T handled by the Woodbury identity over the 6L-dim
    loop space:

      H = T + U U^T,
      H^-1 b = Y_b - Y_U (I + U^T Y_U)^-1 U^T Y_b,   Y_* = T^-1 [b, U].

    This is the north-star "Schur-complement BA" in its single-host
    form (BASELINE configs 4-5): per-edge landmark elimination happened
    in ICP, the reduced pose system is solved by structure instead of a
    dense 6K x 6K factorization — K = 2048 keyframes with dozens of loop
    closures relax in seconds (the dense solver's 1.2 GB normal matrix
    does not fit at all). Odometry edges MUST satisfy j = i + 1; `loops`
    may connect any pair.

    Returns (q_opt, t_opt, final_cost, initial_cost)."""
    K = q.shape[0]
    dtype = t.dtype
    Lcap = loops.i.shape[0]

    def system(q, t):
        He_o, _, be_o, ce_o = _edge_blocks(q, t, odo)
        He_l, Je_l, be_l, ce_l = _edge_blocks(q, t, loops)
        D = jnp.zeros((K, 6, 6), dtype)
        D = D.at[odo.i].add(He_o[:, :6, :6])
        D = D.at[odo.j].add(He_o[:, 6:, 6:])
        Boff = jnp.zeros((K - 1, 6, 6), dtype)
        # odometry edge (i, i+1): its off-diagonal block sits at row i
        Boff = Boff.at[jnp.minimum(odo.i, K - 2)].add(
            jnp.where(odo.mask[:, None, None], He_o[:, :6, 6:], 0.0)
        )
        b = jnp.zeros((K, 6), dtype)
        b = b.at[odo.i].add(be_o[:, :6])
        b = b.at[odo.j].add(be_o[:, 6:])
        b = b.at[loops.i].add(be_l[:, :6])
        b = b.at[loops.j].add(be_l[:, 6:])
        # loop couplings: He_l = (sqrt(w) J)^T (sqrt(w) J) = G G^T with
        # G = Je^T (12, 6) — exact rank-6 factors, no eigen needed
        G = jnp.swapaxes(Je_l, -1, -2)  # (L, 12, 6)
        cost = jnp.sum(ce_o) + jnp.sum(ce_l)
        return D, Boff, b, G, cost

    def solve(D, Boff, b, G):
        # damping + gauge prior live on T's diagonal
        # dense U: (K, 6, 6L) — nonzero rows only at each loop's (i, j);
        # built by one-hot contraction (no scatters)
        onehot_i = (jnp.arange(K)[:, None] == loops.i[None, :]).astype(dtype)
        onehot_j = (jnp.arange(K)[:, None] == loops.j[None, :]).astype(dtype)
        # U[k, :, e*6:(e+1)*6] = onehot_i[k,e] * G[e,:6] + onehot_j[k,e] * G[e,6:]
        Ui = jnp.einsum("ke,eab->keab", onehot_i, G[:, :6, :])
        Uj = jnp.einsum("ke,eab->keab", onehot_j, G[:, 6:, :])
        U = (Ui + Uj).transpose(0, 2, 1, 3).reshape(K, 6, 6 * Lcap)

        RHS = jnp.concatenate([b[..., None], U], axis=-1)  # (K, 6, 1+6L)
        Y = _block_tridiag_solve(D, Boff, RHS)
        Yb = Y[..., 0]  # (K, 6)
        YU = Y[..., 1:]  # (K, 6, 6L)
        UtYb = jnp.einsum("kca,kc->a", U, Yb)
        UtYU = jnp.einsum("kca,kcb->ab", U, YU)
        S = jnp.eye(6 * Lcap, dtype=dtype) + UtYU
        lam_v = jnp.linalg.solve(S, UtYb)
        dx = Yb - jnp.einsum("kca,a->kc", YU, lam_v)
        return dx

    def cost_only(q, t):
        _, _, _, _, c = system(q, t)
        return c

    c0 = cost_only(q, t)

    def body(carry, _):
        q, t, lam = carry
        D, Boff, b, G, c = system(q, t)
        dD = lam * jnp.maximum(
            jnp.diagonal(D, axis1=-2, axis2=-1), 1e-9
        ) + 1e-6
        D = D + jax.vmap(jnp.diag)(dD)
        D = D.at[gauge].add(1e8 * jnp.eye(6, dtype=dtype))
        dx = -solve(D, Boff, b, G)
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
    """Loop-edge measurement: COARSE-TO-FINE point-to-plane ICP of
    keyframe j's cloud onto keyframe i's per-voxel plane model,
    initialized from the current (drifted) estimates. The coarse stage
    (cell_size) has the basin of attraction to swallow meters of drift;
    the fine stage (cell_size / 2, half the Huber scale) polishes the
    alignment — single-stage coarse ICP left 0.1-0.2 m of edge error
    that actively degraded a well-tracked trajectory (round-4 finding).
    Returns (zq, zt, quality) with Z = refined T_i^-1 T_j and quality
    from the FINE stage."""
    zq0, zt0 = relative_pose(q_i, t_i, q_j, t_j)
    zq1, zt1, qual1 = icp_point_to_plane(
        cloud_i, mask_i, cloud_j, mask_j, zq0, zt0,
        cell_size=cell_size, min_pts=min_pts, iters=iters,
    )
    zq2, zt2, qual2 = icp_point_to_plane(
        cloud_i, mask_i, cloud_j, mask_j, zq1, zt1,
        cell_size=cell_size / 2.0, min_pts=min_pts, iters=iters,
        huber=0.15,
    )
    # quality-driven stage selection: on sparse clouds the halved cells
    # may fall under min_pts (quality ~ 0) — keep the coarse result then;
    # on dense clouds the fine stage wins
    use_fine = qual2 >= qual1
    zq = jnp.where(use_fine, zq2, zq1)
    zt = jnp.where(use_fine, zt2, zt1)
    return zq, zt, jnp.maximum(qual1, qual2)


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

    capacity: int = 2048
    loop_capacity: int = 64
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
        self.edges = []  # (i, j, zq, zt, w, kind) host tuples;
        # kind is "odo" | "loop" — an explicit tag, NOT inferred from
        # index adjacency: a loop edge remapped onto adjacent kept nodes
        # by _decimate must stay a loop edge (inference by j == i + 1
        # silently dropped it on the next decimation and let it shadow
        # the true odometry measurement in chain())
        self._round = 0
        self.n_loop_edges = 0
        self.opt_q = None
        self.opt_t = None
        self.relaxed_count = 0
        self._pending = None
        self.n_feedback = 0  # corrections staged (observability)

    def observe(self, out, t_base=0.0):
        self._round += 1
        if self._round % self.keyframe_every:
            return
        if self.count >= self.capacity:
            # explicit capacity policy (VERDICT round-3 item 4): decimate
            # instead of silently dropping new keyframes — every other
            # keyframe is merged away, odometry measurements compose
            # exactly, loop edges remap onto kept endpoints, and the
            # keyframe cadence doubles so the graph covers the whole
            # sequence at half the temporal resolution
            self._decimate()
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
                (k - 1, k, np.asarray(zq), np.asarray(zt), self.odom_weight,
                 "odo")
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
            # information weight scales with measured alignment quality:
            # a marginal edge should pull gently, a crisp one firmly
            self.edges.append(
                (int(j), k, np.asarray(zq), np.asarray(zt),
                 self.loop_weight * float(quality), "loop")
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

    @staticmethod
    def _z_compose(z1, z2):
        """T(a,c) = T(a,b) T(b,c) on (q, t) pairs (numpy host math)."""
        q1, t1 = z1
        q2, t2 = z2
        q = np.asarray(so3.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        t = t1 + np.asarray(so3.quat_rotate(jnp.asarray(q1), jnp.asarray(t2)))
        return q, t

    @staticmethod
    def _z_inv(z):
        q, t = z
        qi = np.asarray(so3.quat_conj(jnp.asarray(q)))
        ti = -np.asarray(so3.quat_rotate(jnp.asarray(qi), jnp.asarray(t)))
        return qi, ti

    def _decimate(self):
        """Halve the keyframe density: keep every other keyframe (plus
        the newest), compose the odometry measurements across removed
        nodes, and remap loop edges onto kept endpoints by composing with
        the interleaving odometry — measurement content is preserved
        exactly, no silent loss."""
        n = self.count
        keep = list(range(0, n, 2))
        if keep[-1] != n - 1:
            keep.append(n - 1)
        remap = {old: new for new, old in enumerate(keep)}
        odo_z = {
            e[0]: (e[2], e[3]) for e in self.edges if e[5] == "odo"
        }

        def chain(a, b):
            z = (np.array([1.0, 0, 0, 0]), np.zeros(3))
            for s in range(a, b):
                z = self._z_compose(z, odo_z[s])
            return z

        new_edges = []
        for a, b in zip(keep[:-1], keep[1:]):
            zq, zt = chain(a, b)
            new_edges.append(
                (remap[a], remap[b], zq, zt, self.odom_weight, "odo")
            )
        floor_keep = {old: old - (old % 2) for old in range(n)}
        for (i, j, zq, zt, w, kind) in self.edges:
            if kind == "odo":
                continue  # odometry, already rebuilt
            i2 = i if i in remap else floor_keep[i]
            j2 = j if j in remap else floor_keep[j]
            if i2 == j2:
                continue
            z = (np.asarray(zq), np.asarray(zt))
            if i2 != i:
                z = self._z_compose(chain(i2, i), z)
            if j2 != j:
                z = self._z_compose(z, self._z_inv(chain(j2, j)))
            new_edges.append((remap[i2], remap[j2], z[0], z[1], w, "loop"))

        idx = np.asarray(keep)
        m = len(keep)
        self.q[:m] = self.q[idx]
        self.t[:m] = self.t[idx]
        self.clouds[:m] = self.clouds[idx]
        self.masks[:m] = self.masks[idx]
        self.times[:m] = self.times[idx]
        self.count = m
        self.edges = new_edges
        self.keyframe_every *= 2
        self.opt_q = self.opt_t = None
        self.relaxed_count = 0

    def take_correction(self):
        """One-shot: the staged world-frame correction (dq [w,x,y,z],
        dt (3,)) or None. Consumed by run_sequence after observe()."""
        c, self._pending = self._pending, None
        return c

    def _pack_edges(self, items, E):
        i = np.zeros(E, np.int32)
        j = np.zeros(E, np.int32)
        zq = np.tile([1.0, 0, 0, 0], (E, 1))
        zt = np.zeros((E, 3))
        w = np.zeros(E)
        m = np.zeros(E, bool)
        for e, (ei, ej, q, t, we, _kind) in enumerate(items[:E]):
            i[e], j[e], zq[e], zt[e], w[e], m[e] = ei, ej, q, t, we, True
        return empty_edges(E, self.dtype)._replace(
            i=jnp.asarray(i), j=jnp.asarray(j),
            zq=jnp.asarray(zq, self.dtype), zt=jnp.asarray(zt, self.dtype),
            w=jnp.asarray(w, self.dtype), mask=jnp.asarray(m),
        )

    def _edge_sets(self):
        odo = [e for e in self.edges if e[5] == "odo"]
        loops = [e for e in self.edges if e[5] == "loop"]
        # loop overflow: keep the most recent loop edges (older sections
        # are already welded by earlier relaxations)
        loops = loops[-self.loop_capacity:]
        return (
            self._pack_edges(odo, self.capacity - 1),
            self._pack_edges(loops, self.loop_capacity),
        )

    def relax(self):
        """Global structured Gauss-Newton over all keyframes currently in
        the graph (optimize_sparse: block-tridiagonal odometry chain +
        Woodbury over the loop couplings — the single-host form of the
        north-star Schur-complement BA; scales to the full 2048-keyframe
        capacity where the dense 6K x 6K solver cannot be built).

        Initialized from raw odometry every time: the LM iteration
        re-converges in a few steps, which keeps the estimate a pure
        function of (odometry, edges) — no hidden dependence on
        relaxation history. Poses beyond `count` are inert (their chain
        blocks are damped-identity; the gauge prior pins node 0)."""
        K = self.capacity
        odo, loops = self._edge_sets()
        q_opt, t_opt, c1, c0 = optimize_sparse(
            jnp.asarray(self.q[:K], self.dtype),
            jnp.asarray(self.t[:K], self.dtype),
            odo,
            loops,
            iters=self.relax_iters,
        )
        # np.array (copy): jax->numpy views are read-only and feedback
        # mutates these in place
        self.opt_q = np.array(q_opt)
        self.opt_t = np.array(t_opt)
        # how many nodes the optimizer actually saw as live — later
        # keyframes chain onto the optimized anchor (see trajectory())
        self.relaxed_count = self.count
        return float(c1), float(c0)

    def trajectory(self):
        """Graph-optimized keyframe trajectory (t, pos, quat).

        Keyframes added AFTER the last relax have no optimized pose —
        their opt_* slots still hold the solver's inert-node values
        (identity initialization under damping). Returning those raw
        slots silently corrupted the tail of the trajectory (measured:
        ATE 0.09 -> 1.64 on the end-to-end loop-closure test whenever
        keyframes arrived after the final closure). Post-relax keyframes
        are instead chained onto the last optimized pose by the raw
        odometry increments: T_k = dT o T_raw[k] with
        dT = T_opt[rc-1] o T_raw[rc-1]^-1 (the world-frame delta of the
        last relaxed node) — the same left-delta composition
        _apply_feedback uses."""
        n = self.count
        if n == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        if self.opt_q is None:
            return self.times[:n].copy(), self.t[:n].copy(), self.q[:n].copy()
        rc = min(self.relaxed_count, n)
        out_q = np.array(self.opt_q[:n])
        out_t = np.array(self.opt_t[:n])
        if 0 < rc < n:
            a = rc - 1
            dq = np.asarray(
                so3.quat_normalize(
                    so3.quat_mul(
                        jnp.asarray(out_q[a]),
                        so3.quat_conj(jnp.asarray(self.q[a])),
                    )
                )
            )
            Rd = np.asarray(so3.quat_to_mat(jnp.asarray(dq)))
            dt = out_t[a] - Rd @ self.t[a]
            for k in range(rc, n):
                out_q[k] = np.asarray(
                    so3.quat_normalize(
                        so3.quat_mul(jnp.asarray(dq), jnp.asarray(self.q[k]))
                    )
                )
                out_t[k] = Rd @ self.t[k] + dt
        return self.times[:n].copy(), out_t, out_q
