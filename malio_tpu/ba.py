"""Sliding-window plane bundle adjustment over keyframes (TPU-native).

The north-star extension beyond the reference (BASELINE configs 4-5): a
window of keyframe poses is refined by minimizing the BALM-style plane
cost

    C(T_1..T_W) = sum_cells  N_c * lambda_min( Cov_c( {T_w p_i} ) )

where cells are coarse voxels collecting points from all keyframes in the
window. The plane (landmark) parameters are eliminated *analytically* —
lambda_min of the per-cell scatter is exactly the point-to-plane squared
residual sum minimized over the plane — so the reduced system is
pose-only: the classic Schur complement over plane landmarks comes for
free, and per-cell cost/gradient contributions reduce over devices with a
psum when cells are sharded.

Everything is differentiable (segment sums + eigvalsh), so the damped
Gauss-Newton iteration uses jax.grad/hessian on the 6W tangent — idiomatic
JAX replacing hand-derived Jacobian blocks.

Reference context: the reference has no BA; its closest analog is the
iterated per-scan update. Cost shape follows BALM (Liu & Zhang 2020).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from .geometry import so3


class KeyframeWindow(NamedTuple):
    q: jnp.ndarray  # (W, 4) keyframe rotations (body->world)
    t: jnp.ndarray  # (W, 3) keyframe translations
    pts: jnp.ndarray  # (W, P, 3) points in each keyframe's body frame
    mask: jnp.ndarray  # (W, P)
    valid: jnp.ndarray  # (W,) keyframe slots in use


def empty_window(W: int, P: int, dtype=jnp.float32) -> KeyframeWindow:
    qid = jnp.zeros((4,), dtype).at[0].set(1.0)
    return KeyframeWindow(
        q=jnp.tile(qid, (W, 1)),
        t=jnp.zeros((W, 3), dtype),
        pts=jnp.zeros((W, P, 3), dtype),
        mask=jnp.zeros((W, P), bool),
        valid=jnp.zeros((W,), bool),
    )


def push_keyframe(win: KeyframeWindow, q, t, pts, mask) -> KeyframeWindow:
    """Slide the window: drop the oldest, append the new keyframe."""
    return KeyframeWindow(
        q=jnp.concatenate([win.q[1:], q[None]]),
        t=jnp.concatenate([win.t[1:], t[None]]),
        pts=jnp.concatenate([win.pts[1:], pts[None]]),
        mask=jnp.concatenate([win.mask[1:], mask[None]]),
        valid=jnp.concatenate([win.valid[1:], jnp.ones((1,), bool)]),
    )


_PC1 = np.uint32(73856093)
_PC2 = np.uint32(19349663)
_PC3 = np.uint32(83492791)


def _cell_ids(world_pts, cell_size, num_cells):
    k = jnp.floor(world_pts / cell_size).astype(jnp.int32).astype(jnp.uint32)
    h = (k[..., 0] * _PC1) ^ (k[..., 1] * _PC2) ^ (k[..., 2] * _PC3)
    return (h % jnp.uint32(num_cells)).astype(jnp.int32)


def _window_cost(dx, win: KeyframeWindow, cell_size, num_cells, min_pts):
    """Plane cost of the window with tangent perturbation dx (W, 6) applied
    as [rot(3); trans(3)] boxplus. Keyframe 0 is the gauge (its delta is
    zeroed by the caller)."""
    q = jax.vmap(so3.boxplus)(win.q, dx[:, :3])
    t = win.t + dx[:, 3:]

    W, P, _ = win.pts.shape
    world = so3.quat_rotate(q[:, None, :], win.pts) + t[:, None, :]
    w = (win.mask & win.valid[:, None]).astype(world.dtype)
    flat = world.reshape(W * P, 3)
    wf = w.reshape(W * P)

    # cell assignment is derived from the *unperturbed* geometry so it is
    # constant through differentiation (stop_gradient)
    cells = _cell_ids(jax.lax.stop_gradient(flat), cell_size, num_cells)

    n = jnp.zeros((num_cells,), world.dtype).at[cells].add(wf)
    s1 = jnp.zeros((num_cells, 3), world.dtype).at[cells].add(flat * wf[:, None])
    s2 = (
        jnp.zeros((num_cells, 3, 3), world.dtype)
        .at[cells]
        .add(flat[:, :, None] * flat[:, None, :] * wf[:, None, None])
    )
    n_safe = jnp.maximum(n, 1.0)
    mean = s1 / n_safe[:, None]
    cov = s2 / n_safe[:, None, None] - mean[:, :, None] * mean[:, None, :]
    # lambda_min(Cov) = min_n n^T Cov n. Differentiating through eigh is
    # numerically treacherous (gap divisions; plane cells are nearly
    # degenerate in-plane), so freeze the minimizing normal per evaluation
    # (stop_gradient) — alternating minimization whose fixed point equals
    # the eigenvalue cost, with exact first-order gradients (envelope
    # theorem) and a polynomial (smooth) pose dependence.
    cov_sg = jax.lax.stop_gradient(cov)
    lam_sg, vecs = jnp.linalg.eigh(cov_sg + 1e-9 * jnp.eye(3, dtype=world.dtype))
    nvec = jax.lax.stop_gradient(vecs[:, :, 0])  # (num_cells, 3)
    lmin = jnp.einsum("ci,cij,cj->c", nvec, cov, nvec)
    # planarity gate: reject cells whose frozen scatter isn't plane-like
    # (composite cells from hash collisions or plane intersections would
    # otherwise bias the optimum toward flattening unrelated structure)
    planar = lam_sg[:, 0] < 0.05 * jnp.maximum(lam_sg[:, 1], 1e-12)
    active = (n >= min_pts) & planar
    return jnp.sum(jnp.where(active, n * lmin, 0.0))


@functools.partial(
    jax.jit, static_argnames=("num_cells", "min_pts", "iters")
)
def optimize_window(
    win: KeyframeWindow,
    cell_size=1.0,
    num_cells: int = 4096,
    min_pts: int = 6,
    iters: int = 8,
    damping=1e-3,
):
    """Damped (Levenberg-Marquardt) Newton over the pose window.

    Returns (refined window, final cost, initial cost)."""
    W = win.q.shape[0]
    dtype = win.t.dtype

    def cost_of(dx_free):
        # gauge fix: keyframe 0 stays put
        dx = jnp.concatenate([jnp.zeros((1, 6), dtype), dx_free.reshape(W - 1, 6)])
        return _window_cost(dx, win, jnp.asarray(cell_size, dtype), num_cells, min_pts)

    n_free = 6 * (W - 1)
    c0 = cost_of(jnp.zeros((n_free,), dtype))

    def body(carry, _):
        win_c, lam = carry

        def cost_local(dx_free):
            dx = jnp.concatenate(
                [jnp.zeros((1, 6), dtype), dx_free.reshape(W - 1, 6)]
            )
            return _window_cost(
                dx, win_c, jnp.asarray(cell_size, dtype), num_cells, min_pts
            )

        z = jnp.zeros((n_free,), dtype)
        c = cost_local(z)
        g = jax.grad(cost_local)(z)
        H = jax.hessian(cost_local)(z)
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        step = -jnp.linalg.solve(Hd, g)
        c_new = cost_local(step)
        accept = c_new < c
        dx = jnp.where(accept, step, z).reshape(W - 1, 6)
        dx_full = jnp.concatenate([jnp.zeros((1, 6), dtype), dx])
        win_new = win_c._replace(
            q=jax.vmap(so3.boxplus)(win_c.q, dx_full[:, :3]),
            t=win_c.t + dx_full[:, 3:],
        )
        lam_new = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (win_new, jnp.clip(lam_new, 1e-6, 1e3)), c_new

    (win_out, _), costs = jax.lax.scan(
        body, (win, jnp.asarray(damping, dtype)), None, length=iters
    )
    return win_out, costs[-1], c0
