"""Iterated error-state Kalman filter on the LIO manifold.

Functional re-derivation of esekfom::esekf (esekfom.hpp): the filter is a
pytree (x, P) and every operation returns a new one. The iterated update
(update_iterated_dyn_share_modified, esekfom.hpp:495-721) becomes a
lax.while_loop whose carry holds the candidate state, the tangent-transported
covariance and the convergence bookkeeping; the measurement model is a
callback returning padded, masked arrays.

The Kalman solve uses the information form on the active (pose + extrinsics)
block exactly as the reference's n <= m branch (esekfom.hpp:620-638):

  P_temp = P^-1;  P_temp[:a,:a] += H^T R^-1 H;  K = P_temp^-1 H^T R^-1

with a = 6 (L+1). H rows live only on the active block, so HtH is an (a, a)
matmul over all padded points — MXU-friendly.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Any

import jax
import jax.numpy as jnp

from ..geometry import so3, s2
from .. import state as st


class HShareResult(NamedTuple):
    """Output of the measurement model for one IEKF iteration
    (dyn_share_datastruct, esekfom.hpp:81-90, padded + masked)."""

    valid: jnp.ndarray  # scalar bool: any effective feature
    h: jnp.ndarray  # (M,) weighted residuals (already -pd2 * weights)
    H: jnp.ndarray  # (M, active) weighted Jacobian rows
    R: jnp.ndarray  # (M,) per-point measurement noise
    mask: jnp.ndarray  # (M,) bool: effective rows


HShareFn = Callable[[st.State, jnp.ndarray, Any], tuple[HShareResult, Any]]


def _tangent_transport(x_lin: st.State, dx, x_prop: st.State):
    """Block-diagonal chart-transport Jacobian applied to dx and P inside the
    iterated update (esekfom.hpp:532-572): A(dx_seg)^T per SO(3) block,
    Nx(x) Mx(x_prop, dx_seg) for the S2 gravity block."""
    L = x_lin.num_lidars
    n = st.dof(L)
    J = jnp.eye(n, dtype=dx.dtype)
    for s in st.so3_block_starts(L):
        seg = jax.lax.dynamic_slice(dx, (s,), (3,))
        blk = jnp.swapaxes(so3.A_matrix(seg), -1, -2)
        J = jax.lax.dynamic_update_slice(J, blk.astype(J.dtype), (s, s))
    gi = st.idx_grav(L)
    seg2 = jax.lax.dynamic_slice(dx, (gi,), (2,))
    # chart blocks come from the (possibly lower-precision) state; the
    # transport runs in dx's dtype (the solve dtype)
    Nx = s2.s2_nx_yy(x_lin.grav.astype(dx.dtype))
    Mx = s2.s2_mx(x_prop.grav.astype(dx.dtype), seg2)
    J = jax.lax.dynamic_update_slice(J, (Nx @ Mx).astype(J.dtype), (gi, gi))
    return J


def _spd_inverse(A):
    """Robust inverse of a (nominally) symmetric positive-definite matrix:
    Jacobi scaling + Cholesky, with a jittered retry for indefiniteness.

    The covariance update's subtraction form (P = L - K_x P,
    esekfom.hpp:714) can leave P slightly indefinite; the first Cholesky
    then produces NaNs and the jittered factorization takes over (the
    equilibrated matrix has unit diagonal, so a fixed relative jitter is
    a principled floor). Cholesky replaced the round-3 eigh+clamp: XLA's
    TPU eigh on a 35x35 runs millisecond-scale iterative sweeps and
    dominated the whole fusion round; two triangular solves cost ~nothing
    and the solve island runs f64, where the indefinite case is rare."""
    A = 0.5 * (A + A.T)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-30, None))
    inv_d = 1.0 / d
    As = A * inv_d[:, None] * inv_d[None, :]
    As = 0.5 * (As + As.T)
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    jitter = 1e-5 if A.dtype == jnp.float32 else 1e-10
    L1 = jnp.linalg.cholesky(As)
    L2 = jnp.linalg.cholesky(As + jitter * I)
    ok = ~jnp.any(jnp.isnan(L1))
    Lc = jnp.where(ok, L1, jnp.where(jnp.any(jnp.isnan(L2)), I, L2))
    Linv = jax.scipy.linalg.solve_triangular(Lc, I, lower=True)
    Ws = Linv.T @ Linv
    return Ws * inv_d[:, None] * inv_d[None, :]


class IEKFResult(NamedTuple):
    x: st.State
    P: jnp.ndarray
    iterations: jnp.ndarray
    valid: jnp.ndarray  # whether any iteration had effective features
    cache: Any  # final measurement-model cache (associations, point covs)


def update_iterated(
    x0: st.State,
    P0,
    h_share_fn: HShareFn,
    cache0: Any,
    max_iter: int,
    limit: float = 1e-3,
    r_floor_check: float = 1e-4,
    r_floor_value: float = 1e-3,
    search_on_converge: bool = True,
) -> IEKFResult:
    """Run the iterated update (esekfom.hpp:495-721).

    h_share_fn(x, search_flag, cache) -> (HShareResult, cache). search_flag
    mirrors dyn_share.converge: when True the model re-runs correspondence
    search; when False it reuses the cached associations.

    search_on_converge=False searches only on the first iteration (the
    k-NN is the per-scan bottleneck; the post-convergence re-search moves
    few associations). A speed/fidelity trade the reference doesn't offer.
    """
    L = x0.num_lidars
    n = st.dof(L)
    act = 6 * (L + 1)
    dtype = P0.dtype
    # Solve dtype: the 35x35 information-form solve and covariance update
    # run in f64 when x64 is available, even when the point pipeline and
    # stored state are f32. Measured necessity (City config-3, f32
    # everything): the f32 solve's eigenvalue floor injects covariance
    # along weakly observed directions, P grows ~1.5x/round and detonates
    # around round 10 (normal_y -> 1e10, trajectory lost); with the f64
    # solve island the same run matches the all-f64 trajectory. The extra
    # cost is a few (n, n) ops per iteration — noise next to the (M, act)
    # point math, which stays f32. The reference runs double throughout
    # (Eigen, esekfom.hpp:620-638).
    sdtype = jnp.float64 if jax.config.jax_enable_x64 else dtype
    I_n = jnp.eye(n, dtype=sdtype)

    def body(carry):
        (i, t, converge, x, _P_t, _Kxa, _dx_out, ever_valid, cache, _done) = carry
        search = converge if search_on_converge else (i == -1)
        res, cache = h_share_fn(x, search, cache)

        dx = st.boxminus(x, x0).astype(sdtype)
        J = _tangent_transport(x, dx, x0)
        dx_new = J @ dx
        P_t = J @ P0.astype(sdtype) @ J.T

        w_mask = res.mask.astype(sdtype)
        R_eff = jnp.where(res.R < r_floor_check, r_floor_value, res.R).astype(sdtype)
        w = w_mask / R_eff  # (M,)
        HTw = res.H.T.astype(sdtype) * w[None, :]  # (act, M)
        HTH = HTw @ res.H.astype(sdtype)  # (act, act)

        P_inv = _spd_inverse(P_t)
        P_temp = P_inv.at[:act, :act].add(HTH)
        Pi = _spd_inverse(P_temp)
        Pia = Pi[:, :act]
        K_h = Pia @ (HTw @ res.h.astype(sdtype))
        K_xa = Pia @ HTH  # (n, act)

        dx_out = K_h + K_xa @ dx_new[:act] - dx_new
        dx_out = jnp.where(res.valid, dx_out, jnp.zeros_like(dx_out))
        x_new = st.boxplus(x, dx_out)

        conv_new = jnp.all(jnp.abs(dx_out) < limit) & res.valid
        t_new = t + conv_new.astype(jnp.int32)
        # force a final re-search if nothing converged by the second-to-last
        # iteration (esekfom.hpp:660-663)
        conv_new = conv_new | ((t_new == 0) & (i == max_iter - 2))
        done = (t_new > 1) | (i == max_iter - 1)
        # an invalid iteration skips all bookkeeping (reference `continue`)
        done = jnp.where(res.valid, done, i == max_iter - 1)
        return (
            i + 1,
            t_new,
            conv_new,
            x_new,
            P_t,
            K_xa,
            dx_out,
            ever_valid | res.valid,
            cache,
            done,
        )

    def cond(carry):
        return ~carry[-1]

    init = (
        jnp.asarray(-1, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(True),
        x0,
        P0.astype(sdtype),
        jnp.zeros((n, act), sdtype),
        jnp.zeros((n,), sdtype),
        jnp.asarray(False),
        cache0,
        jnp.asarray(False),
    )
    (i, _t, _c, x_f, P_t, K_xa, dx_out, ever_valid, cache_f, _d) = jax.lax.while_loop(
        cond, body, init
    )

    # final covariance update with fresh chart transport at the accepted step
    # (esekfom.hpp:665-714) — still in the solve dtype
    J2 = _tangent_transport(x_f, dx_out, x0)
    L_mat = J2 @ P_t @ J2.T
    P_cols = P_t @ J2.T
    K2 = J2 @ K_xa  # row transport of K_x's active columns
    P_new = L_mat - K2 @ P_cols[:act, :]
    # the subtraction form drifts from symmetry; repair it so the next
    # round's propagation and solve stay positive-definite
    P_new = (0.5 * (P_new + P_new.T)).astype(dtype)

    P_out = jnp.where(ever_valid, P_new, P0)
    x_out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ever_valid, new, old), x_f, x0
    )
    return IEKFResult(
        x=x_out, P=P_out, iterations=i + 1, valid=ever_valid, cache=cache_f
    )
