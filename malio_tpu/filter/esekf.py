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

# Debug/bisect knob (trace-time): True forces the direct unrolled-
# Cholesky inverse every IEKF iteration, bypassing the Newton-Schulz
# warm path entirely. Used by the soak bisect harness to attribute
# long-horizon divergence between the two solve paths.
FORCE_DIRECT_SOLVE = False

# Trace-time debug: emit per-iteration jax.debug.print diagnostics from
# inside the IEKF while-loop (dx magnitudes by block, residual bounds,
# information-matrix extremes). Zero cost when False.
DEBUG_PRINT = False


def _inv3(B):
    """Closed-form 3x3 inverse (adjugate / Cramer)."""
    c0 = jnp.cross(B[1], B[2])
    c1 = jnp.cross(B[2], B[0])
    c2 = jnp.cross(B[0], B[1])
    det = jnp.dot(B[0], c0)
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1e-300)
    return jnp.stack([c0, c1, c2], axis=-1) / det


def _inv2(B):
    """Closed-form 2x2 inverse."""
    det = B[0, 0] * B[1, 1] - B[0, 1] * B[1, 0]
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1e-300)
    return (
        jnp.asarray([[B[1, 1], -B[0, 1]], [-B[1, 0], B[0, 0]]], B.dtype) / det
    )


def _tangent_transport(x_lin: st.State, dx, x_prop: st.State, with_inverse=False):
    """Block-diagonal chart-transport Jacobian applied to dx and P inside the
    iterated update (esekfom.hpp:532-572): A(dx_seg)^T per SO(3) block,
    Nx(x) Mx(x_prop, dx_seg) for the S2 gravity block.

    with_inverse=True also returns J^-1 assembled from closed-form
    blockwise inverses: P_t^-1 = J^-T P0^-1 J^-1 then needs only the
    ROUND-hoisted P0 inverse instead of a per-iteration 35x35 SPD
    inverse (the solve's dominant cost, round-4 profile)."""
    L = x_lin.num_lidars
    n = st.dof(L)
    J = jnp.eye(n, dtype=dx.dtype)
    Jinv = jnp.eye(n, dtype=dx.dtype) if with_inverse else None
    for s in st.so3_block_starts(L):
        seg = jax.lax.dynamic_slice(dx, (s,), (3,))
        blk = jnp.swapaxes(so3.A_matrix(seg), -1, -2)
        J = jax.lax.dynamic_update_slice(J, blk.astype(J.dtype), (s, s))
        if with_inverse:
            Jinv = jax.lax.dynamic_update_slice(
                Jinv, _inv3(blk).astype(J.dtype), (s, s)
            )
    gi = st.idx_grav(L)
    seg2 = jax.lax.dynamic_slice(dx, (gi,), (2,))
    # chart blocks come from the (possibly lower-precision) state; the
    # transport runs in dx's dtype (the solve dtype)
    Nx = s2.s2_nx_yy(x_lin.grav.astype(dx.dtype))
    Mx = s2.s2_mx(x_prop.grav.astype(dx.dtype), seg2)
    g_blk = (Nx @ Mx).astype(J.dtype)
    J = jax.lax.dynamic_update_slice(J, g_blk, (gi, gi))
    if with_inverse:
        Jinv = jax.lax.dynamic_update_slice(Jinv, _inv2(g_blk), (gi, gi))
        return J, Jinv
    return J


def _chol_unrolled(A, pivot_floor):
    """Cholesky factor of a small SPD matrix by n UNROLLED rank-1
    downdates — no lax.while, no dynamic slices.

    XLA's jnp.linalg.cholesky lowers to a While-loop kernel whose
    serialized micro-steps (plus two triangular-solve While kernels)
    measured ~35 ms PER FUSION ROUND at n=35 in f64 on the v5e — the
    single largest cost of the whole step (round-4 profile). Unrolled,
    the same factorization is one straight-line fusion of ~3n vector ops.

    Pivots are floored at `pivot_floor` (the operand is pre-equilibrated
    to unit diagonal, so a fixed relative floor is principled); this
    replaces the old NaN-detect + jittered-retry: a slightly indefinite
    operand (the P = L - K_x P subtraction form, esekfom.hpp:714) hits
    the floor instead of detonating."""
    n = A.shape[0]
    idx = jnp.arange(n)
    L = jnp.zeros_like(A)
    M = A
    for j in range(n):
        hit = M[j, j] < pivot_floor
        piv = jnp.sqrt(jnp.maximum(M[j, j], pivot_floor))
        col = jnp.where(idx >= j, M[:, j] / piv, 0.0)
        # modified-Cholesky treatment of a floored pivot: keep only the
        # diagonal entry sqrt(floor) and ZERO the below-diagonal column.
        # Dividing a genuinely indefinite column by sqrt(floor) would
        # amplify it ~1/sqrt(floor) and silently poison every subsequent
        # rank-1 downdate; truncating decouples the bad direction instead
        # (the equilibrated operand makes the fixed relative floor
        # principled).
        col = jnp.where(hit, jnp.where(idx == j, piv, 0.0), col)
        L = L.at[:, j].set(col)
        M = M - col[:, None] * col[None, :]
    return L


def _lower_inverse_unrolled(L):
    """L^-1 for lower-triangular L by n unrolled forward substitutions
    (each one masked matvec; no While kernels)."""
    n = L.shape[0]
    I = jnp.eye(n, dtype=L.dtype)
    V = jnp.zeros_like(L)
    for i in range(n):
        s = L[i] @ V  # only rows < i of V are nonzero so far
        V = V.at[i].set((I[i] - s) / L[i, i])
    return V


def _spd_inverse(A):
    """Robust inverse of a (nominally) symmetric positive-definite matrix:
    Jacobi equilibration + unrolled Cholesky + unrolled triangular
    inverse. Straight-line code — every op is a small VPU/MXU primitive,
    which is ~50x faster than the While-loop linalg kernels on TPU at
    n = 35 (see _chol_unrolled)."""
    A = 0.5 * (A + A.T)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-30, None))
    inv_d = 1.0 / d
    As = A * inv_d[:, None] * inv_d[None, :]
    As = 0.5 * (As + As.T)
    floor = 1e-5 if A.dtype == jnp.float32 else 1e-10
    Lc = _chol_unrolled(As, floor)
    Linv = _lower_inverse_unrolled(Lc)
    Ws = Linv.T @ Linv
    return Ws * inv_d[:, None] * inv_d[None, :]


class IEKFResult(NamedTuple):
    x: st.State
    P: jnp.ndarray
    iterations: jnp.ndarray
    valid: jnp.ndarray  # whether any iteration had effective features
    cache: Any  # final measurement-model cache (associations, point covs)
    Pi: Any = None  # last information-matrix inverse — feed back as the
    # next round's Pi0 warm start (see update_iterated)


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
    solve_dtype=None,
    Pi0=None,
) -> IEKFResult:
    """Run the iterated update (esekfom.hpp:495-721).

    h_share_fn(x, search_flag, cache) -> (HShareResult, cache). search_flag
    mirrors dyn_share.converge: when True the model re-runs correspondence
    search; when False it reuses the cached associations.

    search_on_converge=False searches only on the first iteration (the
    k-NN is the per-scan bottleneck; the post-convergence re-search moves
    few associations). A speed/fidelity trade the reference doesn't offer.

    solve_dtype pins the solve-island precision explicitly (callers that
    cannot rely on the process-global x64 flag should pass jnp.float64);
    None keeps the default: f64 when x64 is enabled, else the state dtype
    — in which case an f32 state accepts the documented f32-solve risk
    (covariance growth at ill-conditioned working points, see below).

    Pi0: optional (n, n) warm start for the information-matrix inverse —
    typically the PREVIOUS round's result (IEKFResult.Pi). In steady
    state the information matrix moves little round-to-round, so the
    first iteration can take the Newton-Schulz path and skip the
    ~70-sequential-micro-op direct inverse that dominates the solve cost
    (round-4 profile). Strictly gated: the warm path runs only when the
    spectral-bound residual of Pi0 against THIS round's matrix is < 0.3
    (NaNs or a stale/garbage Pi0 fail the gate and fall back to the
    direct inverse), so the result is the same inverse either way to
    ~4e-9.
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
    sdtype = solve_dtype or (jnp.float64 if jax.config.jax_enable_x64 else dtype)
    I_n = jnp.eye(n, dtype=sdtype)
    P0s = P0.astype(sdtype)
    # ROUND-hoisted: the prior's inverse. Inside the loop only
    # P_t^-1 = J^-T P0^-1 J^-1 (closed-form blockwise J^-1) and ONE SPD
    # inverse of the information matrix remain — the per-iteration
    # spd_inverse(P_t) was half the solve cost (round-4 profile).
    P0_inv = _spd_inverse(P0s)

    def body(carry):
        (i, t, converge, x, _P_t, _Kxa, _dx_out, ever_valid, cache, Pi_prev,
         _done) = carry
        # the i == -1 "search" would exactly reproduce cache0: the cache
        # is BUILT by the same ranking at x0 (make_h_share), so the first
        # iteration reuses it — value-identical, one re-rank cheaper
        search = (
            converge & (i > -1) if search_on_converge else jnp.asarray(False)
        )
        res, cache = h_share_fn(x, search, cache)

        dx = st.boxminus(x, x0).astype(sdtype)
        J, Jinv = _tangent_transport(x, dx, x0, with_inverse=True)
        dx_new = J @ dx

        # the (act, M) x (M, act) reductions run in the POINT dtype on the
        # MXU (jax_default_matmul_precision=highest, i.e. full-f32 passes)
        # and only the tiny (act, act) results are promoted to the solve
        # dtype: f64-emulated M-sized matmuls cost ~1 ms each and the
        # assembly precision (~1e-7 relative on a 12k-term sum) is far
        # inside the measurement noise — the round-3 f32 detonation was a
        # property of the SOLVE, which stays f64
        # Gram assembly stays FULLY f64 (multiplies AND accumulation).
        # Measured at the City working point (round 4): HtWH has
        # eigenvalues spanning -2e-8 .. 1.3e9 (condition ~1e17), so even
        # f32 products under f64 accumulation (1.8e-9 relative error =
        # ~2 ABSOLUTE) corrupt the small eigendirections that encode the
        # weakly observed state and the filter detonates within two
        # rounds; the f64 pipeline's 1e-15 relative error is what keeps
        # them meaningful. This single M-sized f64 matmul costs ~0.3 ms
        # per iteration — the price of a usable information matrix.
        w_mask = res.mask.astype(sdtype)
        R_eff = jnp.where(res.R < r_floor_check, r_floor_value, res.R).astype(sdtype)
        w = w_mask / R_eff  # (M,)
        HTw = res.H.T.astype(sdtype) * w[None, :]  # (act, M)
        HTH = HTw @ res.H.astype(sdtype)  # (act, act)

        P_inv = Jinv.T @ P0_inv @ Jinv
        P_temp = P_inv.at[:act, :act].add(HTH)
        # warm-started Newton-Schulz inverse: across IEKF iterations the
        # information matrix moves by a small state update, so the
        # previous iteration's inverse is a high-quality initializer —
        # three X <- X(2I - AX) steps (6 small matmuls) square the
        # residual thrice. The direct unrolled-Cholesky inverse runs only
        # when the residual check fails (always on the first iteration;
        # rarely after), via lax.cond so the expensive branch is skipped
        # at runtime — ~70 sequential micro-ops per _spd_inverse were the
        # solve's dominant cost (round-4 profile).
        # Gate + VERIFY on the true spectral bound: for E = I - A X,
        # ||E||_2 <= sqrt(||E||_1 ||E||_inf) (max abs col-sum x max abs
        # row-sum — the elementwise max alone does NOT bound the spectral
        # norm at n = 35). Gating the ENTRY on a tight bound starved the
        # warm path (the bound over-estimates by up to ~sqrt(n), so the
        # direct inverse ran nearly every iteration — round-5 profile);
        # instead the entry gate is the loose convergence condition
        # (bound < 0.95) and the RESULT is verified: after the doubling
        # steps the residual bound must be < 1e-7 or the direct inverse
        # runs. NaN or diverged iterates fail verification (NaN compares
        # false), so a garbage Pi_prev only costs the fallback.

        def _sbound(E):
            aE = jnp.abs(E)
            return jnp.sqrt(
                jnp.max(jnp.sum(aE, axis=0)) * jnp.max(jnp.sum(aE, axis=1))
            )

        E0 = I_n - P_temp @ Pi_prev
        r0 = _sbound(E0)

        def warm(_):
            # first doubling step reuses E0: X(2I - AX) = X + X E0
            X = Pi_prev + Pi_prev @ E0
            X = 0.5 * (X + X.T)
            for _ in range(3):
                X = X @ (2.0 * I_n - P_temp @ X)
                X = 0.5 * (X + X.T)
            return X

        if FORCE_DIRECT_SOLVE:
            Pi = _spd_inverse(P_temp)
        else:
            X_w = jax.lax.cond(r0 < 0.95, warm, lambda _: Pi_prev, None)
            r1 = _sbound(I_n - P_temp @ X_w)
            Pi = jax.lax.cond(
                r1 < 1e-7, lambda _: X_w, lambda _: _spd_inverse(P_temp), None
            )
        Pia = Pi[:, :act]
        K_h = Pia @ (HTw @ res.h.astype(sdtype))
        K_xa = Pia @ HTH  # (n, act)

        dx_out = K_h + K_xa @ dx_new[:act] - dx_new
        dx_out = jnp.where(res.valid, dx_out, jnp.zeros_like(dx_out))
        if DEBUG_PRINT:
            jax.debug.print(
                "iekf i={i} neff={ne} |h|max={h:.4e} r0={r0:.3e} "
                "dx_pos={dp:.4e} dx_rot={dr:.4e} dx_bg={db:.4e} "
                "Ptmp_dmin={dm:.3e} Ptmp_dmax={dM:.3e} Pi_max={pm:.3e}",
                i=i, ne=jnp.sum(res.mask), h=jnp.max(jnp.abs(res.h)),
                r0=r0,
                dp=jnp.max(jnp.abs(dx_out[:3])),
                dr=jnp.max(jnp.abs(dx_out[3:6])),
                db=jnp.max(jnp.abs(jax.lax.dynamic_slice(
                    dx_out, (st.idx_bg(L),), (3,)))),
                dm=jnp.min(jnp.diagonal(P_temp)),
                dM=jnp.max(jnp.diagonal(P_temp)),
                pm=jnp.max(jnp.abs(Pi)),
            )
        x_new = st.boxplus(x, dx_out)

        conv_new = jnp.all(jnp.abs(dx_out) < limit) & res.valid
        t_new = t + conv_new.astype(jnp.int32)
        # force a final re-search if nothing converged by the second-to-last
        # iteration (esekfom.hpp:660-663)
        conv_new = conv_new | ((t_new == 0) & (i == max_iter - 2))
        done = (t_new > 1) | (i == max_iter - 1)
        # an invalid iteration skips all bookkeeping (reference `continue`)
        done = jnp.where(res.valid, done, i == max_iter - 1)
        # P_t = J P0 J^T is NOT used by the solve (the information form
        # sandwiches P0_inv instead); only the post-loop covariance update
        # needs it — carry the state it was linearized at and rebuild it
        # once after the loop (saves 2 f64 matmuls per iteration)
        return (
            i + 1,
            t_new,
            conv_new,
            x_new,
            x,
            K_xa,
            dx_out,
            ever_valid | res.valid,
            cache,
            Pi,
            done,
        )

    def cond(carry):
        return ~carry[-1]

    init = (
        jnp.asarray(-1, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(True),
        x0,
        x0,
        jnp.zeros((n, act), sdtype),
        jnp.zeros((n,), sdtype),
        jnp.asarray(False),
        cache0,
        # Pi warm start: previous round's inverse when provided (zeros
        # fail the residual gate, forcing the direct inverse)
        (jnp.zeros((n, n), sdtype) if Pi0 is None else Pi0.astype(sdtype)),
        jnp.asarray(False),
    )
    (i, _t, _c, x_f, x_lin, K_xa, dx_out, ever_valid, cache_f, Pi_f, _d) = (
        jax.lax.while_loop(cond, body, init)
    )

    # rebuild the last iteration's tangent covariance at its
    # linearization state, then the final covariance update with fresh
    # chart transport at the accepted step (esekfom.hpp:665-714)
    dx_lin = st.boxminus(x_lin, x0).astype(sdtype)
    J_lin = _tangent_transport(x_lin, dx_lin, x0)
    P_t = J_lin @ P0s @ J_lin.T
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
        x=x_out, P=P_out, iterations=i + 1, valid=ever_valid, cache=cache_f,
        Pi=Pi_f,
    )
