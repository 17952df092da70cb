#!/usr/bin/env python
"""Square-root (QR) IEKF solve experiment — VERDICT round-4 item 3.

Question: the f64 solve island exists because the information matrix
P^-1 + H^T W H has condition ~1e17 at the City working point (measured
round 4: eigenvalues -2e-8 .. 1.3e9), which is the SQUARE of the
Jacobian stack's conditioning. A square-root formulation factors

    P_temp = A^T A,   A = [ L0inv @ Jinv ; chol(HtWH) ]   (2n x n)

whose triangular factor R (from QR) has cond ~ sqrt(1e17) ~ 3e8 —
nominally representable in f32 (but only ~1.5 decimal digits of
headroom over f32's 1e7 precision). This script measures BOTH claims:

  1. numerical: does an f32 square-root solve reproduce the f64 gain
     K = P_temp^-1 H^T W h to an accuracy that would survive the filter
     (the round-3/4 detonation analyses put the tolerance near 1e-7
     RELATIVE on the small-eigenvalue subspace)?
  2. performance: on the TPU, is the QR path (Householder, sequential
     depth ~n on a 2n x n operand) faster or slower than the current
     unrolled-Cholesky f64 inverse at n = 35?

Synthesis: the information matrix is synthesized with the ROUND-4
MEASURED spectrum (logspace 1e-8..1.3e9 over a random orthogonal basis,
plus the active-block Gram structure), so conditioning matches the real
working point without needing a live capture.

Run on the TPU host:  python benchmarks/sqrt_solve_experiment.py
Record the verdict in benchmarks/RESULTS.md either way.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from malio_tpu import cache as _cache

_cache.enable()

import jax
import jax.numpy as jnp

from malio_tpu.filter import esekf

N = 35  # dof at L=3
ACT = 24


def synth_problem(seed=0):
    """Information matrix with the measured City spectrum (round-4:
    eigenvalues ~1e-8 .. 1.3e9, condition ~1e17) and an exact
    square-root factor B (2N x N, B^T B = A) whose condition is the
    square root (~3.6e8) — the honest SR operand. All f64."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(N, N)))
    evals = np.logspace(-8, np.log10(1.3e9), N)
    A = (Q * evals) @ Q.T
    A = 0.5 * (A + A.T)
    U, _ = np.linalg.qr(rng.normal(size=(2 * N, N)))  # column-orthonormal
    B = U @ (np.sqrt(evals)[:, None] * Q.T)  # B^T B = A exactly
    rhs = rng.normal(size=(N, ACT + 1))
    return A, B, rhs


def rel_err(K, K_ref):
    return float(np.max(np.abs(K - K_ref)) / np.max(np.abs(K_ref)))


def residual(A, K, rhs):
    """Normwise backward error ||A K - rhs|| / ||rhs|| (f64 accumulate)."""
    r = A.astype(np.float64) @ K.astype(np.float64) - rhs
    return float(np.max(np.abs(r)) / np.max(np.abs(rhs)))


def _timeit(f, *args, iters=50):
    out = f(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    # fence with a host fetch of one element (relay-safe, see RESULTS.md:
    # block_until_ready is not a fence through the axon relay)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    A64, stack64, rhs = synth_problem()
    cond = np.linalg.cond(A64)
    print(f"cond(P_temp) = {cond:.3e}, cond(sqrt factor) = "
          f"{np.linalg.cond(stack64):.3e}")

    # --- reference: f64 numpy solve ---
    K_ref = np.linalg.solve(A64, rhs)

    # --- current path: f64 unrolled-cholesky inverse (straight-line) ---
    @jax.jit
    def cur64(Aj, rj):
        Pi = esekf._spd_inverse(Aj)
        return Pi @ rj

    K_cur = np.asarray(cur64(jnp.asarray(A64), jnp.asarray(rhs)))
    e_cur = rel_err(K_cur, K_ref)

    # --- f32 Gram + f32 cholesky inverse (known-bad control) ---
    @jax.jit
    def direct32(Aj, rj):
        Pi = esekf._spd_inverse(Aj)
        return Pi @ rj

    K_32 = np.asarray(
        direct32(jnp.asarray(A64, jnp.float32), jnp.asarray(rhs, jnp.float32))
    )
    e_32 = rel_err(K_32, K_ref)

    # --- square-root path: QR of the stacked factor, then 2 triangular
    # solves. XLA QR on TPU lowers through Householder While-loops; we
    # time it as-is (the honest cost) ---
    def sqrt_solve(stack, rj):
        R = jnp.linalg.qr(stack, mode="r")  # (N, N) upper triangular
        y = jax.scipy.linalg.solve_triangular(R.T, rj, lower=True)
        return jax.scipy.linalg.solve_triangular(R, y, lower=False)

    sqrt64 = jax.jit(lambda s, r: sqrt_solve(s, r))
    K_sr64 = np.asarray(sqrt64(jnp.asarray(stack64), jnp.asarray(rhs)))
    e_sr64 = rel_err(K_sr64, K_ref)
    K_sr32 = np.asarray(
        sqrt64(jnp.asarray(stack64, jnp.float32), jnp.asarray(rhs, jnp.float32))
    )
    e_sr32 = rel_err(K_sr32, K_ref)

    print(f"rel gain error vs f64 numpy (forward; cond-limited, see "
          f"RESULTS.md):")
    print(f"  current f64 chol-inv   {e_cur:.3e}   residual "
          f"{residual(A64, K_cur, rhs):.3e}")
    print(f"  f32 chol-inv (control) {e_32:.3e}   residual "
          f"{residual(A64, K_32, rhs):.3e}")
    print(f"  f64 QR square-root     {e_sr64:.3e}   residual "
          f"{residual(A64, K_sr64, rhs):.3e}")
    print(f"  f32 QR square-root     {e_sr32:.3e}   residual "
          f"{residual(A64, K_sr32, rhs):.3e}")

    t_cur = _timeit(cur64, jnp.asarray(A64), jnp.asarray(rhs))
    t_sr = _timeit(sqrt64, jnp.asarray(stack64), jnp.asarray(rhs))
    t_sr32 = _timeit(
        sqrt64, jnp.asarray(stack64, jnp.float32), jnp.asarray(rhs, jnp.float32)
    )
    print(f"time: current f64 straight-line inverse {t_cur:.3f} ms")
    print(f"time: f64 QR square-root                {t_sr:.3f} ms")
    print(f"time: f32 QR square-root                {t_sr32:.3f} ms")


if __name__ == "__main__":
    main()
