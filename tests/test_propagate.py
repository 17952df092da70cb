"""Propagation-path unit tests: the parallel-prefix covariance scan must
match the sequential predict chain exactly (same algebra, regrouped)."""
import numpy as np
import jax
import jax.numpy as jnp

from malio_tpu import state as st
from malio_tpu.filter import dynamics

rng = np.random.default_rng(21)
L = 2
N = st.dof(L)


def rand_state():
    x = st.identity_state(L, jnp.float64)
    return st.boxplus(x, jnp.asarray(rng.normal(size=N) * 0.2))


def test_parallel_covariance_matches_sequential():
    x = rand_state()
    P0 = jnp.asarray(np.diag(rng.uniform(1e-6, 1.0, N)))
    Q = dynamics.process_noise_matrix(1e-4, 1e-4, 1e-5, 1e-5, jnp.float64)
    K = 17
    gyros = jnp.asarray(rng.normal(size=(K, 3)) * 0.3)
    accs = jnp.asarray(rng.normal(size=(K, 3)) + np.array([0, 0, 9.8]))
    dts = jnp.asarray(rng.uniform(0.005, 0.015, K))

    # sequential oracle
    Ps_seq = []
    xs = x
    Ps = P0
    for k in range(K):
        xs, Ps = dynamics.predict(
            xs, Ps, dynamics.Input(acc=accs[k], gyro=gyros[k]), dts[k], Q
        )
        Ps_seq.append(np.asarray(Ps))

    # parallel path: jacobians from the pre-step states of a mean-only scan
    def mean_step(xc, inp):
        g, a, dt = inp
        x2 = dynamics.step_mean(xc, dynamics.Input(acc=a, gyro=g), dt)
        return x2, xc

    x_f, pres = jax.lax.scan(mean_step, x, (gyros, accs, dts))

    def jac(xp, g, a, dt):
        _, F, Fw = dynamics.transition(xp, dynamics.Input(acc=a, gyro=g), dt)
        return F, Fw @ Q @ Fw.T

    Fs, Qts = jax.vmap(jac)(pres, gyros, accs, dts)
    Ps_par = dynamics.parallel_covariance(Fs, Qts, P0)

    np.testing.assert_allclose(np.asarray(Ps_par), np.stack(Ps_seq), atol=1e-12)
    # mean paths agree too
    np.testing.assert_allclose(np.asarray(x_f.pos), np.asarray(xs.pos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_f.rot), np.asarray(xs.rot), atol=1e-12)


def test_step_mean_matches_transition_mean():
    x = rand_state()
    u = dynamics.Input(acc=jnp.asarray([0.1, -0.2, 9.8]), gyro=jnp.asarray([0.2, 0.1, -0.3]))
    x1 = dynamics.step_mean(x, u, 0.01)
    x2, _, _ = dynamics.transition(x, u, 0.01)
    for a, b in zip(jax.tree_util.tree_leaves(x1), jax.tree_util.tree_leaves(x2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-15)
