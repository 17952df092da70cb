import numpy as np
import jax
import jax.numpy as jnp

from malio_tpu import state as st
from malio_tpu.filter import dynamics, esekf
from malio_tpu.geometry import s2

rng = np.random.default_rng(1)
L = 3
N = st.dof(L)


def rand_state(l=L):
    x = st.identity_state(l, jnp.float64)
    dx = jnp.asarray(rng.normal(size=st.dof(l)) * 0.3)
    x = st.boxplus(x, dx)
    return st.State(
        pos=x.pos + jnp.asarray(rng.normal(size=3) * 5),
        rot=x.rot,
        ext_r=x.ext_r,
        ext_t=x.ext_t + jnp.asarray(rng.normal(size=(l, 3))),
        vel=x.vel + jnp.asarray(rng.normal(size=3)),
        bg=jnp.asarray(rng.normal(size=3) * 0.01),
        ba=jnp.asarray(rng.normal(size=3) * 0.01),
        grav=x.grav,
    )


def test_dof_layout():
    assert st.dof(3) == 35
    assert st.dof(2) == 29
    assert st.dof(1) == 23


def test_boxplus_boxminus_roundtrip():
    x = rand_state()
    dx = jnp.asarray(rng.normal(size=N) * 0.1)
    x2 = st.boxplus(x, dx)
    np.testing.assert_allclose(st.boxminus(x2, x), dx, atol=1e-8)
    np.testing.assert_allclose(st.boxminus(x, x), jnp.zeros(N), atol=1e-12)


def test_boxplus_preserves_gravity_norm():
    x = rand_state()
    dx = jnp.asarray(rng.normal(size=N))
    x2 = st.boxplus(x, dx)
    np.testing.assert_allclose(jnp.linalg.norm(x2.grav), s2.DEFAULT_LENGTH, atol=1e-9)


def test_transition_jacobian_matches_autodiff():
    """F must be the Jacobian of dx -> step(x boxplus dx) boxminus step(x)."""
    x = rand_state()
    u = dynamics.Input(
        acc=jnp.asarray([0.3, -0.2, 9.7]), gyro=jnp.asarray([0.1, -0.3, 0.2])
    )
    dt = 0.002

    x_next, F, Fw = dynamics.transition(x, u, dt)

    def fwd(dx):
        x2, _, _ = dynamics.transition(st.boxplus(x, dx), u, dt)
        return st.boxminus(x2, x_next)

    J = jax.jacobian(fwd)(jnp.zeros(N))
    # first-order agreement (the MTK recipe is exact in the chart transport,
    # first-order in dt for the dynamics coupling)
    np.testing.assert_allclose(np.asarray(J), np.asarray(F), atol=5e-5)


def test_noise_jacobian_shape_and_blocks():
    x = rand_state()
    u = dynamics.Input(acc=jnp.zeros(3), gyro=jnp.zeros(3))
    _, _, Fw = dynamics.transition(x, u, 0.01)
    assert Fw.shape == (N, 12)
    # bias rows are identity * dt
    np.testing.assert_allclose(
        Fw[st.idx_bg(L) : st.idx_bg(L) + 3, 6:9], 0.01 * jnp.eye(3), atol=1e-12
    )


def test_predict_covariance_psd():
    x = rand_state()
    P = jnp.eye(N) * 0.01
    Q = dynamics.process_noise_matrix(1e-4, 1e-4, 1e-5, 1e-5, jnp.float64)
    u = dynamics.Input(acc=jnp.asarray([0.0, 0.0, 9.8]), gyro=jnp.asarray([0.01, 0, 0]))
    for _ in range(5):
        x, P = dynamics.predict(x, P, u, 0.01, Q)
    evals = jnp.linalg.eigvalsh((P + P.T) / 2)
    assert float(evals.min()) > 0
    np.testing.assert_allclose(P, P.T, atol=1e-12)


def test_iekf_update_linear_position_measurement():
    """With a linear position measurement the IEKF must match the closed-form
    Kalman update."""
    x0 = rand_state()
    P0 = jnp.eye(N) * 0.04
    z = x0.pos + jnp.asarray([0.5, -0.3, 0.2])
    Rm = 0.01
    act = 6 * (L + 1)
    M = 8  # padded rows; 3 effective

    def h_share(x, search, cache):
        H = jnp.zeros((M, act))
        H = H.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
        resid = z - x.pos
        h = jnp.zeros(M).at[:3].set(resid)
        R = jnp.full((M,), Rm)
        mask = jnp.arange(M) < 3
        return esekf.HShareResult(
            valid=jnp.asarray(True), h=h, H=H, R=R, mask=mask
        ), cache

    out = esekf.update_iterated(x0, P0, h_share, None, max_iter=4)
    # closed-form EKF posterior for pos block
    H = np.zeros((3, N)); H[:, :3] = np.eye(3)
    P = np.asarray(P0)
    S = H @ P @ H.T + Rm * np.eye(3)
    K = P @ H.T @ np.linalg.inv(S)
    dx = K @ np.asarray(z - x0.pos)
    P_post = (np.eye(N) - K @ H) @ P
    np.testing.assert_allclose(np.asarray(out.x.pos), np.asarray(x0.pos) + dx[:3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.P)[:3, :3], P_post[:3, :3], atol=1e-6)
    assert bool(out.valid)


def test_iekf_update_invalid_keeps_state():
    x0 = rand_state()
    P0 = jnp.eye(N) * 0.01
    M, act = 4, 6 * (L + 1)

    def h_share(x, search, cache):
        return esekf.HShareResult(
            valid=jnp.asarray(False),
            h=jnp.zeros(M),
            H=jnp.zeros((M, act)),
            R=jnp.ones(M),
            mask=jnp.zeros(M, bool),
        ), cache

    out = esekf.update_iterated(x0, P0, h_share, None, max_iter=3)
    np.testing.assert_allclose(out.P, P0, atol=1e-12)
    np.testing.assert_allclose(out.x.pos, x0.pos, atol=1e-12)
    assert not bool(out.valid)
