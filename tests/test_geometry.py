import numpy as np
import jax
import jax.numpy as jnp
import pytest

from malio_tpu.geometry import so3, se3, s2


rng = np.random.default_rng(0)


def rand_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def test_quat_mul_identity():
    q = rand_quat(16)
    e = jnp.zeros((16, 4)).at[:, 0].set(1.0)
    np.testing.assert_allclose(so3.quat_mul(q, e), q, atol=1e-12)
    np.testing.assert_allclose(so3.quat_mul(e, q), q, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q = rand_quat(32)
    v = jnp.asarray(rng.normal(size=(32, 3)))
    R = so3.quat_to_mat(q)
    np.testing.assert_allclose(
        so3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-12
    )


def test_exp_log_roundtrip():
    v = jnp.asarray(rng.normal(size=(64, 3)))
    # keep |v| strictly below pi (log returns the shortest representative)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / n * jnp.asarray(rng.uniform(0, 0.99 * np.pi, size=(64, 1)))
    q = so3.exp_so3(v)
    np.testing.assert_allclose(so3.log_so3(q), v, atol=1e-9)
    # tiny angles
    v2 = v * 1e-9
    np.testing.assert_allclose(so3.log_so3(so3.exp_so3(v2)), v2, atol=1e-15)


def test_mat_quat_roundtrip():
    q = rand_quat(64)
    q = jnp.where(q[:, :1] >= 0, q, -q)
    np.testing.assert_allclose(so3.mat_to_quat(so3.quat_to_mat(q)), q, atol=1e-9)


def test_boxplus_boxminus():
    q = rand_quat(16)
    d = jnp.asarray(rng.normal(size=(16, 3)) * 0.3)
    q2 = so3.boxplus(q, d)
    np.testing.assert_allclose(so3.boxminus(q2, q), d, atol=1e-9)


def test_A_matrix_identity_at_zero():
    np.testing.assert_allclose(so3.A_matrix(jnp.zeros(3)), jnp.eye(3), atol=1e-12)
    # A(v) relates Exp: d/dt Exp(v t)|structure: Exp(v) = I + A(v) hat(v)
    v = jnp.asarray([0.3, -0.2, 0.5])
    R = so3.exp_so3_mat(v)
    np.testing.assert_allclose(R, jnp.eye(3) + so3.A_matrix(v) @ so3.hat(v), atol=1e-9)


def test_se3_exp_log_roundtrip():
    xi = jnp.asarray(rng.normal(size=(32, 6)))
    xi = xi.at[:, :3].multiply(0.5)
    T = se3.exp_se3(xi)
    np.testing.assert_allclose(se3.log_se3(T), xi, atol=1e-8)
    # inverse
    Ti = se3.inv_se3(T)
    np.testing.assert_allclose(
        jnp.einsum("nij,njk->nik", T, Ti),
        jnp.broadcast_to(jnp.eye(4), (32, 4, 4)),
        atol=1e-10,
    )


def test_se3_small_angle():
    xi = jnp.asarray(rng.normal(size=(8, 6)) * 1e-9)
    T = se3.exp_se3(xi)
    np.testing.assert_allclose(se3.log_se3(T), xi, atol=1e-14)


def test_adjoint_property():
    # Ad(T) @ xi == log(T exp(xi) T^-1) for small xi, tangent order [u, w]
    T = se3.exp_se3(jnp.asarray([0.2, -0.1, 0.3, 1.0, -2.0, 0.5]))
    xi_wu = jnp.asarray([1e-4, -2e-4, 3e-4, 4e-4, 5e-4, -6e-4])  # [w, u]
    X = se3.exp_se3(xi_wu)
    Y = T @ X @ se3.inv_se3(T)
    xi2 = se3.log_se3(Y)  # [w, u]
    # our adjoint uses [u, w] ordering
    xi_uw = jnp.concatenate([xi_wu[3:], xi_wu[:3]])
    out = se3.adjoint(T) @ xi_uw
    np.testing.assert_allclose(out, jnp.concatenate([xi2[3:], xi2[:3]]), rtol=1e-3)


def test_s2_boxplus_preserves_norm():
    g = s2.s2_project(jnp.asarray([-0.1, 0.2, -9.7]))
    d = jnp.asarray([0.05, -0.02])
    g2 = s2.s2_boxplus(g, d)
    np.testing.assert_allclose(jnp.linalg.norm(g2), s2.DEFAULT_LENGTH, atol=1e-10)


def test_s2_boxminus_roundtrip():
    g = s2.s2_project(jnp.asarray([-0.3, 0.1, -9.7]))
    d = jnp.asarray([0.07, -0.04])
    g2 = s2.s2_boxplus(g, d)
    d2 = s2.s2_boxminus(g2, g)
    # boxminus(boxplus(g, d), g) == d only up to chart distortion; for small
    # delta they agree to first order; verify tight numerically
    np.testing.assert_allclose(d2, d, atol=1e-6)
    # same point -> zero
    np.testing.assert_allclose(s2.s2_boxminus(g, g), jnp.zeros(2), atol=1e-12)


def test_s2_mx_is_boxplus_jacobian():
    g = s2.s2_project(jnp.asarray([-0.5, 0.4, -9.6]))
    d0 = jnp.asarray([0.03, -0.06])
    J = jax.jacobian(lambda d: s2.s2_boxplus(g, d))(d0)
    np.testing.assert_allclose(J, s2.s2_mx(g, d0), atol=1e-7)


def test_s2_nx_yy_is_boxminus_jacobian():
    g = s2.s2_project(jnp.asarray([-0.5, 0.4, -9.6]))
    # d/dv boxminus(v, g) at v=g, restricted to the sphere: check against
    # finite difference along tangent perturbations
    J = s2.s2_nx_yy(g)
    Bx = s2.s2_bx(g)
    eps = 1e-6
    for k in range(2):
        dv = Bx[:, k] * eps * s2.DEFAULT_LENGTH
        v2 = s2.s2_project(g + dv)
        num = s2.s2_boxminus(v2, g) / eps
        np.testing.assert_allclose(num, J @ dv / eps, atol=1e-4)


def test_jit_and_vmap_compatible():
    q = rand_quat(8)
    f = jax.jit(jax.vmap(lambda qq: so3.log_so3(so3.boxplus(qq, jnp.ones(3) * 0.1))))
    out = f(q)
    assert out.shape == (8, 3)
    assert not bool(jnp.any(jnp.isnan(out)))
