import numpy as np
import jax
import jax.numpy as jnp

from malio_tpu import uncertainty as unc
from malio_tpu.geometry import so3, se3

rng = np.random.default_rng(7)


def rand_pose(cov_scale=1e-4):
    q = so3.exp_so3(jnp.asarray(rng.normal(size=3) * 0.4))
    t = jnp.asarray(rng.normal(size=3))
    A = rng.normal(size=(6, 6)) * cov_scale
    cov = jnp.asarray(A @ A.T)
    return unc.Pose(q=q, t=t, cov=cov)


def sample_perturbed(pose, n):
    """Sample poses T * exp([u; w]^) with [u(trans); w(rot)] ~ N(0, cov).

    The reference's compounding (cov_1' = Ad(T2^-1) cov1 Ad^T + cov2)
    corresponds to RIGHT (body-frame) perturbations T = T_bar exp(xi)."""
    Lc = np.linalg.cholesky(np.asarray(pose.cov) + 1e-18 * np.eye(6))
    xi_uw = (Lc @ rng.normal(size=(6, n))).T  # (n, 6) [u, w]
    xi_wu = np.concatenate([xi_uw[:, 3:], xi_uw[:, :3]], axis=1)
    T0 = unc.pose_matrix(pose)
    return T0[None] @ se3.exp_se3(jnp.asarray(xi_wu))


def test_compound_pose_mean():
    p1, p2 = rand_pose(), rand_pose()
    out = unc.compound_pose(p1, p2)
    T = unc.pose_matrix(p1) @ unc.pose_matrix(p2)
    np.testing.assert_allclose(unc.pose_matrix(out), T, atol=1e-10)


def test_compound_inv_pose_mean():
    p1, p2 = rand_pose(), rand_pose()
    out = unc.compound_inv_pose(p1, p2)
    T = se3.inv_se3(unc.pose_matrix(p1)) @ unc.pose_matrix(p2)
    np.testing.assert_allclose(unc.pose_matrix(out), T, atol=1e-10)


def test_compound_cov_second_order_term():
    """With cov2 = 0 the compound covariance must be Ad(T2^-1) cov1 Ad^T
    (+ tiny 4th-order corrections)."""
    p1 = rand_pose(1e-3)
    p2 = unc.Pose(
        q=so3.exp_so3(jnp.asarray([0.1, 0.3, -0.2])),
        t=jnp.asarray([1.0, -2.0, 0.5]),
        cov=jnp.zeros((6, 6)),
    )
    out = unc.compound_pose(p1, p2)
    Ad = se3.adjoint(se3.inv_se3(unc.pose_matrix(p2)))
    expected = Ad @ p1.cov @ Ad.T
    np.testing.assert_allclose(out.cov, expected, atol=1e-9, rtol=1e-3)


def test_compound_cov_monte_carlo():
    """Monte-Carlo check of the compound covariance (2nd order dominates)."""
    p1 = rand_pose(5e-3)
    p2 = rand_pose(5e-3)
    out = unc.compound_pose(p1, p2)

    n = 4000
    T1s = sample_perturbed(p1, n)
    T2s = sample_perturbed(p2, n)
    Tc = T1s @ T2s
    T0 = unc.pose_matrix(out)
    # body-frame residual tangent: xi = log(T0^-1 Tc)
    xi = se3.log_se3(se3.inv_se3(T0)[None] @ Tc)
    xi_uw = np.concatenate([np.asarray(xi[:, 3:]), np.asarray(xi[:, :3])], axis=1)
    emp = np.cov(xi_uw.T)
    # loose bound: MC error ~ 1/sqrt(n); compare Frobenius-relative
    denom = np.linalg.norm(np.asarray(out.cov))
    err = np.linalg.norm(emp - np.asarray(out.cov)) / denom
    assert err < 0.15, err


def test_eval_point_uncertainty_properties():
    p = rand_pose(1e-5)
    pt = jnp.asarray([3.0, -2.0, 1.0])
    cov = unc.eval_point_uncertainty(pt, p)
    # symmetric PSD
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)
    assert float(jnp.linalg.eigvalsh(cov).min()) > 0
    # with zero pose cov the result is exactly the rotated measurement cov:
    # R (0.1 I) R^T = 0.1 I
    p0 = unc.Pose(q=p.q, t=p.t, cov=jnp.zeros((6, 6)))
    cov0 = unc.eval_point_uncertainty(pt, p0)
    np.testing.assert_allclose(cov0, 0.1 * jnp.eye(3), atol=1e-10)
    # farther points have larger uncertainty (rotation lever arm)
    big = unc.point_uncertainty_trace(pt * 10, p)
    small = unc.point_uncertainty_trace(pt, p)
    assert float(big) > float(small)


def test_vmap_compound():
    poses = unc.Pose(
        q=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (8, 1)),
        t=jnp.asarray(rng.normal(size=(8, 3))),
        cov=jnp.tile(jnp.eye(6)[None] * 1e-4, (8, 1, 1)),
    )
    single = rand_pose()
    out = jax.vmap(lambda q, t, c: unc.compound_pose(unc.Pose(q, t, c), single))(
        poses.q, poses.t, poses.cov
    )
    assert out.q.shape == (8, 4) and out.cov.shape == (8, 6, 6)
