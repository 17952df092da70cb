"""Pallas deskew kernel vs the jnp reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from malio_tpu import spline as spl
from malio_tpu.geometry import se3, so3
from malio_tpu.ops.deskew_pallas import deskew_points

rng = np.random.default_rng(5)


def _make_spline():
    xi = jnp.asarray([0.2, -0.1, 0.3, 1.0, 0.5, -0.2], jnp.float32)
    ts = jnp.arange(40, dtype=jnp.float32) * 0.01
    Ts = se3.exp_se3(ts[:, None] * xi[None])
    qs = so3.mat_to_quat(Ts[:, :3, :3])
    ps = Ts[:, :3, 3]
    return spl.feed_trajectory(ts, qs, ps, jnp.ones(40, bool), cap=64)


def test_kernel_matches_jnp_path():
    sp = _make_spline()
    N = 777  # non-multiple of the block size exercises padding
    pt = jnp.asarray(rng.uniform(0.05, 0.3, N), jnp.float32)
    pxyz = jnp.asarray(rng.normal(size=(N, 3)) * 5, jnp.float32)
    pts = jnp.concatenate([pxyz, pt[:, None]], axis=1)

    eq = so3.exp_so3(jnp.asarray([0.05, -0.1, 0.2], jnp.float32))
    et = jnp.asarray([0.2, 0.0, 0.1], jnp.float32)
    lq = so3.exp_so3(jnp.asarray([0.0, 0.1, -0.05], jnp.float32))
    lt_t = jnp.asarray([0.3, -0.2, 0.05], jnp.float32)

    pq, pp, pok = spl.get_pose_batch(sp, pt)
    pe = so3.quat_rotate(eq[None], pxyz) + et[None]
    pw = so3.quat_rotate(pq, pe) + (pp - lt_t[None])
    pl_ = so3.quat_rotate_inv(jnp.broadcast_to(lq[None], (N, 4)), pw) - et[None]
    ref = so3.quat_rotate_inv(jnp.broadcast_to(eq[None], (N, 4)), pl_)
    ref = jnp.where(pok[:, None], ref, pxyz)

    out = deskew_points(
        pts,
        sp.cps[:, :3, :3],
        sp.cps[:, :3, 3],
        sp.logs,
        sp.t0,
        sp.num_valid,
        spl.CONTROL_DT,
        so3.quat_to_mat(eq),
        et,
        so3.quat_to_mat(lq),
        lt_t,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out[:, 3]) > 0.5, np.asarray(pok))
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(ref), atol=2e-5)
