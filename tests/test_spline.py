import numpy as np
import jax.numpy as jnp

from malio_tpu import spline as spl
from malio_tpu.geometry import se3, so3


def make_const_twist_traj(n=40, dt=0.01, xi=(0.2, -0.1, 0.3, 1.0, 0.5, -0.2)):
    """Poses T(t) = exp(t * xi): screw motion — reproduced exactly by a
    cumulative B-spline."""
    xi = jnp.asarray(xi, jnp.float64)
    ts = jnp.arange(n, dtype=jnp.float64) * dt + 100.0
    Ts = se3.exp_se3((ts - ts[0])[:, None] * xi[None])
    qs = so3.mat_to_quat(Ts[:, :3, :3])
    ps = Ts[:, :3, 3]
    return ts, qs, ps, xi


def test_spline_reproduces_screw_motion():
    ts, qs, ps, xi = make_const_twist_traj()
    valid = jnp.ones(ts.shape[0], bool)
    sp = spl.feed_trajectory(ts, qs, ps, valid, cap=64)
    # query well inside the valid region
    tq = jnp.asarray([100.05, 100.112, 100.21, 100.3])
    q_out, p_out, ok = spl.get_pose_batch(sp, tq)
    assert bool(jnp.all(ok))
    T_exp = se3.exp_se3((tq - ts[0])[:, None] * xi[None])
    np.testing.assert_allclose(p_out, T_exp[:, :3, 3], atol=1e-8)
    for i in range(4):
        dq = so3.boxminus(q_out[i], so3.mat_to_quat(T_exp[i, :3, :3]))
        np.testing.assert_allclose(dq, np.zeros(3), atol=1e-8)


def test_spline_bounds():
    ts, qs, ps, _ = make_const_twist_traj(n=40)
    valid = jnp.ones(40, bool)
    sp = spl.feed_trajectory(ts, qs, ps, valid, cap=64)
    # before start (needs one control point before the interval)
    _, _, ok0 = spl.get_pose(sp, ts[0] + 0.001)
    assert not bool(ok0)
    # way after the end
    _, _, ok1 = spl.get_pose(sp, ts[-1] + 1.0)
    assert not bool(ok1)
    # mid is fine
    _, _, ok2 = spl.get_pose(sp, float(ts[0]) + 0.15)
    assert bool(ok2)


def test_spline_padded_invalid_entries_ignored():
    ts, qs, ps, xi = make_const_twist_traj(n=30)
    # pad with garbage entries marked invalid
    ts_p = jnp.concatenate([ts, jnp.full((10,), -42.0)])
    qs_p = jnp.concatenate([qs, jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (10, 1))])
    ps_p = jnp.concatenate([ps, jnp.full((10, 3), 1e6)])
    valid = jnp.concatenate([jnp.ones(30, bool), jnp.zeros(10, bool)])
    sp = spl.feed_trajectory(ts_p, qs_p, ps_p, valid, cap=64)
    q_out, p_out, ok = spl.get_pose(sp, 100.1)
    assert bool(ok)
    T_exp = se3.exp_se3((100.1 - 100.0) * jnp.asarray(xi))
    np.testing.assert_allclose(p_out, T_exp[:3, 3], atol=1e-8)


def test_spline_excludes_last_trajectory_point():
    # the reference feeds size-1 points; a query requiring the last point's
    # support must be invalid
    ts, qs, ps, _ = make_const_twist_traj(n=10)  # spans 0.09 s
    valid = jnp.ones(10, bool)
    sp = spl.feed_trajectory(ts, qs, ps, valid, cap=32)
    # last usable trajectory time is ts[8] = +0.08; control points stop
    # before that; queries near the end must be flagged invalid
    _, _, ok = spl.get_pose(sp, float(ts[0]) + 0.075)
    assert not bool(ok)
