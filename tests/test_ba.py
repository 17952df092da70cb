"""Sliding-window plane BA: perturbed keyframe poses must be pulled back
toward the ground truth by minimizing the plane eigenvalue cost."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from malio_tpu import ba
from malio_tpu.geometry import so3

rng = np.random.default_rng(11)


def make_window(W=6, P=600, noise=0.0):
    """Keyframes viewing a set of planes from different poses."""
    # world planes: floor + two walls + slanted patch
    planes = [
        (np.array([0.0, 0, 1]), 0.0),
        (np.array([1.0, 0, 0]), -8.0),
        (np.array([0.0, 1, 0]), -6.0),
        (np.array([0.577, 0.577, 0.577]), -5.0),
    ]
    qs, ts, pts, masks = [], [], [], []
    for w in range(W):
        # ground-truth pose
        ang = 0.1 * w
        q_gt = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
        t_gt = np.array([0.5 * w, 0.2 * w, 0.0])
        world_pts = []
        for n, d in planes:
            # sample points on the plane patch
            a = np.cross(n, [0, 0, 1.0])
            if np.linalg.norm(a) < 1e-6:
                a = np.cross(n, [1.0, 0, 0])
            a /= np.linalg.norm(a)
            b = np.cross(n, a)
            uv = rng.uniform(-4, 4, size=(P // len(planes), 2))
            p0 = -d * n
            world_pts.append(p0 + uv[:, :1] * a + uv[:, 1:] * b)
        world_pts = np.concatenate(world_pts)[:P]
        R = so3.quat_to_mat(jnp.asarray(q_gt))
        body = (np.asarray(world_pts) - t_gt) @ np.asarray(R)  # R^T (p - t)
        body += rng.normal(size=body.shape) * noise
        qs.append(q_gt)
        ts.append(t_gt)
        pts.append(body)
        masks.append(np.ones(P, bool))
    return (
        ba.KeyframeWindow(
            q=jnp.asarray(np.stack(qs), jnp.float64),
            t=jnp.asarray(np.stack(ts), jnp.float64),
            pts=jnp.asarray(np.stack(pts), jnp.float64),
            mask=jnp.asarray(np.stack(masks)),
            valid=jnp.ones((W,), bool),
        ),
    )


@pytest.mark.slow
def test_ba_recovers_perturbed_poses():
    (win_gt,) = make_window(noise=0.002)
    # perturb all but the first keyframe
    W = win_gt.q.shape[0]
    d_rot = rng.normal(size=(W, 3)) * 0.02
    d_trans = rng.normal(size=(W, 3)) * 0.05
    d_rot[0] = 0
    d_trans[0] = 0
    win_pert = win_gt._replace(
        q=jax.vmap(so3.boxplus)(win_gt.q, jnp.asarray(d_rot)),
        t=win_gt.t + jnp.asarray(d_trans),
    )

    win_opt, c_final, c0 = ba.optimize_window(
        win_pert, cell_size=2.0, num_cells=8192, min_pts=8, iters=12
    )
    assert float(c_final) < float(c0) * 0.2, (float(c0), float(c_final))

    err_before = np.linalg.norm(np.asarray(win_pert.t - win_gt.t), axis=1).mean()
    err_after = np.linalg.norm(np.asarray(win_opt.t - win_gt.t), axis=1).mean()
    assert err_after < err_before * 0.4, (err_before, err_after)
    rot_err_after = np.mean(
        [
            np.linalg.norm(np.asarray(so3.boxminus(win_opt.q[w], win_gt.q[w])))
            for w in range(1, W)
        ]
    )
    assert rot_err_after < 0.01, rot_err_after


def test_push_keyframe_slides():
    win = ba.empty_window(4, 16, jnp.float64)
    q = jnp.asarray([1.0, 0, 0, 0])
    for k in range(5):
        win = ba.push_keyframe(
            win, q, jnp.full((3,), float(k)), jnp.zeros((16, 3)), jnp.ones((16,), bool)
        )
    assert float(win.t[-1, 0]) == 4.0
    assert float(win.t[0, 0]) == 1.0
    assert bool(win.valid.all())
