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


@pytest.mark.slow
def test_ba_sharded_cells_match_single_device():
    """The BA cost's per-cell scatter reductions distribute over the mesh:
    sharding the point axis over mp must reproduce the single-device solve
    (GSPMD lowers the segment-sums to local partials + psum — the 'psum'd
    reduction for the pose-graph/BA extension', SURVEY §2.4 / VERDICT
    round-1 item 8)."""
    from jax.sharding import NamedSharding, PartitionSpec as Ps
    from malio_tpu.distributed import sharding as shd

    assert len(jax.devices()) >= 8
    (win,) = make_window(W=6, P=608, noise=0.002)
    pert = win._replace(
        q=jax.vmap(so3.boxplus)(
            win.q, jnp.asarray(rng.normal(size=(6, 3)) * 0.02)
        ),
        t=win.t + jnp.asarray(rng.normal(size=(6, 3)) * 0.05),
    )

    ref_win, ref_cost, ref_c0 = ba.optimize_window(pert, iters=4)

    mesh = shd.make_mesh(8, mp=8)
    with mesh:
        pts_s = jax.device_put(pert.pts, NamedSharding(mesh, Ps(None, "mp")))
        mask_s = jax.device_put(pert.mask, NamedSharding(mesh, Ps(None, "mp")))
        win_s = pert._replace(pts=pts_s, mask=mask_s)
        out_win, cost, c0 = ba.optimize_window(win_s, iters=4)

    np.testing.assert_allclose(float(c0), float(ref_c0), rtol=1e-9)
    np.testing.assert_allclose(float(cost), float(ref_cost), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(out_win.t), np.asarray(ref_win.t), atol=1e-9
    )
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(out_win.q) * np.asarray(ref_win.q), axis=-1)),
        1.0, atol=1e-12,
    )


@pytest.mark.slow
def test_smoother_beats_noisy_odometry():
    """Closing the loop on the smoother's value (VERDICT round-1 weak 6 /
    item 8): with jittery odometry poses over a structured plane world,
    the window-BA refined trajectory must have LOWER aligned ATE than the
    odometry it consumed — not merely be bounded by it."""
    from types import SimpleNamespace
    from malio_tpu.smoother import WindowSmoother
    from malio_tpu.eval.ate import ate_rmse

    r = np.random.default_rng(3)
    planes = [
        (np.array([0.0, 0, 1]), 0.0),
        (np.array([1.0, 0, 0]), -8.0),
        (np.array([0.0, 1, 0]), -6.0),
        (np.array([0.577, 0.577, 0.577]), -5.0),
    ]
    P = 640
    N = 18
    gt_q, gt_t, noisy_q, noisy_t, outs = [], [], [], [], []
    for k in range(N):
        ang = 0.08 * k
        q_gt = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
        t_gt = np.array([0.4 * k, 0.15 * k, 0.02 * k])
        world_pts = []
        for n, d in planes:
            a = np.cross(n, [0, 0, 1.0])
            if np.linalg.norm(a) < 1e-6:
                a = np.cross(n, [1.0, 0, 0])
            a /= np.linalg.norm(a)
            b = np.cross(n, a)
            uv = r.uniform(-4, 4, size=(P // len(planes), 2))
            world_pts.append(-d * n + uv[:, :1] * a + uv[:, 1:] * b)
        world_pts = np.concatenate(world_pts)[:P]
        R = np.asarray(so3.quat_to_mat(jnp.asarray(q_gt)))
        body = (world_pts - t_gt) @ R + r.normal(size=(P, 3)) * 0.005

        # odometry = GT + jitter (what a noisy filter would output)
        dq = r.normal(size=3) * 0.01
        q_n = np.asarray(so3.boxplus(jnp.asarray(q_gt), jnp.asarray(dq)))
        t_n = t_gt + r.normal(size=3) * 0.06
        gt_q.append(q_gt); gt_t.append(t_gt)
        noisy_q.append(q_n); noisy_t.append(t_n)
        outs.append(SimpleNamespace(
            kf_pts=jnp.asarray(body, jnp.float64),
            kf_mask=jnp.ones(P, bool),
            quat=jnp.asarray(q_n, jnp.float64),
            pos=jnp.asarray(t_n, jnp.float64),
            end_time=jnp.asarray(0.1 * k, jnp.float64),
        ))

    sm = WindowSmoother(
        window_size=8, keyframe_every=1, optimize_every=2,
        max_points=P, cell_size=1.5, num_cells=8192, min_pts=6,
        iters=8, dtype=jnp.float64,
    )
    for o in outs:
        sm.observe(o)
    ts, ps, qs = sm.trajectory()
    assert len(ts) >= 8

    gt_t = np.stack(gt_t)
    noisy_t = np.stack(noisy_t)
    kf_idx = np.asarray([int(round(t / 0.1)) for t in ts])
    ate_smooth = ate_rmse(ps, gt_t[kf_idx], align=True)
    ate_odom = ate_rmse(noisy_t[kf_idx], gt_t[kf_idx], align=True)
    assert ate_smooth < 0.7 * ate_odom, (ate_smooth, ate_odom)
