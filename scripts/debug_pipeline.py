#!/usr/bin/env python
"""Step the pipeline manually and inspect intermediates."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from malio_tpu.config import Config
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.io.assemble import assemble_groups
from malio_tpu import runner, pipeline, propagate as prop, measurement as meas
from malio_tpu.map import voxel_hash as vh
from malio_tpu.filter import dynamics, esekf
from malio_tpu import preprocess as pre
from malio_tpu.geometry import so3

L = 1
cfg = Config(
    num_lidars=L, lid_type=(3,), n_scans=(64,), point_filter_num=(1,),
    extrinsic_T=(0.2, 0.0, 0.0), extrinsic_R=(1.0, 0, 0, 0),
    max_raw_points=1024, max_points_per_scan=1024, max_imu_per_group=32,
    traj_capacity=64, spline_capacity=64, epoch_capacity=32,
    map_capacity=1 << 17, filter_size_surf=0.4, filter_size_map=0.4,
    cube_len=300.0, det_range=60.0, plane_th=0.1,
)
seq = SyntheticSequence(duration=3.0, num_lidars=L, points_per_scan=1024,
                        ext_t=np.array([[0.2, 0.0, 0.0]]))
imu, rounds, traj = seq.generate()
groups = assemble_groups(cfg, imu, rounds)
print(len(groups), "groups")

init = runner.ImuInitializer()
gi = 0
# skip first + init
init.update(np.asarray(groups[0]["imu"], np.float64), groups[0]["imu_mask"])
gi = 1
while not init.done:
    init.update(np.asarray(groups[gi]["imu"], np.float64), groups[gi]["imu_mask"])
    gi += 1
print("init done at group", gi, "mean_acc", init.mean_acc, "n", init.n)

dtype = jnp.float64
x0 = runner.initial_state(cfg, init, dtype)
P0 = runner.initial_covariance(cfg, dtype)
Q = jnp.asarray(np.diag(np.concatenate([init.cov_gyr, init.cov_acc,
    np.full(3, cfg.b_gyr_cov), np.full(3, cfg.b_acc_cov)])), dtype)
carry = pipeline.init_carry(cfg, x0, P0, Q, dtype)
carry = carry._replace(mean_acc_norm=jnp.asarray(np.linalg.norm(init.mean_acc), dtype))

def to_group(g):
    return prop.MeasureGroup(
        t_shift=jnp.asarray(0.0, dtype),
        pts=jnp.asarray(g["pts"], dtype), pts_mask=jnp.asarray(g["pts_mask"]),
        beg_t=jnp.asarray(g["beg_t"], dtype), end_t=jnp.asarray(g["end_t"], dtype),
        imu=jnp.asarray(g["imu"], dtype), imu_mask=jnp.asarray(g["imu_mask"]),
        imu_cont=jnp.asarray(g["imu_cont"], dtype),
        imu_cont_mask=jnp.asarray(g["imu_cont_mask"]))

# ---- round 1: map build ----
g = to_group(groups[gi])
und = prop.undistort(cfg, carry.x, carry.P, carry.hist, g, carry.Q,
                     carry.last_in, carry.last_end_t, carry.mean_acc_norm)
print("=== undistort round 1 ===")
print("hist n", und.hist.n, "base", und.base)
print("x pos", und.x.pos, "vel", und.x.vel)
t_gt = float(g.end_t[0])
print("gt pos delta from init-time:", traj.pos(t_gt) - traj.pos(float(g.beg_t[0])))
print("epoch_count", und.epoch_count)
print("deskewed pts sample", und.pts_deskewed[0, :3])
print("raw pts sample", g.pts[0, :3, :3])

carry, out = pipeline.step(cfg, carry, g)
print("after step1: map", int(out.map_size), "eff", int(out.n_effective))

# ---- round 2: should match against map ----
g2 = to_group(groups[gi + 1])
und2 = prop.undistort(cfg, carry.x, carry.P, carry.hist, g2, carry.Q,
                      carry.last_in, carry.last_end_t, carry.mean_acc_norm)
ds_pts, ds_aux, ds_mask = pre.voxel_downsample(
    und2.pts_deskewed[0], und2.pt_epoch[0][:, None].astype(dtype),
    g2.pts_mask[0], cfg.filter_size_surf, cfg.max_points_per_scan)
print("=== round 2 ===")
print("ds valid:", int(ds_mask.sum()))
# world transform with current state
x = und2.x
p_imu = so3.quat_rotate(x.ext_r[0][None], ds_pts) + x.ext_t[0][None]
p_world = so3.quat_rotate(x.rot[None], p_imu) + x.pos[None]
nn_pts, nn_covs, nn_d2, nn_cnt, _ = vh.knn(carry.map, p_world, k=5, radius=1)
valid = np.asarray(ds_mask)
print("nn_cnt histogram (valid pts):", np.bincount(np.asarray(nn_cnt)[valid], minlength=6))
print("d2[4] stats:", np.percentile(np.asarray(nn_d2)[valid, 4], [10, 50, 90]))
sel = valid & (np.asarray(nn_cnt) >= 5) & (np.asarray(nn_d2)[:, 4] <= 5)
print("selected after nn:", sel.sum())

# plane fit
import jax as _jax
normal, d, pv, pc = _jax.vmap(meas._esti_plane, in_axes=(0, 0, None, None))(
    nn_pts, nn_covs, jnp.asarray(cfg.plane_th, dtype), jnp.asarray(cfg.cov_threshold, dtype))
pv = np.asarray(pv)
print("plane_valid among sel:", (pv & sel).sum())
pd2 = np.asarray(jnp.sum(normal * p_world, axis=-1) + d)
score = 1 - 0.9 * np.abs(pd2) / np.sqrt(np.maximum(np.linalg.norm(np.asarray(ds_pts), axis=-1), 1e-9))
print("score>0.1 among sel&pv:", ((score > 0.1) & pv & sel).sum())
print("pd2 stats among sel:", np.percentile(np.abs(pd2[sel]), [50, 90, 99]) if sel.sum() else "none")
