"""Measurement-model unit tests: plane fit, selection gates, and the three
weighting laws on controlled inputs."""
import numpy as np
import jax
import jax.numpy as jnp

from malio_tpu import measurement as meas
from malio_tpu import state as st
from malio_tpu.map import voxel_hash as vh
from malio_tpu.config import Config

rng = np.random.default_rng(31)


def test_esti_plane_exact_plane():
    n = np.array([0.0, 0.0, 1.0])
    pts = np.array([[0, 0, 2.0], [1, 0, 2], [0, 1, 2], [1, 1, 2], [0.5, 0.5, 2]])
    normal, d, valid, pcov = meas._esti_plane(
        jnp.asarray(pts), jnp.full((5,), 0.1), jnp.asarray(0.1), jnp.asarray(0.5)
    )
    # plane z = 2 -> n.p + d = 0 with |n|=1: n=(0,0,-1), d=2 up to sign
    np.testing.assert_allclose(np.abs(np.asarray(normal)), n, atol=1e-9)
    assert bool(valid)
    resid = pts @ np.asarray(normal) + float(d)
    np.testing.assert_allclose(resid, 0, atol=1e-9)


def test_esti_plane_rejects_nonplanar():
    pts = rng.normal(size=(5, 3)) * 2.0
    _, _, valid, _ = meas._esti_plane(
        jnp.asarray(pts), jnp.full((5,), 0.1), jnp.asarray(0.01), jnp.asarray(0.5)
    )
    assert not bool(valid)


def test_esti_plane_quality_value():
    """plane_cov formula (common_lib.h:167-173): zero when the first
    neighbor's stored covariance is tiny."""
    pts = np.array([[0, 0, 0.0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0.5, 0.5, 0]])
    w_small = jnp.asarray([1e-7, 0.1, 0.1, 0.1, 0.1])
    _, _, _, pc0 = meas._esti_plane(jnp.asarray(pts), w_small, jnp.asarray(0.1), jnp.asarray(0.5))
    assert float(pc0) == 0.0
    w = jnp.full((5,), 0.2)
    _, _, _, pc1 = meas._esti_plane(jnp.asarray(pts), w, jnp.asarray(0.1), jnp.asarray(0.5))
    # uniform weights: frac = (0.5-0.2)/(5*0.3) = 0.2 -> sum(0.04*0.2)=0.04
    np.testing.assert_allclose(float(pc1), 5 * 0.04 * 0.2, atol=1e-9)


def _setup_scene(L=1, M=64, cov_threshold=0.5):
    cfg = Config(
        num_lidars=L,
        lid_type=(3,),
        n_scans=(16,),
        point_filter_num=(1,),
        extrinsic_T=(0.0, 0.0, 0.0),
        extrinsic_R=(1.0, 0, 0, 0),
        max_raw_points=M,
        max_points_per_scan=M,
        map_capacity=1 << 12,
        filter_size_map=0.5,
        plane_th=0.1,
        cov_threshold=cov_threshold,
        knn_radius=1,
    )
    # map: dense grid on the floor z=0
    g = np.arange(-6, 6, 0.5)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    # z=-1.5: the n.p=-1 parametrization cannot represent planes
    # through the origin (same as the reference, common_lib.h:157)
    floor = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, -1.5)], -1)
    m = vh.create(cfg.map_capacity, cfg.filter_size_map, jnp.float64)
    m = vh.insert(
        m, jnp.asarray(floor), jnp.full((floor.shape[0],), 0.1), jnp.ones(floor.shape[0], bool)
    )
    # scan points slightly above the floor (residual 0.02), in body frame
    # with identity pose
    pts = np.concatenate(
        [rng.uniform(-4, 4, size=(M, 2)), np.full((M, 1), -1.48)], axis=1
    )
    E = 8
    data = meas.ScanData(
        pts_body=jnp.asarray(pts),
        pt_lidar=jnp.zeros((M,), jnp.int32),
        pt_epoch=jnp.zeros((M,), jnp.int32),
        pt_mask=jnp.ones((M,), bool),
        tc_q=jnp.asarray([[1.0, 0, 0, 0]]),
        tc_t=jnp.zeros((1, 3)),
        base=jnp.asarray(0, jnp.int32),
        unc_q=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (L, E, 1)),
        unc_t=jnp.zeros((L, E, 3)),
        unc_cov=jnp.tile(jnp.eye(6)[None, None] * 1e-6, (L, E, 1, 1)),
        epoch_count=jnp.full((L,), E, jnp.int32),
    )
    return cfg, m, data


def test_h_share_selects_planar_points_and_weights():
    cfg, m, data = _setup_scene()
    x = st.identity_state(1, jnp.float64)
    h_share, cache = meas.make_h_share(cfg, m, data, x)
    res, cache = h_share(x, jnp.asarray(True), cache)
    assert bool(res.valid)
    sel = np.asarray(res.mask)
    assert sel.sum() > 40  # most floor points should correspond
    # residual magnitude ~0.02 times weights; h = -pd2 * w_plane * w_loc
    h = np.asarray(res.h)[sel]
    assert np.all(np.abs(h) > 0)
    # the floor-only geometry is degenerate in x/y: sigma_min/sigma_max of
    # the position columns is ~0 -> localization weight = localize_cov_min
    Hp = np.asarray(res.H)[sel, :3]
    # normals all +-z
    np.testing.assert_allclose(np.abs(Hp[:, 2]) / np.abs(Hp[:, 2]).max(), 1.0, atol=0.2)
    # point noise law output clamped into [point_cov_min, point_cov_max]
    R = np.asarray(res.R)[sel]
    assert np.all(R >= cfg.point_cov_min - 1e-12)
    assert np.all(R <= cfg.point_cov_max + 1e-12)
    # normal_y written back for map insertion
    assert np.all(np.asarray(cache.normal_y)[sel] > 0)


def test_h_share_localization_weight_degenerate_floor():
    """All normals parallel -> sigma3/sigma1 ~ 0 -> weight floors at
    localize_cov_min (laserMapping.cpp:744-756)."""
    cfg, m, data = _setup_scene()
    x = st.identity_state(1, jnp.float64)
    h_share, cache = meas.make_h_share(cfg, m, data, x)
    res, _ = h_share(x, jnp.asarray(True), cache)
    sel = np.asarray(res.mask)
    # reconstruct the unweighted rows: norms of H[:, :3] per row equal
    # w_plane * w_loc (normal is unit); w_plane in [1/pc_max, 1/pc_min]
    wn = np.linalg.norm(np.asarray(res.H)[sel, :3], axis=1)
    w_plane_max = 1.0 / cfg.plane_cov_min
    assert np.all(wn <= cfg.localize_cov_min * w_plane_max * (1 + 1e-6))
