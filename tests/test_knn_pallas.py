"""Parity of the fused Pallas k-NN select/compact kernel
(ops/knn_pallas.py) against the jnp twin it replaces on the TPU f32
path. Runs in interpreter mode on the CPU test host — the selection
logic is identical either way; only the execution engine differs."""
import numpy as np
import jax.numpy as jnp
import pytest

from malio_tpu.map import voxel_hash as vh
from malio_tpu.ops import knn_pallas

rng = np.random.default_rng(11)


def _random_window(Q=37, C=96):
    """Random candidate window with mixed validity (some rows sparse,
    one row fully invalid, duplicated distances for tie coverage)."""
    qs = rng.uniform(-5, 5, size=(Q, 3)).astype(np.float32)
    pts = rng.uniform(-6, 6, size=(Q, C, 3)).astype(np.float32)
    valid = rng.uniform(size=(Q, C)) < 0.7
    valid[3 % Q] = False  # an all-invalid row
    valid[4 % Q, 10:] = False  # fewer than k valid
    pts[2 % Q, 20 % C] = pts[2 % Q, 4]  # exact duplicate -> distance tie
    covs = rng.uniform(0.01, 0.5, size=(Q, C)).astype(np.float32)
    return (
        jnp.asarray(qs), jnp.asarray(pts), jnp.asarray(covs),
        jnp.asarray(valid),
    )


def test_kernel_matches_jnp_twin_bitwise():
    qs, pts, covs, valid = _random_window()
    K = 16
    p_pts, p_covs, p_d2 = vh._topk_extract(qs, pts, covs, valid, K, True)
    j_pts, j_covs, j_d2 = vh._topk_extract(qs, pts, covs, valid, K, False)
    np.testing.assert_array_equal(np.asarray(p_d2), np.asarray(j_d2))
    np.testing.assert_array_equal(np.asarray(p_pts), np.asarray(j_pts))
    np.testing.assert_array_equal(np.asarray(p_covs), np.asarray(j_covs))
    # ascending within the valid prefix; invalid lanes at finfo max
    d2 = np.asarray(p_d2)
    big = np.finfo(np.float32).max
    assert (d2[3] == big).all()
    for q in range(d2.shape[0]):
        v = d2[q][d2[q] < big]
        assert (np.diff(v) >= 0).all()


def test_kernel_non_multiple_block_and_small_q():
    """Q far below the kernel block size pads correctly."""
    qs, pts, covs, valid = _random_window(Q=5, C=40)
    p = vh._topk_extract(qs, pts, covs, valid, 8, True)
    j = vh._topk_extract(qs, pts, covs, valid, 8, False)
    for a, b in zip(p, j):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_knn_cached_pallas_path_matches_jnp():
    """Full knn_cached (incl. wide escalation + compact cache splice):
    use_pallas=True must reproduce the jnp path exactly on f32."""
    m = vh.create(1 << 12, 0.5, jnp.float32)
    n = 600
    pts = jnp.asarray(rng.uniform(-8, 8, size=(n, 3)), jnp.float32)
    covs = jnp.asarray(rng.uniform(0.01, 0.2, size=(n,)), jnp.float32)
    m = vh.insert(m, pts, covs, jnp.ones(n, bool))
    # queries: half near stored points (dense), half far away (escalate)
    q_near = pts[:40] + 0.1
    q_far = jnp.asarray(rng.uniform(20, 28, size=(24, 3)), jnp.float32)
    qs = jnp.concatenate([q_near, q_far], axis=0)
    qmask = jnp.ones(qs.shape[0], bool).at[-3:].set(False)

    def run(use_pallas):
        return vh.knn_cached(
            m, qs, radius=1, wide_radius=3, wide_budget=32,
            qmask=qmask, cache_k=16, use_pallas=use_pallas,
        )

    out_p = run(True)
    out_j = run(False)
    names = ["nn_pts", "nn_covs", "nn_d2", "nn_cnt", "n_miss",
             "cache_pts", "cache_covs", "cache_valid"]
    for nm, a, b in zip(names, out_p, out_j):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
