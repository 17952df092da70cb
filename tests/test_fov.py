"""Sliding local-map box (lasermap_fov_segment, laserMapping.cpp:171-224):
unit tests of the box-update law plus a pipeline run with a small cube so
the slide + eviction actually fire mid-sequence (the default synthetic
world never leaves the initial box, so other tests never exercise this)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from malio_tpu import pipeline, runner
from malio_tpu.io.assemble import assemble_groups
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.map import voxel_hash as vh
from malio_tpu.eval import ate
from tests.test_integration import _cfg


def _seg(cfg, bmin, bmax, init, pos):
    return pipeline._fov_segment(
        cfg,
        jnp.asarray(bmin, jnp.float64),
        jnp.asarray(bmax, jnp.float64),
        jnp.asarray(init),
        jnp.asarray(pos, jnp.float64),
    )


def test_fov_segment_box_law():
    cfg = dataclasses.replace(_cfg(1, 256), cube_len=30.0, det_range=8.0)
    half, thresh = 15.0, 1.5 * 8.0
    # first call: fresh box centered on the sensor (laserMapping.cpp:180-188)
    bmin, bmax, init, moved = _seg(cfg, np.zeros(3), np.zeros(3), False, [1.0, 2, 3])
    np.testing.assert_allclose(np.asarray(bmin), [1 - half, 2 - half, 3 - half])
    np.testing.assert_allclose(np.asarray(bmax), [1 + half, 2 + half, 3 + half])
    assert bool(init) and not bool(moved)

    # well inside: nothing moves
    b2min, b2max, _, moved = _seg(cfg, bmin, bmax, True, [1.0, 2, 3])
    assert not bool(moved)
    np.testing.assert_allclose(np.asarray(b2min), np.asarray(bmin))

    # within mov_threshold*det_range of the +x face: box slides +x by
    # max(0.45*(cube-2*thresh), det_range*(mov_threshold-1)) (:199-206)
    pos = np.array([1 + half - thresh + 0.5, 2.0, 3.0])
    b3min, b3max, _, moved = _seg(cfg, bmin, bmax, True, pos)
    mov = max((30 - 2 * thresh) * 0.5 * 0.9, 8.0 * 0.5)
    assert bool(moved)
    np.testing.assert_allclose(np.asarray(b3min)[0], float(bmin[0]) + mov)
    np.testing.assert_allclose(np.asarray(b3min)[1:], np.asarray(bmin)[1:])
    np.testing.assert_allclose(np.asarray(b3max)[0], float(bmax[0]) + mov)

    # near the -y face: slides -y
    pos = np.array([1.0, 2 - half + thresh - 0.5, 3.0])
    b4min, _, _, moved = _seg(cfg, bmin, bmax, True, pos)
    assert bool(moved)
    np.testing.assert_allclose(np.asarray(b4min)[1], float(bmin[1]) - mov)


@pytest.mark.slow
def test_pipeline_box_slides_and_evicts():
    """With a cube barely larger than the slide threshold, the box moves
    mid-sequence, stale voxels are evicted at the move, and tracking
    stays tight.

    Invariant (matching the reference): eviction happens when the box
    MOVES (lasermap_fov_segment + Delete_Point_Boxes); map_incremental
    then inserts the current scan without any box filter
    (laserMapping.cpp:398-446), so out-of-box points inserted after the
    last move may legally persist. The check is therefore per-move:
    points stored before the move that fall outside the moved box must
    be gone immediately after it."""
    cfg = dataclasses.replace(
        _cfg(1, 768), cube_len=30.0, det_range=8.0, extrinsic_est_en=False
    )
    seq = SyntheticSequence(duration=5.0, num_lidars=1, points_per_scan=768)
    imu, rounds, traj = seq.generate()

    log = []

    def cb(carry, out, t):
        pts, _ = vh.extract_points(carry.map)
        log.append((np.asarray(carry.box_min).copy(),
                    np.asarray(carry.box_max).copy(), pts))

    res = runner.run_sequence(
        cfg, assemble_groups(cfg, imu, rounds), dtype=jnp.float64, callback=cb
    )

    carry = res["carry"]
    start = traj.pos(0.0)
    # the box is no longer the fresh one centered at the start
    fresh_min = start - 15.0
    assert float(np.abs(np.asarray(carry.box_min) - fresh_min).max()) > 1.0

    moves = [
        i for i in range(1, len(log))
        if not np.allclose(log[i][0], log[i - 1][0])
    ]
    assert moves, "the box never slid"
    for i in moves:
        bmin, bmax, after = log[i]
        before = log[i - 1][2]
        stale = before[
            ((before < bmin - 1e-6) | (before > bmax + 1e-6)).any(axis=1)
        ]
        if stale.size and after.size:
            # none of the stale out-of-box points survive the move round
            d2 = np.min(
                np.sum((after[None, :, :] - stale[:, None, :]) ** 2, -1), axis=1
            )
            assert (d2 > 1e-12).all()
        # points the move round itself inserted are from the live scan;
        # everything else obeys the box
        assert after.shape[0] > 0

    pts, _ = vh.extract_points(carry.map)
    assert pts.shape[0] > 100

    # tracking stayed healthy through the slide(s)
    gt = traj.pos(res["t"])
    assert ate.ate_rmse(res["pos"], gt, align=True) < 0.2
