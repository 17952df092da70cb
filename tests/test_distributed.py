"""Sharded vs single-device numerical equivalence (SURVEY §4 oracle 4:
the same stream must produce the same estimate regardless of sharding)."""
import sys
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge
from malio_tpu import pipeline
from malio_tpu.distributed import sharding


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8
    cfg = ge._tiny_cfg(L=2, pts=256)
    carry, group = ge._dummy_inputs(cfg, dtype=jnp.float64)

    # single device reference
    ref_carry, ref_out = pipeline.step(cfg, carry, group)

    # batch of 4 identical sequences over a (4, 2) mesh
    mesh = sharding.make_mesh(8, mp=2)
    B = 4
    carries = sharding.batch_carries([carry] * B)
    groups = sharding.batch_groups([group] * B)
    step = sharding.make_sharded_step(cfg, mesh)
    with mesh:
        g = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s),
            groups,
            sharding.group_sharding(mesh, cfg, groups),
        )
        new_carries, out = step(carries, g)

    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out.pos[b]), np.asarray(ref_out.pos), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(new_carries.P[b]), np.asarray(ref_carry.P), atol=1e-8
        )
    assert int(out.map_size[0]) == int(ref_out.map_size)
