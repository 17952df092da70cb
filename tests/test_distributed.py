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


@pytest.mark.slow
def test_sharded_distinct_sequences_with_sharded_map():
    """DISTINCT sequences per dp shard + the voxel-hash map sharded over mp
    (slot-range ownership): every per-sequence result must match its own
    single-device reference. Symmetric (identical-sequence) batches would
    hide cross-shard indexing bugs; the sharded map exercises the GSPMD
    local-gather+psum lowering of the k-NN and the owner-routed inserts
    (VERDICT round-1 items 3 and weak-4)."""
    assert len(jax.devices()) >= 8
    cfg = ge._tiny_cfg(L=2, pts=256)
    carry, group0 = ge._dummy_inputs(cfg, dtype=jnp.float64)
    B = 4
    rng = np.random.default_rng(42)

    groups_list = []
    for b in range(B):
        pts = np.asarray(group0.pts)
        pts = pts.copy()
        pts[..., :3] += rng.normal(size=pts[..., :3].shape) * (0.5 + 0.2 * b)
        groups_list.append(group0._replace(pts=jnp.asarray(pts)))

    # per-sequence single-device references
    refs = [pipeline.step(cfg, carry, g) for g in groups_list]

    mesh = sharding.make_mesh(8, mp=2)
    carries = sharding.batch_carries([carry] * B)
    groups = sharding.batch_groups(groups_list)
    step = sharding.make_sharded_step(cfg, mesh, carry_template=carries)
    with mesh:
        carries_s = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s),
            carries,
            sharding.carry_sharding(mesh, carries),
        )
        g = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, s),
            groups,
            sharding.group_sharding(mesh, cfg, groups),
        )
        new_carries, out = step(carries_s, g)

    # the map must actually be sharded over mp
    T_slots = new_carries.map.tab.shape[-3]  # bucket rows
    shard_rows = new_carries.map.tab.addressable_shards[0].data.shape[-3]
    assert shard_rows <= (T_slots + 1) // 2, (shard_rows, T_slots)

    for b in range(B):
        ref_carry, ref_out = refs[b]
        np.testing.assert_allclose(
            np.asarray(out.pos[b]), np.asarray(ref_out.pos), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(new_carries.P[b]), np.asarray(ref_carry.P), atol=1e-8
        )
        assert int(out.map_size[b]) == int(ref_out.map_size), b
        # sharded-map contents equal the single-device map (set equality
        # over occupied records; slot layout is identical by construction)
        ref_rec = np.asarray(ref_carry.map.tab)
        got_rec = np.asarray(new_carries.map.tab[b])
        np.testing.assert_allclose(got_rec, ref_rec, atol=1e-9)
