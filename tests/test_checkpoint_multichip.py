import sys
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__
from malio_tpu import checkpoint, pipeline


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    carry, out = fn(*args)
    assert out.pos.shape == (3,)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_checkpoint_roundtrip(tmp_path):
    fn, (carry, group) = __graft_entry__.entry()
    carry2, _ = fn(carry, group)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, carry2)
    restored = checkpoint.load(p, carry)
    np.testing.assert_allclose(
        np.asarray(restored.x.pos), np.asarray(carry2.x.pos), atol=0
    )
    np.testing.assert_allclose(np.asarray(restored.P), np.asarray(carry2.P), atol=0)
    # resumed carry steps identically
    a, _ = fn(carry2, group)
    b, _ = fn(restored, group)
    np.testing.assert_allclose(np.asarray(a.x.pos), np.asarray(b.x.pos), atol=1e-12)


@pytest.mark.slow
def test_multichip_dryrun_8_devices():
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    __graft_entry__.dryrun_multichip(8)
