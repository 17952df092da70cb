"""Checkpoint / resume for the LIO carry.

The reference has none (SURVEY §5: state lives in RAM, outputs are
append-only); here the entire filter+map state is a pytree, so a
checkpoint is a flat .npz of its leaves. Saving every K scans enables
seek/resume (the file player can seek but the reference estimator cannot
re-localize; with this it can resume exactly)."""
from __future__ import annotations

import pathlib

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path, carry):
    leaves, _ = _flatten_with_paths(carry)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **leaves)


def load(path, template):
    """Load into the structure of `template` (a carry with matching
    shapes, e.g. from pipeline.init_carry)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(q) for q in p)
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch at {key}: {arr.shape} vs {np.shape(leaf)}")
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)
