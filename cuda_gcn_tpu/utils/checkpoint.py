"""Checkpoint / resume: save and restore a training-state pytree as npz.

The reference has no checkpointing at all — weights live and die with the process
(SURVEY.md §5). This adds a lightweight flat-npz format: pytree leaves stored in
flattening order, so any state pytree (params, Adam m/v, step counter, PRNG key)
round-trips bit-exactly. Restore requires a structurally-identical template state
(e.g. from ``train.create_state``), which also guards against shape mismatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)})


def restore_state(path: str, like):
    """Restore a pytree saved by ``save_state`` into the structure of ``like``."""
    with np.load(path) as data:
        arrays = [data[f"leaf_{i}"] for i in range(len(data.files))]
    template_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(template_leaves) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves but template has {len(template_leaves)}")
    for t, a in zip(template_leaves, arrays):
        if tuple(t.shape) != tuple(a.shape):
            raise ValueError(f"leaf shape mismatch: checkpoint {a.shape} vs template {t.shape}")
    leaves = [jnp.asarray(a, dtype=t.dtype) for t, a in zip(template_leaves, arrays)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
