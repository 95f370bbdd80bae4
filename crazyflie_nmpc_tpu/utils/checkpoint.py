"""Checkpoint / resume for carried solver state.

The reference has no checkpointing (SURVEY.md §5): its only persistent
state is acados' implicit warm start inside nlp_out plus the trajectory
playhead.  Here all carried state is explicit pytrees (RTIState,
PolicyState, EstimatorState, PIDState), so checkpointing is exact and
trivial: flatten to arrays, save, restore.  Works for batched states too —
a 256-drone swarm checkpoint is one file.
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    """Save any pytree of arrays to an .npz with its treedef."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Restore a pytree saved by save_state; `like` provides the treedef
    (and dtypes) to rebuild into — typically a freshly-initialized state."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves_like[i]
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(ref).dtype))
    return jax.tree.unflatten(treedef, leaves)
