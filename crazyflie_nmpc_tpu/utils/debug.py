"""Debug utilities — the TPU-side answer to SURVEY.md §5 "race detection".

The reference tolerates benign data races between ROS callbacks and timers
(acados_estimator.cpp:196-229); the functional core here removes shared
mutable state entirely, so the debug plane is about *numerics*:

- `check_finite(tree, where)` raises on NaN/Inf anywhere in a pytree with
  a per-leaf report (the jax.debug_nans equivalent scoped to checkpoints
  instead of every op).
- `assert_deterministic(fn, *args)` runs a jitted function twice and
  verifies bitwise-identical results — the deterministic-replay property
  closed-loop tests rely on (tests/test_runtime_extras.py pins exact
  checkpoint resume on top of this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, where: str = "") -> None:
    """Raise FloatingPointError naming every non-finite leaf."""
    bad = []
    leaves, _ = jax.tree.flatten_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            n = int(np.size(arr) - np.isfinite(arr).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n} non-finite")
    if bad:
        raise FloatingPointError(
            f"non-finite values{' in ' + where if where else ''}: "
            + "; ".join(bad))


def finite_or_fallback(value, fallback):
    """Traced guard: `value` if every leaf is finite, else `fallback`.

    The hold-last-action semantics of the reference's failed-solve path
    (acados_mpc.cpp:714-717) as a pure function; used by
    runtime.LoopConfig.guard_failures.
    """
    ok = jnp.array(True)
    for leaf in jax.tree.leaves(value):
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return jax.tree.map(lambda v, f: jnp.where(ok, v, f), value, fallback)


def assert_deterministic(fn, *args, runs: int = 2) -> None:
    """Run `fn(*args)` `runs` times; raise if any result bit differs."""
    ref = jax.tree.map(np.asarray, fn(*args))
    for k in range(1, runs):
        out = jax.tree.map(np.asarray, fn(*args))
        pairs = zip(jax.tree.leaves(ref), jax.tree.leaves(out))
        for i, (a, b) in enumerate(pairs):
            if not np.array_equal(a, b, equal_nan=True):
                raise AssertionError(
                    f"run {k} differs from run 0 at leaf {i}: "
                    f"max |diff| = {np.abs(a - b).max()}")
