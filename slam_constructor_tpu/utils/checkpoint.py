"""Checkpoint / resume for engine state pytrees (SURVEY.md §5: the
reference has NO serialization; this is new capability).

Every engine state (SlamState, GMappingState, PoseGraphState) is a pytree of
arrays, so checkpointing is one flatten + savez. Restore is bit-exact given
the same config (PRNG keys included in the state), which is what makes
failure recovery "restart from snapshot" (SURVEY.md §5 failure detection)
and the determinism tests possible. Orbax is supported for async multi-host
use; the default path has no dependencies.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, state) -> None:
    """Save a pytree of arrays to ``path`` (.npz appended if missing)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def restore(path: str, template):
    """Restore into the structure of ``template`` (same engine config).

    The stored treedef string is checked against the template's as a config
    mismatch guard.
    """
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves_t, treedef = jax.tree.flatten(template)
    stored = bytes(data["__treedef__"]).decode()
    if stored != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n saved: {stored}\n want:  {treedef}"
        )
    n = len(leaves_t)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        like = leaves_t[i]
        leaves.append(jnp.asarray(arr, dtype=getattr(like, "dtype", None)))
    return jax.tree.unflatten(treedef, leaves)


def save_orbax(path: str, state) -> None:
    """Async-capable orbax path (multi-host checkpointing)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def restore_orbax(path: str, template):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
