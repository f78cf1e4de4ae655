"""Checkpoint/resume for scenes and optimization state (SURVEY.md §5
"Checkpoint/resume": the reference is a stateless renderer with none; the
new framework's inverse-rendering loops need restartable state).

Uses orbax-checkpoint when available, falling back to a self-contained npz
format (leaves + treedef repr) that round-trips every Scene/optimizer
pytree in this codebase.
"""
from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np


def save_pytree(path, tree):
    """Save any jax pytree.  `*.npz` → self-contained npz (exact pytree
    round-trip, no target needed); anything else → orbax directory."""
    if str(path).endswith(".npz"):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        with open(path, "wb") as f:
            np.savez(f, __treedef__=np.frombuffer(pickle.dumps(treedef), np.uint8),
                     **arrays)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_pytree(path, like=None):
    """Load a pytree saved by save_pytree.  `like` (an example pytree) is
    required for orbax directories, optional for npz files."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), target=like)
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
        return jax.tree_util.tree_unflatten(treedef, leaves)
