"""Checkpoint / resume for solver state.

The reference has no checkpointing at all — the in-place ``x`` plus the
RNGs' get_state/set_state are its only persistent artifacts (SURVEY.md §5).
Here every solver state is an explicit pytree (including the PRNG key), so
checkpointing is generic: ``save``/``load`` round-trip any state through an
``.npz`` file, and resuming is just calling the solver's ``step`` on the
loaded state.

For large multi-host states prefer orbax (``save_orbax``/``load_orbax``,
available when orbax-checkpoint is importable) which handles sharded arrays.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, state: Any) -> None:
    """Serialize a solver-state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        is_key = hasattr(leaf, "dtype") and jax.numpy.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        )
        if is_key:  # typed PRNG keys serialize via their raw key data
            arrays[f"leaf_{i}_keydata"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def load(path: str, like: Any) -> Any:
    """Load a state pytree saved by :func:`save`; ``like`` supplies the
    structure (e.g. a freshly init-ed state)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, leaf in enumerate(leaves):
        if f"leaf_{i}_keydata" in data:
            out.append(jax.random.wrap_key_data(jax.numpy.asarray(data[f"leaf_{i}_keydata"])))
        else:
            out.append(jax.numpy.asarray(data[f"leaf_{i}"]))
    return jax.tree_util.tree_unflatten(treedef, out)


def save_orbax(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
