"""Checkpoint / resume: full simulation state to disk and back.

Counterpart of the reference's three checkpoint mechanisms
(/root/reference/src/chrono/input_output/ChCheckpoint.h core state save;
chrono_dem's particle+friction-history checkpoints, ChSystemDem.h:311): any
chrono_tpu state is a pytree of arrays, so a checkpoint is a flattened
name→array archive (npz) plus the treedef as JSON — one function pair covers
MBS, DEM (including friction history), SPH and FSI states alike.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _path_of(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def save_checkpoint(path: str, state: Any, metadata: dict | None = None):
    """Write a pytree state to ``path`` (.npz) with optional JSON metadata."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(leaves_with_paths):
        arrays[f"{i:04d}|{_path_of(kp)}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=1)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a state saved by :func:`save_checkpoint` into the structure of
    ``template`` (same pytree shape — e.g. a freshly-built initial state)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    ordered = [data[k] for k in sorted(data.files,
                                       key=lambda s: int(s.split("|")[0]))]
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(ordered) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(ordered)} leaves, template has {len(leaves)}")
    new_leaves = []
    for tmpl, arr in zip(leaves, ordered):
        tmpl = jnp.asarray(tmpl)
        if tmpl.shape != arr.shape:
            raise ValueError(f"shape mismatch {tmpl.shape} vs {arr.shape}")
        new_leaves.append(jnp.asarray(arr, tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_metadata(path: str) -> dict:
    with open(path + ".meta.json") as f:
        return json.load(f)
