"""DSP-state checkpointing.

The reference has config-level persistence only — DSP state (filter
tails, PLL phases, noise histories) is ephemeral in mutable blocks
(SURVEY §5).  Here every pipeline's state is an explicit pytree, so
checkpoint/resume is a feature: save mid-stream, restart the process,
resume bit-exact.
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(state: Any):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path: str, state: Any, meta: dict | None = None):
    """Save a pytree of arrays to ``path`` (.npz) with its treedef."""
    leaves, treedef = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Tuple[Any, dict]:
    """Restore a pytree saved by save_state; ``like`` supplies the tree
    structure (a freshly-initialized state of the same pipeline)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        want = np.asarray(leaves_like[i])
        if arr.shape != want.shape or arr.dtype != want.dtype:
            raise ValueError(
                f"checkpoint leaf {i} mismatch: saved "
                f"{arr.shape}/{arr.dtype} vs expected "
                f"{want.shape}/{want.dtype} — pipeline config changed?")
        leaves.append(arr)
    meta = json.loads(bytes(data["__meta__"]).decode()) \
        if "__meta__" in data else {}
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
