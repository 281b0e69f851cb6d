"""Receiver-state checkpoint/resume.

The reference persists only GUI settings between runs (QSettings ini,
radio.cpp:466-531) — DSP state is never checkpointed (SURVEY.md §5.4).  In
the block design the carry pytree *is* the complete DSP state, so
checkpointing is exact: save the state + the global stream position, restore,
and the continued stream is bit-identical to an uninterrupted run
(tests/test_checkpoint.py asserts this).
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_state(path: str, state: Any, extra: dict | None = None) -> None:
    """Save a state pytree (and optional JSON-able metadata) to an npz."""
    flat, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(extra or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a state pytree using `template` (e.g. rx.init_state()) for
    structure/dtype; returns (state, metadata)."""
    data = np.load(path)
    flat, treedef = _flatten_with_paths(template)
    n = len(flat)
    leaves = []
    for i, t in enumerate(flat):
        v = data[f"leaf_{i}"]
        t_arr = np.asarray(t)
        assert v.shape == t_arr.shape, (i, v.shape, t_arr.shape)
        leaves.append(jax.numpy.asarray(v.astype(t_arr.dtype)))
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode() or "{}")
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
