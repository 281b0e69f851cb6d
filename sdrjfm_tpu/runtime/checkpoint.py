"""Receiver-state checkpoint/resume.

The reference persists only GUI settings between runs (QSettings ini,
radio.cpp:466-531) — DSP state is never checkpointed (SURVEY.md §5.4).  In
the block design the carry pytree *is* the complete DSP state, so
checkpointing is exact: save the state + the global stream position, restore,
and the continued stream is bit-identical to an uninterrupted run
(tests/test_checkpoint.py asserts this).

Format: npz of flattened leaves + a JSON header with a format version and a
config fingerprint.  Loading verifies both — a checkpoint from a different
receiver configuration (different filter lengths, block geometry, decoder)
fails with a clear message instead of a shape assert deep in the tree.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Tuple

import jax
import numpy as np

# v2: PilotState.filt carries plain demod samples (the ×5 pilot input gain
# moved into the filter response so the pilot/RDS bandpasses can share one
# forward FFT).  v<=1 checkpoints resume with a one-filter-length pilot
# transient (~8 ms) — loadable, not bit-exact.
FORMAT_VERSION = 2


class CheckpointError(RuntimeError):
    pass


def config_fingerprint(cfg) -> str:
    """Stable hash of a ReceiverConfig (any dataclass with repr fields).

    Fields that change only the input wire layout, not the DSP state
    (iq_format — tests/test_iq_format.py proves formats are bit-identical),
    are excluded so a resume may switch formats; this also keeps
    fingerprints of configs predating the field compatible.
    """
    from dataclasses import asdict
    d = asdict(cfg)
    d.pop("iq_format", None)
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_state(path: str, state: Any, extra: dict | None = None,
               cfg=None) -> None:
    """Save a state pytree (and optional JSON-able metadata) to an npz.

    cfg: optional ReceiverConfig; its fingerprint is stored and verified at
    load time.
    """
    flat, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
    header = {"format_version": FORMAT_VERSION, "n_leaves": len(flat),
              "extra": extra or {}}
    if cfg is not None:
        header["config_fingerprint"] = config_fingerprint(cfg)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def save_state_orbax(path: str, state: Any, extra: dict | None = None,
                     cfg=None) -> None:
    """Save via orbax-checkpoint (directory format, async-capable, the
    standard JAX ecosystem checkpointer).  Same header contract as the npz
    backend; choose this for very large states or multi-host runs where
    orbax's sharded-array handling matters.  `path` becomes a directory.
    """
    import os
    import orbax.checkpoint as ocp
    header = {"format_version": FORMAT_VERSION}
    if extra:
        header["extra"] = extra
    if cfg is not None:
        header["config_fingerprint"] = config_fingerprint(cfg)
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"state": state, "header_json": json.dumps(header)},
               force=True)


def load_state_orbax(path: str, template: Any, cfg=None) -> Tuple[Any, dict]:
    """Restore an orbax checkpoint written by save_state_orbax."""
    import os
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(os.path.abspath(path),
                        item={"state": template, "header_json": ""})
    header = json.loads(raw.get("header_json") or "{}")
    if header.get("format_version", 0) > FORMAT_VERSION:
        raise CheckpointError(
            f"checkpoint {path} has format v{header['format_version']}, "
            f"this build reads up to v{FORMAT_VERSION}")
    if cfg is not None and header.get("config_fingerprint"):
        want = config_fingerprint(cfg)
        if header["config_fingerprint"] != want:
            raise CheckpointError(
                f"checkpoint {path} was written by a different receiver "
                f"configuration (fingerprint {header['config_fingerprint']} "
                f"!= {want})")
    return raw["state"], header.get("extra", {})


def load_state(path: str, template: Any, cfg=None) -> Tuple[Any, dict]:
    """Restore a state pytree using `template` (e.g. rx.init_state()) for
    structure/dtype; returns (state, metadata).

    cfg: optional ReceiverConfig to verify against the stored fingerprint.
    Directories are dispatched to the orbax backend automatically.
    """
    import os
    if os.path.isdir(path):
        return load_state_orbax(path, template, cfg=cfg)
    data = np.load(path)
    raw = json.loads(bytes(data["__meta__"].tobytes()).decode() or "{}")
    # v0 checkpoints stored the extra dict directly (no header)
    if "format_version" in raw:
        header, extra = raw, raw.get("extra", {})
    else:
        header, extra = {"format_version": 0}, raw
    if header["format_version"] > FORMAT_VERSION:
        raise CheckpointError(
            f"checkpoint {path} has format v{header['format_version']}, "
            f"this build reads up to v{FORMAT_VERSION}")
    if cfg is not None and header.get("config_fingerprint"):
        want = config_fingerprint(cfg)
        if header["config_fingerprint"] != want:
            raise CheckpointError(
                f"checkpoint {path} was written by a different receiver "
                f"configuration (fingerprint {header['config_fingerprint']} "
                f"!= {want}); rebuild with the matching ReceiverConfig")
    flat, treedef = _flatten_with_paths(template)
    if header.get("n_leaves") not in (None, len(flat)):
        raise CheckpointError(
            f"checkpoint {path} has {header['n_leaves']} state leaves, "
            f"this configuration expects {len(flat)}")
    leaves = []
    for i, t in enumerate(flat):
        v = data[f"leaf_{i}"]
        t_arr = np.asarray(t)
        if v.shape != t_arr.shape:
            raise CheckpointError(
                f"state leaf {i}: shape {v.shape} != expected {t_arr.shape} "
                "(checkpoint from a different configuration?)")
        leaves.append(jax.numpy.asarray(v.astype(t_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves), extra
