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


class CheckpointManager:
    """Periodic checkpoint writer with retention + async orbax backend.

    The reference never checkpoints DSP state (only QSettings between runs,
    radio.cpp:466-531); a production streaming receiver wants periodic
    snapshots so a multi-hour run can resume after preemption.  Semantics
    follow the orbax CheckpointManager conventions:

      max_to_keep  : keep the newest N checkpoints...
      keep_period  : ...plus every checkpoint whose step is a multiple of
                     this (never deleted), e.g. hourly keepers under a
                     keep-last-3 policy.

    backend='orbax' writes each step through `ocp.AsyncCheckpointer`: the
    device→host copy happens inline (cheap — the carry is a few hundred KB)
    and the filesystem write runs in a background thread, so the receive
    loop is never blocked on IO.  backend='npz' stages the host copy inline
    and hands the npz write to a single worker thread for the same effect.
    Call `wait_until_finished()` (or rely on `save`'s internal barrier)
    before reading a just-written step.

    Layout: `<dir>/ckpt_<step:012d>` — an .npz file or an orbax directory;
    `restore`/`load_state` auto-detect which.
    """

    def __init__(self, directory: str, cfg=None, backend: str = "npz",
                 max_to_keep: int = 3, keep_period: int | None = None,
                 async_write: bool = True):
        import os
        assert backend in ("npz", "orbax"), backend
        assert max_to_keep >= 1
        self.directory = os.path.abspath(directory)
        self.cfg = cfg
        self.backend = backend
        self.max_to_keep = max_to_keep
        self.keep_period = keep_period
        self._pool = None
        self._pending = None
        self._async_ckptr = None
        if async_write and backend == "npz":
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=1)
        os.makedirs(self.directory, exist_ok=True)

    # -- step <-> path ----------------------------------------------------
    def _path(self, step: int) -> str:
        import os
        base = os.path.join(self.directory, f"ckpt_{step:012d}")
        return base + (".npz" if self.backend == "npz" else "")

    def all_steps(self) -> list[int]:
        import os
        import re
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d{12})(?:\.npz)?", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(set(steps))

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- write ------------------------------------------------------------
    def save(self, step: int, state: Any, extra: dict | None = None) -> str:
        """Snapshot `state` as checkpoint `step`; returns its path.

        The device→host copy is taken before returning (the state may keep
        mutating on device); the filesystem write may still be in flight —
        `wait_until_finished()` barriers it.
        """
        self.wait_until_finished()   # serialize: one write in flight
        path = self._path(step)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp
            if self._async_ckptr is None:
                self._async_ckptr = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
            header = {"format_version": FORMAT_VERSION, "step": step}
            if extra:
                header["extra"] = extra
            if self.cfg is not None:
                header["config_fingerprint"] = config_fingerprint(self.cfg)
            self._async_ckptr.save(
                path, {"state": state, "header_json": json.dumps(header)},
                force=True)
        else:
            # host copy now, npz write on the worker thread
            host = jax.tree_util.tree_map(np.asarray, state)
            meta = dict(extra or {})
            meta["step"] = step
            if self._pool is not None:
                self._pending = self._pool.submit(
                    save_state, path, host, meta, self.cfg)
            else:
                save_state(path, host, meta, self.cfg)
        self._retain(in_flight=step)
        return path

    def wait_until_finished(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None
        if self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()

    def _retain(self, in_flight: int | None = None) -> None:
        """Apply the retention policy: newest max_to_keep survive, plus any
        step that is a multiple of keep_period.  in_flight: a step whose
        async write may not be on disk yet — counted as existing (and never
        deleted, being the newest)."""
        import os
        import shutil
        steps = set(self.all_steps())
        if in_flight is not None:
            steps.add(in_flight)
        steps = sorted(steps)
        doomed = steps[:-self.max_to_keep] if self.max_to_keep else []
        for s in doomed:
            if self.keep_period and s and s % self.keep_period == 0:
                continue
            p = self._path(s)
            # an orbax write for a *newer* step may be in flight; deleting
            # an older complete step is safe
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)

    # -- read -------------------------------------------------------------
    def restore(self, template: Any, step: int | None = None
                ) -> Tuple[Any, dict]:
        """Load checkpoint `step` (default: latest).  Returns (state, extra)
        like `load_state`."""
        self.wait_until_finished()
        if step is None:
            step = self.latest_step()
            if step is None:
                raise CheckpointError(
                    f"no checkpoints under {self.directory}")
        return load_state(self._path(step), template, cfg=self.cfg)

    def close(self) -> None:
        self.wait_until_finished()
        if self._pool is not None:
            self._pool.shutdown(wait=True)
        if self._async_ckptr is not None:
            self._async_ckptr.close()
            self._async_ckptr = None


def load_state(path: str, template: Any, cfg=None) -> Tuple[Any, dict]:
    """Restore a state pytree using `template` (e.g. rx.init_state()) for
    structure/dtype; returns (state, metadata).

    cfg: optional ReceiverConfig to verify against the stored fingerprint.
    Directories are dispatched to the orbax backend automatically.
    """
    import os
    import re
    if os.path.isdir(path):
        # a CheckpointManager directory (ckpt_<step> entries) resolves to
        # its latest step; otherwise the dir IS an orbax checkpoint
        entries = sorted(n for n in os.listdir(path)
                         if re.fullmatch(r"ckpt_(\d{12})(?:\.npz)?", n))
        if entries:
            path = os.path.join(path, entries[-1])
            if not os.path.isdir(path):
                return load_state(path, template, cfg=cfg)
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
