"""Work-scaling probe: is wall-clock timing through block_until_ready real?

The axon tunnel runtime has shown a session-wide regression (2026-08-21,
TIMING_INTEGRITY_r03.md) in which `jax.block_until_ready` returns after a
constant ~0.1 ms regardless of the work dispatched — a 2 GiB reduce and a
10-chained-matmul program both "complete" in ~80 us.  Wall-clock numbers
taken through it on such a session measure the dispatch path, not compute.

Every benchmark that times via block_until_ready must call
`timing_integrity_ratio()` first and refuse to publish when the ratio is
flat (below `check_timing_integrity`'s threshold, currently 6): chained
bf16 4096^2 matmuls, 32 links vs 2 links — 16x the FLOPs in the same
number of dispatches must move wall time ~10-15x on a healthy chip, or
the clock is lying.
"""

from __future__ import annotations

import time


def timing_integrity_ratio() -> float:
    """dt(32-link chain) / dt(2-link chain); >= ~10 on a working runtime,
    ~1 when completion signaling is broken.  Costs two small compiles and
    ~1 s of device time."""
    import jax
    import jax.numpy as jnp

    a = jax.device_put(jnp.full((4096, 4096), 0.5, jnp.bfloat16))

    def chain(n):
        def f(p):
            q = p
            for _ in range(n):
                q = (q @ p) * jnp.bfloat16(2.44140625e-4)
            return q
        return jax.jit(f)

    times = []
    for f in (chain(2), chain(32)):
        r = f(a)
        jax.block_until_ready(r)
        dt = float("inf")
        for _ in range(5):
            t0 = time.time()
            r = f(a)
            jax.block_until_ready(r)
            dt = min(dt, time.time() - t0)
        times.append(dt)
    return times[1] / max(times[0], 1e-9)


def check_timing_integrity(threshold: float = 6.0):
    """(ok, ratio); ratio is inf (trusted) on the CPU backend, where there
    is no tunnel to distrust and the probe's matmuls would take minutes.

    Threshold 6: a healthy chip shows ~10-15x for the 16x work ratio
    (dispatch floor eats the rest); regressed sessions show ~0.6-1.3, and
    one partially-degraded session was observed at 3.5 — marginal clocks
    are treated as lying."""
    import jax

    if jax.default_backend() == "cpu":
        return True, float("inf")
    ratio = timing_integrity_ratio()
    return ratio >= threshold, ratio
