#!/usr/bin/env python
"""Throughput of bench.py's pipeline across wire formats and block sizes.

One JSON line per variant (same scan-over-blocks shape as bench.py).
Run on the TPU; each variant costs a compile over the axon tunnel.
"""

import json
import sys
import time

import numpy as np


def run_variant(iq_np, block_fm, iq_format, nblocks):
    import jax
    import jax.numpy as jnp
    from sdrjfm_tpu import constants as C
    from sdrjfm_tpu.models.receiver import (Receiver, ReceiverConfig,
                                            default_controls)

    cfg = ReceiverConfig(block_fm=block_fm, rds="block",
                         audio_filter_hz=15000, iq_format=iq_format)
    rx = Receiver(cfg)
    controls = default_controls()
    state = rx.init_state()
    T = cfg.block_in
    if iq_format == "c64":
        blocks = jnp.asarray(iq_np[: nblocks * T], jnp.complex64
                             ).reshape(nblocks, T)
    else:
        from sdrjfm_tpu.io import synth as _synth
        arr = {"i16": _synth.iq_to_i16, "u8": _synth.iq_to_u8,
               "i8": _synth.iq_to_i8}[iq_format](iq_np)
        blocks = jnp.asarray(arr[: nblocks * T]).reshape(nblocks, T, 2)
    blocks = jax.device_put(blocks)

    @jax.jit
    def run(state, controls, blocks):
        def body(st, blk):
            st, out = rx.step(st, controls, blk)
            return st, out
        return jax.lax.scan(body, state, blocks)

    st, outs = run(state, controls, blocks)
    jax.block_until_ready(outs.audio)
    # 64-block scans + best-of-10: the ~150 us per-dispatch tunnel overhead
    # dominated the old 16-block numbers (see CLAUDE.md perf notes)
    dt = float("inf")
    for _ in range(10):
        t0 = time.time()
        st, outs = run(st, controls, blocks)
        jax.block_until_ready(outs.audio)
        dt = min(dt, time.time() - t0)
    sps = nblocks * T / dt
    return {"iq_format": iq_format, "block_fm": block_fm,
            "x_realtime": round(sps / C.INPUT_RATE, 1),
            "ms_per_block": round(dt / nblocks * 1e3, 4)}


def main():
    from sdrjfm_tpu import constants as C
    from sdrjfm_tpu.io import synth
    from sdrjfm_tpu.runtime.timing_integrity import check_timing_integrity

    ok, ratio = check_timing_integrity()
    if not ok:
        print(json.dumps({"error": "timing integrity probe failed",
                          "integrity_ratio": round(ratio, 2),
                          "see": "TIMING_INTEGRITY_r03.md"}))
        return 1

    total_fm = 64 * 131072
    t = np.arange(total_fm) / C.FM_RATE
    rng = np.random.default_rng(0)
    bits = (rng.random(30000) > 0.5).astype(np.int8)
    mpx = synth.synth_mpx(0.6 * np.sin(2 * np.pi * 1000.0 * t),
                          0.6 * np.sin(2 * np.pi * 440.0 * t),
                          synth.MPXParams(), rds_bits=bits)
    iq_np = synth.fm_modulate(mpx, C.FM_RATE)

    for fmt, blk, nb in (("c64", 131072, 64), ("i16", 131072, 64),
                         ("u8", 131072, 64), ("i8", 131072, 64),
                         ("i16", 262144, 32)):
        print(json.dumps(run_variant(iq_np, blk, fmt, nb)), flush=True)


if __name__ == "__main__":
    import sys as _sys
    _sys.exit(main())
