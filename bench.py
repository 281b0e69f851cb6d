#!/usr/bin/env python
"""Headline benchmark: full stereo+RDS FM demod throughput per chip.

Prints ONE JSON line:
  {"metric": "fm_stereo_rds_realtime_x", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

The metric is how many times faster than real time (2.304 MS/s complex IQ in,
48 kHz stereo audio + RDS bits out) a single chip runs the complete receive
chain.  vs_baseline is against the reference receiver's implicit performance
bar of 1.0x real time on a desktop CPU core (BASELINE.md — the reference
publishes no other numbers); the BASELINE.json north-star target is >=100x.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from sdrjfm_tpu import constants as C
    from sdrjfm_tpu.io import synth
    from sdrjfm_tpu.models.receiver import (Receiver, ReceiverConfig,
                                            default_controls)

    # i16 wire format: the capture-faithful input (the reference's file
    # source is 16-bit PCM wav, filehulp.cpp:61-63, and its handlers convert
    # u8/i16 to float on the host CPU in getSamples; here the conversion is
    # fused on-device).  Halves the input-read HBM traffic — the chain's
    # throughput ceiling (tools/bench_variants.py: c64 38.8kx / i16 46.7kx /
    # u8 57.6kx).
    cfg = ReceiverConfig(block_fm=131072, rds="block", audio_filter_hz=15000,
                         iq_format="i16")
    rx = Receiver(cfg)
    step = rx.jit_step()
    controls = default_controls()
    state = rx.init_state()

    # realistic input: 64 distinct blocks of synthesized stereo+RDS signal
    # (distinct data so no aliasing/hoisting can flatter the number)
    nblocks = 64
    n_fm = cfg.block_fm * nblocks
    t = np.arange(n_fm) / C.FM_RATE
    left = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    right = 0.6 * np.sin(2 * np.pi * 440.0 * t)
    rng = np.random.default_rng(0)
    bits = (rng.random(30000) > 0.5).astype(np.int8)
    mpx = synth.synth_mpx(left, right, synth.MPXParams(), rds_bits=bits)
    iq_np = synth.fm_modulate(mpx, C.FM_RATE)[: cfg.block_in * nblocks]
    i16 = synth.iq_to_i16(iq_np)
    blocks = jax.device_put(jnp.asarray(i16)
                            .reshape(nblocks, cfg.block_in, 2))

    # timed: scan-driven run — the whole multi-block pipeline is ONE
    # dispatched program that keeps and returns every output (audio, RDS
    # bits, metadata), device-resident input (a production ingest path
    # stages IQ into HBM asynchronously, so bench isolates compute)
    @jax.jit
    def run(state, controls, blocks):
        def body(st, blk):
            st, out = rx.step(st, controls, blk)
            return st, out
        return jax.lax.scan(body, state, blocks)

    st, outs = run(state, controls, blocks)
    jax.block_until_ready(outs.audio)
    # best of 20 after 2 extra warmups: the remote-tunnel scheduler adds
    # multi-ms hiccups that dwarf the sub-ms compute (observed 2-3x run-to-
    # run spread with best-of-3); the minimum is the honest compute+dispatch
    # time, every excess is queueing noise
    for _ in range(2):
        st2, outs = run(st, controls, blocks)
        jax.block_until_ready(outs.audio)
    dt = float("inf")
    for _ in range(20):
        t0 = time.time()
        st, outs = run(st, controls, blocks)
        jax.block_until_ready(outs.audio)
        dt = min(dt, time.time() - t0)
    sps = nblocks * cfg.block_in / dt
    realtime_x = sps / C.INPUT_RATE

    print(json.dumps({
        "metric": "fm_stereo_rds_realtime_x",
        "value": round(realtime_x, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_x, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
