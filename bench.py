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

Timing integrity
----------------
The axon tunnel runtime has shown a session-wide regression (first seen
2026-08-20/21) in which `block_until_ready` returns after a constant
~0.1 ms regardless of the work dispatched (a 2 GiB reduce and a 64 MiB
reduce "complete" in the same 80 us; a chained 4096^3 matmul reads
20 PFLOPS).  Any wall-clock number taken through it on such a session is
an artifact.  This script therefore:

1. runs a work-scaling probe (chained matmuls, 16x work ratio): if the
   measured ratio is sane, times the receive chain the normal way
   (`method: "block_until_ready"`);
2. otherwise falls back to device->host-forced slope timing: the chain is
   wrapped in a fori_loop of R repeats whose final scalar is *fetched*
   (a D2H transfer cannot complete before the work it depends on), and
   the per-repeat time is the slope between two R values, which cancels
   the constant fetch/dispatch overhead (`method: "d2h_slope"`);
3. if D2H itself is wedged (the same regression family also stalls
   transfers indefinitely on some sessions), prints the last committed
   trustworthy measurement with `"stale": true` rather than a fabricated
   fresh one (`method: "stale_last_good"`).
"""

import glob
import json
import os
import re
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def _fetch_with_timeout(arr, timeout_s, err_out=None):
    """Force completion by fetching `arr` to host; None if it wedges.
    err_out (a dict) receives 'err': 'timeout after Ns' | repr(exception)
    so failures distinguish a wedged transfer from a dead one."""
    box = {}

    def work():
        try:
            box["v"] = np.asarray(arr)
        except Exception as e:  # transfer died (e.g. UNIMPLEMENTED)
            box["e"] = repr(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if err_out is not None and "v" not in box:
        err_out["err"] = box.get("e", f"timeout after {timeout_s:.0f}s")
    return box.get("v")


def _last_good_value():
    """Newest committed BENCH_r*.json value (the last trustworthy run)."""
    best_round, val = -1, None
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("stale"):
            continue  # never chain stale onto stale
        if int(m.group(1)) > best_round and "value" in parsed:
            best_round, val = int(m.group(1)), parsed["value"]
    return val, best_round


def _emit(realtime_x, **extra):
    rec = {
        "metric": "fm_stereo_rds_realtime_x",
        "value": round(realtime_x, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime_x, 1),
    }
    rec.update(extra)
    print(json.dumps(rec))
    sys.stdout.flush()


_IQ_CACHE = {}


def _synth_capture(block_in, nblocks):
    """64 distinct blocks of synthesized stereo+RDS IQ.

    Cached twice: in-process (both wire formats share the float capture —
    only the final integer conversion differs) AND on disk under /tmp —
    the ~100M-sample host synth takes minutes, and the probe_pounce loop
    runs bench.py as a FRESH subprocess per attempt (each would re-pay
    the synth; the capture is deterministic, so the .npy is too)."""
    from sdrjfm_tpu import constants as C
    from sdrjfm_tpu.io import synth

    key = (block_in, nblocks)
    if key not in _IQ_CACHE:
        disk = f"/tmp/sdrjfm_bench_capture_{block_in}_{nblocks}_v1.npy"
        try:
            _IQ_CACHE[key] = np.load(disk)
            return _IQ_CACHE[key]
        except (OSError, ValueError):
            pass
        n_fm = block_in // 12 * nblocks
        t = np.arange(n_fm) / C.FM_RATE
        left = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
        right = 0.6 * np.sin(2 * np.pi * 440.0 * t)
        rng = np.random.default_rng(0)
        bits = (rng.random(30000) > 0.5).astype(np.int8)
        mpx = synth.synth_mpx(left, right, synth.MPXParams(), rds_bits=bits)
        _IQ_CACHE[key] = synth.fm_modulate(mpx, C.FM_RATE)[: block_in
                                                           * nblocks]
        try:
            np.save(disk + ".tmp.npy", _IQ_CACHE[key])
            os.replace(disk + ".tmp.npy", disk)
        except OSError:
            pass
    return _IQ_CACHE[key]


def _make_inputs(fmt, nblocks=64):
    """(receiver, state, controls, device blocks) for a wire format."""
    import jax
    import jax.numpy as jnp
    from sdrjfm_tpu.io import synth
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig

    cfg = ReceiverConfig(block_fm=131072, rds="block", audio_filter_hz=15000,
                         iq_format=fmt)
    rx = Receiver(cfg)
    controls = rx.initial_controls()
    state = rx.init_state()

    # realistic input: distinct blocks of synthesized stereo+RDS signal
    # (distinct data so no aliasing/hoisting can flatter the number);
    # always synthesize the full 64-block capture so a later smaller
    # request (the slope fallback's 8-block footprint) hits the cache
    iq_np = _synth_capture(cfg.block_in, 64)[: cfg.block_in * nblocks]
    wire = synth.iq_to_i16(iq_np) if fmt == "i16" else synth.iq_to_u8(iq_np)
    blocks = jax.device_put(jnp.asarray(wire)
                            .reshape(nblocks, cfg.block_in, 2))
    return rx, state, controls, blocks, nblocks


def main():
    import jax
    import jax.numpy as jnp
    from sdrjfm_tpu import constants as C

    # i16 wire format: the capture-faithful input (the reference's file
    # source is 16-bit PCM wav, filehulp.cpp:61-63, and its handlers convert
    # u8/i16 to float on the host CPU in getSamples; here the conversion is
    # fused on-device).  Halves the input-read HBM traffic — the chain's
    # throughput ceiling.  The u8 variant (rtl_sdr raw captures,
    # rtlsdr-handler.cpp:285-294) halves it again; per-dispatch data said
    # u8 is worth ~20-25% at the roofline (tools/bench_variants.py:
    # c64 38.8kx / i16 46.7kx / u8 57.6kx), so u8 is also measured and
    # published as a secondary record in the same JSON line.
    rx, state, controls, blocks, nblocks = _make_inputs("i16")

    from sdrjfm_tpu.runtime.timing_integrity import check_timing_integrity
    ok, ratio = check_timing_integrity()
    if ok:
        return _bench_normal(jax, C, rx, state, controls, blocks,
                             nblocks, ratio)
    return _bench_forced(jax, jnp, C, rx, state, controls, blocks,
                         nblocks, ratio)


def _time_chain(jax, rx, state, controls, blocks, nblocks):
    """Best-of-20 wall time of the one-dispatch 64-block scan."""
    import time as _time

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
        t0 = _time.time()
        st, outs = run(st, controls, blocks)
        jax.block_until_ready(outs.audio)
        dt = min(dt, _time.time() - t0)
    return dt, st


def _bench_normal(jax, C, rx, state, controls, blocks, nblocks, ratio):
    """Healthy runtime: time i16 (headline) and u8 wire formats."""
    dt, st = _time_chain(jax, rx, state, controls, blocks, nblocks)
    sps = nblocks * rx.cfg.block_in / dt
    extra = {}
    # u8 wire format (rtl_sdr raw captures): half the input-read bytes of
    # i16 — the chain's roofline axis
    try:
        rx8, st8, ctl8, blocks8, _ = _make_inputs("u8")
        dt8, _ = _time_chain(jax, rx8, st8, ctl8, blocks8, nblocks)
        extra["u8_x_realtime"] = round(
            nblocks * rx8.cfg.block_in / dt8 / C.INPUT_RATE, 1)
    except Exception as e:  # u8 must never sink the headline record
        extra["u8_error"] = repr(e)
    if ratio != float("inf"):
        # the regression is a per-session lottery: re-probe AFTER the
        # measurement so a clock that degraded mid-run cannot publish
        from sdrjfm_tpu.runtime.timing_integrity import \
            check_timing_integrity
        ok2, ratio2 = check_timing_integrity()
        if not ok2:
            import jax.numpy as jnp
            return _bench_forced(jax, jnp, C, rx, st, controls, blocks,
                                 nblocks, ratio2)
        extra["integrity_ratio"] = round(ratio, 2)
        extra["integrity_ratio_post"] = round(ratio2, 2)
    _emit(sps / C.INPUT_RATE, method="block_until_ready", **extra)
    return 0


def _bench_forced(jax, jnp, C, rx, state, controls, blocks, nblocks, ratio):
    """Broken completion signaling: D2H-forced slope timing, else stale.

    The whole attempt runs in a daemon thread under a global watchdog: on
    a regressed session the remote compile or any fetch can stall for tens
    of minutes, and an externally-killed bench prints NO record at all —
    worse than an honestly-flagged stale one.
    """

    def stale(why):
        val, rnd = _last_good_value()
        if val is None:
            _emit(0.0, stale=True, timing_integrity="FAILED", reason=why)
        else:
            _emit(val, stale=True, timing_integrity="FAILED",
                  stale_source=f"BENCH_r{rnd:02d}.json", reason=why)
        # a wedged D2H thread can hang interpreter teardown
        os._exit(0)

    why = (f"runtime completion-signaling regression: 16x device work "
           f"changed block_until_ready wall time only {ratio:.2f}x "
           f"(see bench.py docstring)")

    # cheap D2H health probe BEFORE paying the big fallback compile: on
    # sessions where transfers are wedged the first 4-byte fetch already
    # stalls, and 10 minutes of watchdog budget buys nothing (r3: the
    # forced path never concluded on a regressed session)
    probe = jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))
    pv = _fetch_with_timeout(probe, float(os.environ.get(
        "BENCH_D2H_PROBE_S", "60")))
    if pv is None:
        stale(why + "; D2H probe (4-byte fetch) wedged — transfers are "
                    "down session-wide, skipping the slope fallback")

    # slope footprint (r5): u8 wire halves the input upload vs i16
    # (201 MB as a jit ARGUMENT — H2D data transfer, which the remote
    # endpoint handles fine; the HTTP-413 limit only applied to arrays
    # embedded in the PROGRAM as closure constants).  The full 64-block
    # scan stays per dispatch so the per-repeat cost is compute-dominated,
    # matching the normal path's dispatch+compute semantics.
    try:
        rx, state, controls, blocks, nblocks = _make_inputs("u8",
                                                            nblocks=64)
    except Exception:
        pass  # fall back to the 64-block i16 inputs already built

    box = {}
    worker = threading.Thread(
        target=_forced_attempt,
        args=(box, jax, jnp, C, rx, state, controls, blocks, nblocks,
              ratio, why),
        daemon=True)
    worker.start()
    # 1500 s default: a healthy-D2H-but-broken-clock session was observed
    # (2026-08-21) to need >600 s just to compile the slope program over
    # the remote tunnel AND ~100 s per scalar fetch, so the r3/r4 900 s
    # budget left the two slope fetches ~140 s between them; but the
    # budget must stay well under any external driver timeout (the pounce
    # allows 2400 s total) — an externally killed bench prints NO record
    # at all, the worst outcome
    worker.join(float(os.environ.get("BENCH_FORCED_BUDGET_S", "1500")))
    if "emit" in box:
        _emit(*box["emit"][0], **box["emit"][1])
        os._exit(0)
    stale(box.get("why", why + "; D2H-forced attempt exceeded its global "
                              "watchdog (compile or fetch stalled)"))


def _forced_attempt(box, jax, jnp, C, rx, state, controls, blocks, nblocks,
                    ratio, why):

    # Lessons encoded here (one per round):
    # - `blocks`/`controls` MUST be jit ARGUMENTS, not closure captures: a
    #   closed-over array is embedded in the program as a CONSTANT and the
    #   402 MB input made the remote-compile endpoint reject the upload
    #   (HTTP 413 — diagnosed 2026-08-21, r4).
    # - the repeat loop MUST NOT be one giant device program: the r4
    #   fori_loop(4608 x 8-block-scan) slope program CRASHED the TPU
    #   worker on degraded sessions ("TPU worker process crashed or
    #   restarted", PROBE_POUNCE_r05 attempt 6).  Instead the ONE small
    #   8-block program is dispatched R times from Python with the state
    #   threading through — each result depends on the previous, so the
    #   single final scalar fetch forces the whole chain.  Per-dispatch
    #   overhead is part of the honest per-call cost (the normal
    #   block_until_ready path times exactly the same dispatch+compute),
    #   and the slope between two R values still cancels the constant
    #   fetch cost.
    @jax.jit
    def chain_once(state, acc, controls, blocks):
        def body(s, blk):
            s, out = rx.step(s, controls, blk)
            # cheap data dependency on every output so nothing in the
            # chain is dead-code-eliminated
            return s, jnp.sum(out.audio)

        st, sums = jax.lax.scan(body, state, blocks)
        return st, acc + jnp.sum(sums) * jnp.float32(1e-6)

    def run_repeat(state, controls, blocks, R):
        st, acc = state, jnp.float32(0.0)
        for _ in range(int(R)):
            st, acc = chain_once(st, acc, controls, blocks)
        return acc

    deadline = time.time() + float(
        os.environ.get("BENCH_FORCED_BUDGET_S", "1500")) - 60.0

    # warmup: compile + the first-D2H lottery (on regressed sessions the
    # first transfer has been observed to take 100 s or never return);
    # generous budget — the remote compile alone can exceed 10 min
    werr = {}
    v = _fetch_with_timeout(run_repeat(state, controls, blocks,
                                       jnp.int32(2)), 700.0, werr)
    if v is None or not np.isfinite(float(v)):
        box["why"] = (why + "; D2H-forced fallback also unavailable "
                            f"(warmup fetch: {werr.get('err', 'non-finite')})")
        return

    terr = {}

    def timed(R, window=330.0):
        # single measurement per R: on half-healthy sessions a scalar
        # fetch alone can take ~100 s (attempt logs, PROBE_POUNCE_r05),
        # and the slope subtracts the constant fetch overhead anyway —
        # two tries at a tight timeout just burned the deadline
        if time.time() > deadline:
            terr["err"] = "deadline exceeded before fetch"
            return None
        t0 = time.time()
        r = _fetch_with_timeout(run_repeat(state, controls, blocks,
                                           jnp.int32(R)),
                                min(window, max(60.0, deadline - t0)),
                                terr)
        if r is None:
            return None
        return time.time() - t0

    # ADAPTIVE repeat counts (r5): on half-healthy sessions the transfer
    # pathology can degrade per-dispatch enqueue from ~150 us to ~0.5-1 s
    # (CLAUDE.md axon notes; attempt 8 timed out enqueueing a fixed
    # R_LO=512).  A coarse 4->32 slope estimates the per-repeat cost,
    # then the confirmation slope is sized to ~60-90 s of extra work.
    dt_c1 = timed(4)
    dt_c2 = timed(32) if dt_c1 is not None else None
    if dt_c1 is None or dt_c2 is None or dt_c2 <= dt_c1:
        box["why"] = (why + "; D2H-forced coarse slope failed "
                            f"(dt_4={dt_c1}, dt_32={dt_c2}, "
                            f"fetch_err={terr.get('err')})")
        return
    r_est = (dt_c2 - dt_c1) / 28.0
    dR = int(max(32, min(4096, 75.0 / max(r_est, 1e-5))))
    R_LO, R_HI = 32, 32 + dR
    # fetch windows sized from the coarse estimate: on pathological
    # sessions the per-dispatch cost GROWS during the measurement
    # (attempt 10: dt_hi overran a window the estimate predicted to be
    # ~170 s), so allow 3x the prediction plus slack
    w_lo = 3.0 * (dt_c2 + R_LO * r_est) + 60.0
    w_hi = 3.0 * (dt_c2 + (R_LO + dR) * r_est) + 60.0

    dt_lo = timed(R_LO, w_lo)
    dt_hi = timed(R_HI, w_hi) if dt_lo is not None else None
    if dt_lo is None or dt_hi is None or dt_hi <= dt_lo:
        box["why"] = (why + "; D2H-forced slope timing failed "
                            f"(dt_lo={dt_lo}, dt_hi={dt_hi}, dR={dR}, "
                            f"fetch_err={terr.get('err')})")
        return
    t_rep = (dt_hi - dt_lo) / (R_HI - R_LO)
    sps = nblocks * rx.cfg.block_in / t_rep
    x = sps / C.INPUT_RATE
    extra = dict(
        method="d2h_slope",
        integrity_ratio=round(ratio, 2),
        slope_blocks=nblocks,
        slope_wire=rx.cfg.iq_format,
        t_per_dispatch_s=round(t_rep, 4),
        note="completion-signaling regression active; slope of "
             f"R={R_LO}->{R_HI} chained repeats, completion forced by a "
             "scalar fetch that data-depends on every repeat")
    # honesty annotation: when the per-dispatch time is in the ~0.1-1 s
    # range the session's TRANSFER pathology (CLAUDE.md axon notes), not
    # the chain, is being measured — say so in the record rather than
    # letting a pathological session masquerade as the chain's capability
    last, rnd = _last_good_value()
    if last is not None and x < 0.1 * last and t_rep > 0.01:
        extra["session_degraded"] = (
            f"per-dispatch {t_rep:.2f} s is transfer-pathology territory "
            f"(healthy sessions dispatch this program in ~170 us, "
            f"BENCH_r{rnd:02d} measured {last}x) — this record reflects "
            "THIS session's dispatch health, not compute capability")
        # decomposition probe: r5 sessions measured a rock-stable
        # 1.764 s/dispatch, which smells like FIXED per-RPC overhead.
        # One dispatch of a 16x-longer scan (input tiled ON DEVICE — no
        # extra upload) separates the hypotheses: if it also takes
        # ~1.76 s the overhead is fixed and compute is healthy
        # (amortized_x ~ 16x the apparent number and rising); if it
        # takes ~16x longer the session's compute path itself is slow.
        TILE = 16

        @jax.jit
        def chain_tiled(state, controls, blocks):
            big = jnp.tile(blocks, (TILE, 1, 1))

            def body(s, blk):
                s, out = rx.step(s, controls, blk)
                return s, jnp.sum(out.audio)

            st, sums = jax.lax.scan(body, state, big)
            return jnp.sum(sums) * jnp.float32(1e-6)

        if time.time() < deadline - 60:
            t0 = time.time()
            v = _fetch_with_timeout(
                chain_tiled(state, controls, blocks),
                min(max(60.0, 3 * TILE * t_rep), deadline - time.time()))
            if v is not None and np.isfinite(float(v)):
                # second call: the first paid the tiled-program compile
                t0 = time.time()
                v = _fetch_with_timeout(
                    chain_tiled(state, controls, blocks),
                    min(max(60.0, 3 * TILE * t_rep),
                        max(60.0, deadline - time.time())))
                if v is not None:
                    dt_big = time.time() - t0
                    extra["tiled_probe"] = dict(
                        tiles=TILE, dt_s=round(dt_big, 3),
                        x_realtime=round(TILE * nblocks * rx.cfg.block_in
                                         / dt_big / C.INPUT_RATE, 1),
                        verdict=("fixed-overhead (compute healthy)"
                                 if dt_big < 3 * t_rep else
                                 "work-proportional (compute degraded)"))
    box["emit"] = ((x,), extra)


if __name__ == "__main__":
    sys.exit(main())
