"""Perfect Stereo Separation (PSS) — sub-block Costas adaptation.

The reference adapts a phase offset for the reconstructed 38 kHz carrier with
a per-sample Costas criterion whose error signal passes through a 15 kHz
fft-filter *inside* the feedback loop (src/fm/stereo-separation.cpp:60-110,
alpha = 10/fmRate, clamp ±pi/4, x10 boost until converged).  This is the one
loop in the receiver that cannot be flattened into a pure parallel transform
(SURVEY.md §7 "the hard parts").

TPU-native shape: the offset moves by at most alpha*boost*|err| ≈ 5e-4 rad
per sample, so we hold it constant over a sub-block of SUBBLOCK samples,
vectorise the mix + 295-tap lowpass + error computation inside the sub-block,
and integrate the offset once per sub-block with `lax.scan` over sub-blocks —
47 sequential steps per second of signal instead of 192 000.  The
mean-error EMA and the 3 s lock/unlock hysteresis counters keep their exact
per-sample semantics (vectorised EMA + run-length within each sub-block);
only `error_minimized` (the x10 boost gate) is frozen per sub-block.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from . import design
from .blockops import ema_apply, runlength_true

Array = jax.Array

SUBBLOCK = 4096


class PSSConfig(NamedTuple):
    kernel: np.ndarray        # [295] float32 15 kHz lowpass (PSS_FILTER_DEGREE)
    rate: int
    subblock: int


def make_pss_config(rate: int = C.FM_RATE, subblock: int = SUBBLOCK) -> PSSConfig:
    k = design.lowpass_sinc(C.PSS_FILTER_DEGREE, 15000.0, rate).astype(np.float32)
    return PSSConfig(kernel=k, rate=rate, subblock=subblock)


class PSSState(NamedTuple):
    acc: Array                # accPhaseShift (stereo-separation.cpp:82-85)
    tail: Array               # [294] complex mixed-signal filter history
    mean_error: Array
    minimized: Array          # bool: error_minimized
    lock_run: Array           # consecutive |mean_error|<thr samples
    unlock_run: Array         # consecutive not-below samples


def pss_zero_state(cfg: PSSConfig) -> PSSState:
    return PSSState(
        acc=jnp.asarray(0.0, jnp.float32),
        tail=jnp.zeros(len(cfg.kernel) - 1, jnp.complex64),
        mean_error=jnp.asarray(0.0, jnp.float32),
        minimized=jnp.asarray(False),
        lock_run=jnp.asarray(0, jnp.int32),
        unlock_run=jnp.asarray(0, jnp.int32),
    )


def pss_adapt(demod: Array, base_phase: Array, locked: Array,
              cfg: PSSConfig, state: PSSState,
              active: bool = True) -> Tuple[Array, PSSState]:
    """Adapt the PSS phase offset over one block.

    demod      : [T] demodulated MPX at fmRate
    base_phase : [T] 2*(pilot_phase + pi/4) — the uncorrected carrier phase
    locked     : [T] pilot lock flags; while unlocked the PSS is held reset
                 (fm-processor.cpp:698-701)
    Returns (per-sample offset `pilotDelayPSS` [T], new state).
    """
    if not active:
        z = jnp.zeros_like(demod)
        return z, state

    T = demod.shape[0]
    S = cfg.subblock
    assert T % S == 0
    nsub = T // S
    kernel = jnp.asarray(cfg.kernel)
    klen = kernel.shape[0]
    alpha = jnp.float32(C.PSS_ALPHA)
    lock_hold = jnp.int32(int(C.PSS_LOCK_STABLE_S * cfg.rate))

    d = demod.reshape(nsub, S)
    bp = base_phase.reshape(nsub, S)
    lk = locked.reshape(nsub, S)

    def step(st: PSSState, inp):
        d_s, bp_s, lk_s = inp
        sub_locked = lk_s[0]
        # mix with the current offset (held constant within the sub-block)
        mix_phase = bp_s - st.acc
        mixed = jax.lax.complex(jnp.cos(mix_phase), jnp.sin(mix_phase)) * d_s
        xp = jnp.concatenate([st.tail, mixed])
        filt = _conv_valid(xp, kernel)
        err = jnp.real(filt) * jnp.imag(filt)
        boost = jnp.where(st.minimized, 1.0, C.PSS_ERROR_BOOST).astype(jnp.float32)
        err = err * boost
        acc = st.acc + alpha * jnp.sum(err)
        acc = jnp.clip(acc, -C.PSS_CLAMP, C.PSS_CLAMP)
        me_track, me_last = ema_apply(err, C.PSS_LOCK_ALPHA, st.mean_error)
        below = jnp.abs(me_track) < C.PSS_LOCK_THRESHOLD
        lr, lr_last = runlength_true(below, st.lock_run)
        ur, ur_last = runlength_true(~below, st.unlock_run)
        # hysteresis (stereo-separation.cpp:88-101): latch on after 3 s below
        # threshold; latch off after 3 s above.
        minimized = jnp.where(below[-1],
                              st.minimized | (lr_last > lock_hold),
                              st.minimized & ~(ur_last > lock_hold))
        new = PSSState(acc=acc, tail=xp[-(klen - 1):], mean_error=me_last,
                       minimized=minimized, lock_run=lr_last,
                       unlock_run=ur_last)
        # pilot unlock resets the analyzer (fm-processor.cpp:698-701)
        zero = pss_zero_state_like(st)
        new = jax.tree.map(lambda a, b: jnp.where(sub_locked, a, b), new, zero)
        out_acc = jnp.where(sub_locked, st.acc, 0.0)
        return new, out_acc

    new_state, accs = jax.lax.scan(step, state, (d, bp, lk))
    offsets = jnp.repeat(accs, S)
    return offsets, new_state


def pss_zero_state_like(st: PSSState) -> PSSState:
    return PSSState(
        acc=jnp.zeros_like(st.acc),
        tail=jnp.zeros_like(st.tail),
        mean_error=jnp.zeros_like(st.mean_error),
        minimized=jnp.zeros_like(st.minimized),
        lock_run=jnp.zeros_like(st.lock_run),
        unlock_run=jnp.zeros_like(st.unlock_run),
    )


def _conv_valid(xp: Array, kernel: Array) -> Array:
    """Causal VALID conv of complex xp with real kernel."""
    from .blockops import _conv_complex
    return _conv_complex(xp, kernel, stride=1)
