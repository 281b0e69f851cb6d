"""Noise and level squelch (src/various/squelchClass.cpp re-designed in blocks).

Noise squelch: compare decaying-average band energies of a Chebyshev highpass
above key-100 Hz vs lowpass below key (key = 70 kHz at fmRate,
fm-processor.cpp:87); decisions latch with hysteresis every holdPeriod
(= fmRate/20) samples (squelchClass.cpp:9-78).  Level squelch gates on the
demodulator's tracked carrier amplitude against 10^((n-80)/30)
(squelchClass.cpp:94-104).

Block shape: the IIR band filters and the decaying averages are parallel
scans; the 20 Hz decision lattice is a tiny `lax.scan` over hold periods.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from . import design
from .blockops import IIRSpec, ema_apply, iir_apply

Array = jax.Array

HYSTERESIS_NSQ = 0.001


class SquelchConfig(NamedTuple):
    hp: IIRSpec
    lp: IIRSpec
    hold_period: int
    rate: int


def make_squelch_config(rate: int = C.FM_RATE, key_freq: int = 70000,
                        order: int = 20,
                        hold_period: int = 8192) -> SquelchConfig:
    """Order-20 Chebyshev pair as the reference constructs (squelchClass.cpp:
    36-46); cheby1 with 1 dB ripple mirrors its S_CHEBYSHEV design.  The
    reference decides every fmRate/20 = 9600 samples; we use 8192 (23 Hz vs
    20 Hz decision cadence) so hold periods tile power-of-two blocks."""
    hp = IIRSpec(design.cheby1_sos(order // 2, key_freq - 100, rate, "highpass"))
    lp = IIRSpec(design.cheby1_sos(order // 2, min(key_freq, int(0.49 * rate)),
                                   rate, "lowpass"))
    return SquelchConfig(hp=hp, lp=lp, hold_period=hold_period, rate=rate)


class SquelchState(NamedTuple):
    hp_state: tuple
    lp_state: tuple
    avg_high: Array
    avg_low: Array
    suppress: Array           # latched decision
    phase: Array              # samples into the current hold period


def squelch_zero_state(cfg: SquelchConfig) -> SquelchState:
    return SquelchState(
        hp_state=cfg.hp.zero_state(), lp_state=cfg.lp.zero_state(),
        avg_high=jnp.asarray(0.0, jnp.float32),
        avg_low=jnp.asarray(0.0, jnp.float32),
        suppress=jnp.asarray(False), phase=jnp.asarray(0, jnp.int32))


def noise_squelch(x: Array, level: Array, cfg: SquelchConfig,
                  state: SquelchState,
                  shard_axis=None) -> Tuple[Array, SquelchState]:
    """Apply noise squelch to a demod block.

    level : traced scalar 0..100 (slider); threshold = 1 - level/100.
    Decision timing uses a fixed per-block lattice (hold periods aligned to
    the block, T % hold == 0) — equivalent cadence to the reference's free-
    running counter.

    With `shard_axis` (inside shard_map over a time mesh) the band filters
    and decaying averages run on the device-local slice via the distributed
    recurrence decomposition; the tiny 23 Hz decision scan runs replicated
    on the all-gathered period-end averages, and each device slices its
    hold-period gates.  Requires T_local % hold_period == 0.
    """
    T = x.shape[0]
    H = cfg.hold_period
    assert T % H == 0, (T, H)
    nper = T // H
    thr = 1.0 - jnp.asarray(level, jnp.float32) / 100.0

    w = 1.0 / (cfg.rate / 100.0)        # decayingAverage weight
    if shard_axis is None:
        v1, hp_state = iir_apply(x, cfg.hp, state.hp_state)
        v2, lp_state = iir_apply(x, cfg.lp, state.lp_state)
        ah, ah_last = ema_apply(jnp.abs(v1), w, state.avg_high)
        al, al_last = ema_apply(jnp.abs(v2), w, state.avg_low)
    else:
        from ..parallel import distributed as DD
        v1, hp_state = DD.dist_iir(x, cfg.hp, state.hp_state, shard_axis)
        v2, lp_state = DD.dist_iir(x, cfg.lp, state.lp_state, shard_axis)
        ah, ah_last = DD.dist_ema(jnp.abs(v1), w, state.avg_high, shard_axis)
        al, al_last = DD.dist_ema(jnp.abs(v2), w, state.avg_low, shard_axis)

    # decision at the end of each hold period
    ah_p = ah.reshape(nper, H)[:, -1]
    al_p = al.reshape(nper, H)[:, -1]
    if shard_axis is not None:
        # one packed gather for both band averages (collective budget)
        g = jax.lax.all_gather(jnp.stack([ah_p, al_p]), shard_axis,
                               axis=1, tiled=True)
        ah_p, al_p = g[0], g[1]

    def decide(sup, inp):
        a_h, a_l = inp
        open_ = a_h < a_l * thr - HYSTERESIS_NSQ
        close = a_h >= a_l * thr + HYSTERESIS_NSQ
        sup = jnp.where(thr < HYSTERESIS_NSQ, True,
                        jnp.where(open_, False, jnp.where(close, True, sup)))
        return sup, sup

    sup_last, sup_seq = jax.lax.scan(decide, state.suppress, (ah_p, al_p))
    if shard_axis is not None:
        idx = jax.lax.axis_index(shard_axis)
        sup_seq = jax.lax.dynamic_slice(sup_seq, (idx * nper,), (nper,))
    gate = jnp.repeat(~sup_seq, H).astype(x.dtype)
    new = SquelchState(hp_state=hp_state, lp_state=lp_state, avg_high=ah_last,
                       avg_low=al_last, suppress=sup_last, phase=state.phase)
    return x * gate, new


def host_demod_profile(iq: np.ndarray, iq_format: str = "c64",
                       lo_freq_hz: int = 0,
                       input_rate: int = C.INPUT_RATE) -> np.ndarray:
    """Cheap host-side (numpy/scipy) FM demod of one input block, for
    profiling only (auto_squelch_level) — avoids compiling a second
    receiver configuration just to tap demod.

    Convert -> LO mix -> decimate ÷12 -> quadrature discriminator.  Not the
    production chain (plain scipy decimator, no DC servo); band-energy
    RATIOS at fmRate are what the profile needs, and those are insensitive
    to the kernel details.
    """
    from scipy import signal
    if iq_format == "i16":
        x = (iq[:, 0].astype(np.float32)
             + 1j * iq[:, 1].astype(np.float32)) / 32768.0
    elif iq_format == "u8":
        x = ((iq[:, 0].astype(np.float32) - 127.0)
             + 1j * (iq[:, 1].astype(np.float32) - 127.0)) / 128.0
    else:
        x = np.asarray(iq, np.complex64)
    if lo_freq_hz:
        n = np.arange(len(x), dtype=np.float64)
        x = x * np.exp(-2j * np.pi * lo_freq_hz / input_rate * n)
    k = design.lowpass_sinc(127, 110000.0, input_rate)
    v = signal.lfilter(k, [1.0], x)[11::12]
    d = np.angle(v[1:] * np.conj(v[:-1]))
    return d.astype(np.float32)


def auto_squelch_level(demod: np.ndarray, rate: int = C.FM_RATE,
                       key_freq: int = 70000, margin: float = 0.5) -> float:
    """Pick a noise-squelch slider level from a measured demod segment.

    Host-side profile (beyond the reference, whose slider is manual): run the
    same Chebyshev high/low band pair over the segment, read the band-energy
    ratio r = avg_high/avg_low at the end, and place the open/close threshold
    a `margin` of the way from r (signal present) toward 1.0 (pure noise):

        thr   = r + margin*(1 - r)
        level = 100*(1 - thr)            (thr = 1 - level/100 in noise_squelch)

    On a clean station r is small -> level ~ margin*100; when the carrier
    drops, r rises toward 1 > thr and the squelch closes.
    """
    from scipy import signal
    x = np.asarray(demod, np.float32)
    hp = design.cheby1_sos(10, key_freq - 100, rate, "highpass")
    lp = design.cheby1_sos(10, min(key_freq, int(0.49 * rate)), rate,
                           "lowpass")
    v1 = np.abs(signal.sosfilt(hp, x))
    v2 = np.abs(signal.sosfilt(lp, x))
    w = 1.0 / (rate / 100.0)
    b, a = [w], [1.0, -(1.0 - w)]
    ah = signal.lfilter(b, a, v1)[-1]
    al = signal.lfilter(b, a, v2)[-1]
    r = float(ah / max(al, 1e-12))
    thr = min(1.0, r + margin * (1.0 - r))
    return float(np.clip(100.0 * (1.0 - thr), 0.0, 100.0))


def level_squelch(x: Array, carrier: Array, level: Array, cfg: SquelchConfig,
                  state: SquelchState,
                  shard_axis=None) -> Tuple[Array, SquelchState]:
    """Level squelch on the tracked carrier amplitude [T]."""
    T = x.shape[0]
    H = cfg.hold_period
    assert T % H == 0, (T, H)
    nper = T // H
    thr = jnp.power(10.0, (jnp.asarray(level, jnp.float32) - 80.0) / 30.0)
    c_p = carrier.reshape(nper, H)[:, -1]
    if shard_axis is not None:
        c_p = jax.lax.all_gather(c_p, shard_axis, tiled=True)

    def decide(sup, c):
        sup = jnp.where(c < thr, True, jnp.where(c >= thr, False, sup))
        return sup, sup

    sup_last, sup_seq = jax.lax.scan(decide, state.suppress, c_p)
    if shard_axis is not None:
        idx = jax.lax.axis_index(shard_axis)
        sup_seq = jax.lax.dynamic_slice(sup_seq, (idx * nper,), (nper,))
    gate = jnp.repeat(~sup_seq, H).astype(x.dtype)
    new = state._replace(suppress=sup_last)
    return x * gate, new
