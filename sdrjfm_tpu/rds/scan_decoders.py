"""Per-sample RDS bit decoders — reference-parity compatibility modes.

`lax.scan` re-implementations of the three reference decoders' semantics:

  decoder-1 (cuteSDR, src/rds/rds-decoder-1.cpp): shared Costas ->
      21-tap lowpass -> bi-phase matched filter -> squared signal through a
      Butterworth bandpass at the 1187.5 Hz bit clock -> sample at the
      clock sine's peak (negative-going slope) -> differential decode.
  decoder-2 (tomneda/FMStack, rds-decoder-2.cpp): complex RRC matched filter
      -> AGC -> Mueller&Muller timing recovery on rail decisions -> own
      Costas -> BPSK slice -> differential decode.
  decoder-3 (Feilen/FMStack, rds-decoder-3.cpp): 21-tap lowpass -> explicit
      bit-clock phase search by half-cycle correlation -> integrate-and-dump
      on the clock's rising edge -> differential decode.

These are sequential (24 kS/s scans) and exist for parity/validation; the
fast path is rds/bitrecovery.py.  Each returns a fixed-capacity bit block
(mask-valid) so they can slot into the receiver interchangeably.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops import design
from ..ops.blockops import IIRSpec

SPS = C.RDS_RATE / C.RDS_BITCLK_HZ            # ~20.21 samples/bit


def _capacity(T: int) -> int:
    return int(np.ceil(T / SPS)) + 2


# --------------------------------------------------------------------------
# shared Costas preprocessing (rds-decoder.cpp:79-82: alpha=1/16,
# beta=0.02/16, freq limit 10 Hz, then *4 scaling)
# --------------------------------------------------------------------------


class CostasState(NamedTuple):
    freq: jax.Array
    phase: jax.Array


def costas_zero_state() -> CostasState:
    return CostasState(jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(0.0, jnp.float32))


def _costas_step(st: CostasState, z, alpha, beta, limit):
    r = z * jax.lax.complex(jnp.cos(st.phase), -jnp.sin(st.phase))
    err = jnp.real(r) * jnp.imag(r)
    freq = st.freq + beta * err
    freq = jnp.where(jnp.abs(freq) > limit, 0.0, freq)
    phase = st.phase + freq + alpha * err
    phase = phase - 2 * jnp.pi * jnp.round(phase / (2 * jnp.pi))
    return CostasState(freq, phase), r


# --------------------------------------------------------------------------
# decoder 1
# --------------------------------------------------------------------------


class Decoder1Config(NamedTuple):
    lp21: np.ndarray          # 21-tap RDS_WIDTH lowpass
    match: np.ndarray         # bi-phase matched kernel
    sharp: IIRSpec            # bit-clock bandpass


def make_decoder1_config(rate: int = C.RDS_RATE) -> Decoder1Config:
    lp = design.lowpass_sinc(21, C.RDS_WIDTH, rate).astype(np.float32)
    match = design.biphase_matched_kernel(rate).astype(np.float32)
    sharp = IIRSpec(design.bandpass_butter_sos(
        4, C.RDS_BITCLK_HZ - 6.0, C.RDS_BITCLK_HZ + 6.0, rate))
    return Decoder1Config(lp, match, sharp)


class Decoder1State(NamedTuple):
    costas: CostasState
    lp_buf: jax.Array         # [20]
    match_buf: jax.Array      # [len(match)-1]
    sharp_w: jax.Array        # complex pole states
    sharp_fir: jax.Array
    last_sync: jax.Array
    last_sync_slope: jax.Array
    last_data: jax.Array
    prev_bit: jax.Array


def decoder1_zero_state(cfg: Decoder1Config) -> Decoder1State:
    f = jnp.float32
    wz, fz = cfg.sharp.zero_state()
    return Decoder1State(
        costas_zero_state(),
        jnp.zeros(len(cfg.lp21) - 1, f), jnp.zeros(len(cfg.match) - 1, f),
        wz, fz,
        jnp.asarray(0, f), jnp.asarray(0, f), jnp.asarray(0, f),
        jnp.asarray(False))


def decoder1_block(z: jax.Array, cfg: Decoder1Config, state: Decoder1State):
    """Returns (bits i8 [T], emit-mask [T], iq c64 [T], new state).

    `iq` is the shared-Costas output x4 at every 24 kHz sample — the
    reference writes `*m = costas(v) * 4` on EVERY doDecode call in mode
    1/3 (rds-decoder.cpp:79-82), so both the per-bit constellation point
    (gathered at emit positions) and the RDS_DEMOD scope stream come from
    this one stream."""
    lp = jnp.asarray(cfg.lp21)
    mk = jnp.asarray(cfg.match)
    num = jnp.asarray(cfg.sharp.num)
    poles = jnp.asarray(cfg.sharp.poles)
    residues = jnp.asarray(cfg.sharp.residues)
    alpha, beta = 1.0 / 16.0, 0.02 / 16.0
    limit = 2 * jnp.pi * 10.0 / C.RDS_RATE

    def step(st: Decoder1State, zi):
        cst, r = _costas_step(st.costas, zi, alpha, beta, limit)
        v = jnp.real(r) * 4.0
        lbuf = jnp.concatenate([st.lp_buf, v[None]])
        v1 = jnp.sum(lbuf * lp[::-1])
        mbuf = jnp.concatenate([st.match_buf, v1[None]])
        v2 = jnp.sum(mbuf * mk[::-1])
        # bit-clock bandpass of v2^2 via pole/residue one-pole updates
        x2 = v2 * v2
        fbuf = jnp.concatenate([st.sharp_fir, x2[None]])
        xb = jnp.sum(fbuf * num[::-1])
        w = poles * st.sharp_w + xb
        mag = jnp.real(jnp.sum(residues * w))
        slope = mag - st.last_sync
        emit = (slope < 0.0) & (st.last_sync_slope >= 0.0)
        the_bit = st.last_data >= 0.0
        bit = (the_bit ^ st.prev_bit)
        prev_bit = jnp.where(emit, the_bit, st.prev_bit)
        new = Decoder1State(cst, lbuf[1:], mbuf[1:], w, fbuf[1:],
                            mag, slope, v2, prev_bit)
        return new, (bit.astype(jnp.int8), emit, r * 4.0)

    state, (bits, mask, iq) = jax.lax.scan(step, state, z)
    return bits, mask, iq, state


# --------------------------------------------------------------------------
# decoder 2
# --------------------------------------------------------------------------


class Decoder2Config(NamedTuple):
    rrc: np.ndarray


def make_decoder2_config(rate: int = C.RDS_RATE) -> Decoder2Config:
    taps = design.root_raised_cosine(1.0, rate, 2 * C.RDS_BITCLK_HZ, 1.0, 45)
    return Decoder2Config(taps.astype(np.float32))


class Decoder2State(NamedTuple):
    mf_buf: jax.Array         # [44] complex
    agc_gain: jax.Array
    costas: CostasState
    s0: jax.Array             # 3-sample window (complex)
    s1: jax.Array
    s2: jax.Array
    count: jax.Array
    skip: jax.Array
    mu: jax.Array
    prev_bit: jax.Array
    last_iq: jax.Array        # held post-Costas symbol (the reference's
                              # static magCplx, written only on symbol
                              # emission in mode 2, rds-decoder-2.cpp:101-118)


def decoder2_zero_state(cfg: Decoder2Config) -> Decoder2State:
    c = jnp.complex64
    f = jnp.float32
    return Decoder2State(
        jnp.zeros(len(cfg.rrc) - 1, c), jnp.asarray(9.0, f),
        costas_zero_state(),
        jnp.asarray(0j, c), jnp.asarray(0j, c), jnp.asarray(0j, c),
        jnp.asarray(0, jnp.int32), jnp.asarray(3, jnp.int32),
        jnp.asarray(0.0, f), jnp.asarray(False), jnp.asarray(0j, c))


def decoder2_block(z: jax.Array, cfg: Decoder2Config, state: Decoder2State):
    """Mueller&Muller decoder (rds-decoder-2.cpp:101-157)."""
    rrc = jnp.asarray(cfg.rrc)
    sps = jnp.float32(SPS)
    mm_alpha = 0.01
    c_alpha, c_beta = 1.0, 0.02
    limit = 2 * jnp.pi * 10.0 / C.RDS_RATE

    def rail(x):
        return jax.lax.complex(jnp.where(jnp.real(x) > 0, 1.0, -1.0),
                               jnp.where(jnp.imag(x) > 0, 1.0, -1.0))

    def step(st: Decoder2State, zi):
        buf = jnp.concatenate([st.mf_buf, zi[None]])
        v = jnp.sum(buf * rrc[::-1])
        out = v * st.agc_gain
        gain = st.agc_gain + 2e-3 * (0.38 - jnp.abs(out))
        s0, s1, s2 = st.s1, st.s2, out
        count = st.count + 1
        sample_now = count >= st.skip

        r0, r1, r2 = rail(s0), rail(s1), rail(s2)
        x = (jnp.real(r2 - r0) * jnp.real(s1)
             + jnp.imag(r2 - r0) * jnp.imag(s1))
        y = (jnp.real(s2 - s0) * jnp.real(r1)
             + jnp.imag(s2 - s0) * jnp.imag(r1))
        mm = y - x
        mu = st.mu + sps + mm_alpha * mm
        skip_new = jnp.floor(mu).astype(jnp.int32)
        mu_new = mu - skip_new.astype(jnp.float32)

        cst, r = _costas_step(st.costas, s2, c_alpha, c_beta, limit)
        the_bit = jnp.real(r) >= 0
        bit = the_bit ^ st.prev_bit
        iq = jnp.where(sample_now, r, st.last_iq)

        new = Decoder2State(
            buf[1:], gain,
            jax.tree.map(lambda a, b: jnp.where(sample_now, a, b),
                         cst, st.costas),
            s0, s1, s2,
            jnp.where(sample_now, 0, count),
            jnp.where(sample_now, skip_new, st.skip),
            jnp.where(sample_now, mu_new, st.mu),
            jnp.where(sample_now, the_bit, st.prev_bit),
            iq)
        return new, (bit.astype(jnp.int8), sample_now, iq)

    state, (bits, mask, iq) = jax.lax.scan(step, state, z)
    return bits, mask, iq, state


# --------------------------------------------------------------------------
# decoder 3
# --------------------------------------------------------------------------


class Decoder3Config(NamedTuple):
    lp21: np.ndarray
    symbol_ceiling: int


def make_decoder3_config(rate: int = C.RDS_RATE) -> Decoder3Config:
    lp = design.lowpass_sinc(21, C.RDS_WIDTH, rate).astype(np.float32)
    return Decoder3Config(lp, int(np.ceil(rate / C.RDS_BITCLK_HZ)))


class Decoder3State(NamedTuple):
    costas: CostasState
    lp_buf: jax.Array
    sync_buf: jax.Array       # [symbol_ceiling] recent filtered samples
    p: jax.Array
    bit_integrator: jax.Array
    bit_clk_phase: jax.Array
    prev_clk: jax.Array
    prev_bit: jax.Array
    need_resync: jax.Array


def decoder3_zero_state(cfg: Decoder3Config) -> Decoder3State:
    f = jnp.float32
    return Decoder3State(
        costas_zero_state(),
        jnp.zeros(len(cfg.lp21) - 1, f),
        jnp.zeros(cfg.symbol_ceiling, f),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, f), jnp.asarray(0, f),
        jnp.asarray(0, f), jnp.asarray(False), jnp.asarray(True))


def _sync_bit_clock(sync_buf, first, cfg: Decoder3Config):
    """synchronizeOnBitClk (rds-decoder-3.cpp:119-154): fold samples into
    clock half-cycles, find the rising edge, set the phase."""
    n = cfg.symbol_ceiling
    omega = 2.0 * jnp.pi * C.RDS_BITCLK_HZ / C.RDS_RATE
    i = jnp.arange(n)
    phase = jnp.mod(i * (omega / 2.0), 2.0 * jnp.pi)
    s = jnp.sin(phase)
    # k resets at each sign change of sin(phase): k = index since last flip
    sign = s > 0
    flip = jnp.concatenate([jnp.asarray([True]), sign[1:] != sign[:-1]])
    seg = jnp.cumsum(flip.astype(jnp.int32)) - 1
    first_of_seg = jnp.where(flip, i, 0)
    start = jax.lax.associative_scan(jnp.maximum, first_of_seg)
    k = i - start
    vals = sync_buf[jnp.mod(first + i, n)]
    corr = jnp.zeros(n, jnp.float32).at[k].add(vals)
    floor = int(np.floor(C.RDS_RATE / C.RDS_BITCLK_HZ))
    # the reference's two `while (iMin < floor && corr[iMin++] { >, < } 0)`
    # loops (rds-decoder-3.cpp:146-148): scan past the leading positive run,
    # then past the following negative run; `corr[iMin++]` increments even
    # on the element that fails the test, so the final iMin is one past the
    # first non-negative element after the negative run (clamped to floor).
    c = corr[:floor]
    idx = jnp.arange(floor)
    pos1 = jnp.min(jnp.where(c <= 0, idx, floor))     # 1st non-positive
    pos2 = jnp.min(jnp.where((c >= 0) & (idx > pos1), idx, floor))
    i_min = jnp.where(pos1 >= floor, floor, jnp.minimum(pos2 + 1, floor))
    phase0 = jnp.mod(-omega * (i_min.astype(jnp.float32) - 1.0),
                     2.0 * jnp.pi)
    return phase0


def decoder3_block(z: jax.Array, cfg: Decoder3Config, state: Decoder3State):
    lp = jnp.asarray(cfg.lp21)
    omega = 2.0 * jnp.pi * C.RDS_BITCLK_HZ / C.RDS_RATE
    alpha, beta = 1.0 / 16.0, 0.02 / 16.0
    limit = 2 * jnp.pi * 10.0 / C.RDS_RATE
    n = cfg.symbol_ceiling

    def step(st: Decoder3State, zi):
        cst, r = _costas_step(st.costas, zi, alpha, beta, limit)
        v = jnp.real(r) * 4.0
        lbuf = jnp.concatenate([st.lp_buf, v[None]])
        filt = jnp.sum(lbuf * lp[::-1])
        sync_buf = st.sync_buf.at[st.p].set(filt)
        p = jnp.mod(st.p + 1, n)
        phase0 = _sync_bit_clock(sync_buf, p, cfg)
        bit_clk_phase = jnp.where(st.need_resync, phase0, st.bit_clk_phase)
        clk = jnp.sin(bit_clk_phase)
        integ = st.bit_integrator + clk * v
        emit = (st.prev_clk <= 0) & (clk > 0)
        the_bit = integ >= 0
        bit = the_bit ^ st.prev_bit
        new = Decoder3State(
            cst, lbuf[1:], sync_buf, p,
            jnp.where(emit, 0.0, integ),
            jnp.mod(bit_clk_phase + omega, 2.0 * jnp.pi),
            clk, jnp.where(emit, the_bit, st.prev_bit),
            jnp.asarray(False))
        return new, (bit.astype(jnp.int8), emit, r * 4.0)

    state, (bits, mask, iq) = jax.lax.scan(step, state, z)
    return bits, mask, iq, state
