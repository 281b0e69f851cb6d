"""Independent from-the-spec FM/RDS modulator — the second oracle.

Every other e2e fixture comes from io/synth.py + rds/encode.py, whose RDS
checkwords are *derived from the decoder's own syndrome function* — a
fixture-generator bug that mirrored a decoder bug would be invisible
(round-2 verdict, weak #6).  This module re-derives everything from the
published standards and shares NO code or construction with the package
fixtures:

- RDS checkwords: bitwise long division by the spec generator
  g(x) = x^10+x^8+x^7+x^5+x^4+x^3+1 and the published offset words
  (IEC 62106 / US RBDS sec. 2.3) — not rds/crc.py's syndrome tables.
- Differential coding: cumulative XOR over the bit array (one vectorised
  pass) — not encode.differential_encode's loop.
- Biphase data shaping: FREQUENCY-domain spectral mask
  H_T(f) = cos(pi f t_b / 4), |f| <= 2/t_b (the spec's 100 % cosine
  roll-off curve applied via FFT) — not a time-domain RRC convolution.
- MPX -> 2.304 MS/s: FFT resampling (exact for the bandlimited multiplex)
  — not polyphase FIR interpolation.
- FM: trapezoidal phase integration — not rectangular cumsum.

If the receiver decodes THIS capture with zero bit errors, the encode and
decode sides are spec-consistent independently, not merely mirror images.
"""

from __future__ import annotations

import numpy as np

INPUT_RATE = 2_304_000
MPX_RATE = 192_000
PILOT_HZ = 19_000.0
BIT_RATE = 1_187.5

# ---------------------------------------------------------------------------
# RDS layer (IEC 62106): CRC(10) over 16 info bits + offset words
# ---------------------------------------------------------------------------

_G = 0b10110111001          # x^10 + x^8 + x^7 + x^5 + x^4 + x^3 + 1
_OFFSET = {"A": 0b0011111100, "B": 0b0110011000,
           "C": 0b0101101000, "D": 0b0110110100}


def crc10(info: int) -> int:
    """Remainder of info(x)*x^10 mod g(x) — plain long division."""
    r = (info & 0xFFFF) << 10
    for i in range(15, -1, -1):
        if r & (1 << (i + 10)):
            r ^= _G << i
    return r & 0x3FF


def block26(info: int, offset_name: str) -> np.ndarray:
    word = ((info & 0xFFFF) << 10) | (crc10(info) ^ _OFFSET[offset_name])
    return np.array([(word >> k) & 1 for k in range(25, -1, -1)], np.uint8)


def group_bits(a: int, b: int, c: int, d: int) -> np.ndarray:
    return np.concatenate([block26(a, "A"), block26(b, "B"),
                           block26(c, "C"), block26(d, "D")])


def bitstream(pi: int, pty: int, station: str, radiotext: str,
              repeats: int = 4) -> np.ndarray:
    """0A (PS name) + 2A (radiotext) groups, repeated."""
    station = (station + " " * 8)[:8]
    radiotext = (radiotext + "\r" + " " * 64)[:64]
    groups = []
    for seg in range(4):
        b = (0 << 12) | (0 << 11) | (0 << 10) | ((pty & 0x1F) << 5) | seg
        d = (ord(station[2 * seg]) << 8) | ord(station[2 * seg + 1])
        groups.append(group_bits(pi, b, 0xE0CD, d))      # AF: none (224,205)
    for seg in range(16):
        b = (2 << 12) | ((pty & 0x1F) << 5) | seg
        t = radiotext[4 * seg:4 * seg + 4]
        c = (ord(t[0]) << 8) | ord(t[1])
        d = (ord(t[2]) << 8) | ord(t[3])
        groups.append(group_bits(pi, b, c, d))
    one = np.concatenate(groups)
    return np.tile(one, repeats)


# ---------------------------------------------------------------------------
# physical layer
# ---------------------------------------------------------------------------

def rds_waveform(bits: np.ndarray, n: int, rate: int = MPX_RATE
                 ) -> np.ndarray:
    """Differentially-coded biphase baseband shaped by the spec's
    H_T(f) = cos(pi f t_b / 4) spectrum mask, built in the frequency
    domain."""
    diff = np.bitwise_xor.accumulate(bits.astype(np.uint8))
    sym_rate = 2.0 * BIT_RATE
    # biphase: each diff bit b -> symbol pair (+s, -s) with s = 2b-1
    s = 2.0 * diff.astype(np.float64) - 1.0
    symbols = np.empty(2 * len(s))
    symbols[0::2] = s
    symbols[1::2] = -s
    # impulse train at the exact (fractional) symbol instants via nearest
    # sample placement, then ideal spectral shaping
    bb = np.zeros(n)
    pos = np.round(np.arange(len(symbols)) * rate / sym_rate).astype(int)
    keep = pos < n
    bb[pos[keep]] = symbols[keep]
    spec = np.fft.rfft(bb)
    f = np.fft.rfftfreq(n, 1.0 / rate)
    tb = 1.0 / BIT_RATE
    mask = np.where(f <= 2.0 / tb, np.cos(np.pi * f * tb / 4.0), 0.0)
    bb = np.fft.irfft(spec * mask, n)
    return bb / np.abs(bb).max()


def multiplex(left: np.ndarray, right: np.ndarray,
              rds_bits: np.ndarray | None = None,
              pilot_level: float = 0.1, rds_level: float = 0.06,
              rate: int = MPX_RATE) -> np.ndarray:
    """Stereo multiplex per the broadcast standard: (L+R)/2 + pilot at
    19 kHz + DSB-SC (L-R)/2 on sin(2theta) + RDS BPSK on cos(3theta)."""
    n = len(left)
    theta = 2.0 * np.pi * PILOT_HZ * np.arange(n) / rate
    mpx = 0.9 * (0.5 * (left + right)
                 + np.sin(2.0 * theta) * 0.5 * (left - right))
    mpx += pilot_level * np.sin(theta)
    if rds_bits is not None:
        mpx += rds_level * rds_waveform(rds_bits, n, rate) * np.cos(
            3.0 * theta)
    return mpx


def fm_iq(mpx: np.ndarray, deviation_hz: float = 75_000.0,
          out_rate: int = INPUT_RATE, mpx_rate: int = MPX_RATE
          ) -> np.ndarray:
    """FFT-resample the multiplex to the capture rate, then FM with
    trapezoidal phase integration."""
    from scipy.signal import resample
    up = resample(mpx, len(mpx) * (out_rate // mpx_rate))
    w = 2.0 * np.pi * deviation_hz * up / out_rate
    phase = np.concatenate(([0.0], np.cumsum(0.5 * (w[1:] + w[:-1]))))
    return np.exp(1j * phase).astype(np.complex64)


def make_capture(seconds: float = 4.0, pi: int = 0xA1B2,
                 station: str = "INDEPMOD",
                 radiotext: str = "second oracle from the spec",
                 left_hz: float = 1000.0, right_hz: float = 440.0
                 ) -> np.ndarray:
    n = int(seconds * MPX_RATE)
    t = np.arange(n) / MPX_RATE
    left = 0.6 * np.sin(2.0 * np.pi * left_hz * t)
    right = 0.6 * np.sin(2.0 * np.pi * right_hz * t)
    bits = bitstream(pi, 10, station, radiotext,
                     repeats=2 + int(seconds))
    return fm_iq(multiplex(left, right, bits))
