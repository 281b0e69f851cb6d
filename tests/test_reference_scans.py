"""Unit tests for the per-sample oracle loops (pllC / Costas / AGC)."""

import numpy as np
import jax.numpy as jnp

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.ops import reference_scans as R


def test_pll_scan_tracks_tone():
    """pllC locks to a complex tone; phaseIncr converges to its frequency."""
    rate, f = 192000, 5000.0
    t = np.arange(30000)
    z = np.exp(1j * 2 * np.pi * f / rate * t).astype(np.complex64)
    incrs, errs, _ = R.pll_scan(jnp.asarray(z), rate, cf=0.0,
                                lofreq=-90000, hifreq=90000,
                                bandwidth=0.85 * rate)
    est_hz = float(np.asarray(incrs)[-1]) * rate / (2 * np.pi)
    assert abs(est_hz - f) < 50.0, est_hz


def test_costas_scan_derotates_bpsk():
    rng = np.random.default_rng(0)
    sym = rng.choice([-1.0, 1.0], size=3000)
    z = (sym * np.exp(1j * 0.8)).astype(np.complex64)   # constant rotation
    out, _ = R.costas_scan(jnp.asarray(z), 24000.0, 1.0 / 16, 0.02 / 16, 10.0)
    tail = np.asarray(out)[-500:]
    assert np.abs(np.imag(tail)).mean() < 0.1
    assert np.abs(np.real(tail)).mean() > 0.9


def test_agc_scan_reaches_reference_level():
    z = (0.05 * np.ones(50000)).astype(np.complex64)
    out, gain = R.agc_scan(jnp.asarray(z), 2e-3, 0.38, 9.0)
    assert abs(float(np.abs(np.asarray(out)[-1])) - 0.38) < 0.02
