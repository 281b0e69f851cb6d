"""Pallas fused front end == XLA composite path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.ops import blockops as B
from sdrjfm_tpu.ops import design
from sdrjfm_tpu.ops.pallas_frontend import PallasFrontend, TILE_IN


def _composite_kernel():
    k1 = design.lowpass_sinc(127, 110000.0, C.INPUT_RATE)
    k2 = design.lowpass_sinc(31, 110000.0, C.INPUT_RATE / 6)
    up2 = np.zeros(6 * 30 + 1)
    up2[::6] = k2
    return np.convolve(k1, up2).astype(np.float32)


def test_matches_xla_path():
    rng = np.random.default_rng(0)
    T = 2 * TILE_IN
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)
         ).astype(np.complex64)
    hc = _composite_kernel()
    lo, n0 = 137_000, 12345
    dc = 0.003 - 0.002j
    lg, rg = 0.9, 1.1

    # reference path: gains -> dc -> mix -> composite decimate
    g = (x.real * lg - dc.real) + 1j * (x.imag * rg - dc.imag)
    mixed = B.mix_lo(jnp.asarray(g.astype(np.complex64)), lo,
                     C.INPUT_RATE, n0)
    want, _ = B.fir_decimate(mixed, jnp.asarray(hc), 12,
                             jnp.zeros(306, jnp.complex64))
    want = np.asarray(want)

    fe = PallasFrontend(hc, C.INPUT_RATE, interpret=True)
    yr, yi, cr, ci = fe(jnp.asarray(x.real), jnp.asarray(x.imag),
                        lo_freq=lo, n0_mod=n0,
                        dc_r=dc.real, dc_i=dc.imag, lgain=lg, rgain=rg,
                        carry_r=jnp.zeros(306, jnp.float32),
                        carry_i=jnp.zeros(306, jnp.float32))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert got.shape == want.shape
    # skip the 27-output warm-up: the pallas path carries *raw* input history
    # (re-applying dc/gain/mix), the XLA path carries post-mix values — they
    # differ only across the zero-initialised stream start.
    # fixed-point-packed scalars cost ~2^-16 absolute on dc/gain.
    np.testing.assert_allclose(got[27:], want[27:], rtol=3e-5, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(cr), x.real[-306:])


def test_block_stitching():
    rng = np.random.default_rng(1)
    T = 2 * TILE_IN
    x = (rng.standard_normal(2 * T) + 1j * rng.standard_normal(2 * T)
         ).astype(np.complex64)
    hc = _composite_kernel()
    fe = PallasFrontend(hc, C.INPUT_RATE, interpret=True)

    def run(xs, n0, cr, ci):
        return fe(jnp.asarray(xs.real), jnp.asarray(xs.imag),
                  lo_freq=100_000, n0_mod=n0, dc_r=0.0, dc_i=0.0,
                  lgain=1.0, rgain=1.0, carry_r=cr, carry_i=ci)

    z = jnp.zeros(306, jnp.float32)
    yr0, yi0, cr, ci = run(x[:T], 0, z, z)
    yr1, yi1, _, _ = run(x[T:], T % C.INPUT_RATE, cr, ci)
    split = np.concatenate([np.asarray(yr0), np.asarray(yr1)])

    yrF, yiF, _, _ = run(x, 0, z, z)
    np.testing.assert_allclose(split, np.asarray(yrF), rtol=3e-5, atol=1e-5)
