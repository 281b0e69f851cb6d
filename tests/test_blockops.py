"""Golden tests for the core block primitives against numpy/scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal

from sdrjfm_tpu.ops import blockops as B
from sdrjfm_tpu.ops import design

RNG = np.random.default_rng(0)


def _blocks(x, n):
    return np.split(x, n)


class TestFIR:
    def test_fir_matches_lfilter_real(self):
        x = RNG.standard_normal(1024).astype(np.float32)
        k = design.lowpass_sinc(25, 0.1, 1.0).astype(np.float32)
        want = signal.lfilter(k, [1.0], x)
        carry = jnp.zeros(24, jnp.float32)
        got = []
        for blk in _blocks(x, 4):
            y, carry = B.fir_apply(jnp.asarray(blk), jnp.asarray(k), carry)
            got.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(got), want, atol=1e-5)

    def test_fir_matches_lfilter_complex_kernel(self):
        x = (RNG.standard_normal(512) + 1j * RNG.standard_normal(512)).astype(np.complex64)
        k = design.bandpass_complex(31, 0.1, 0.2, 1.0).astype(np.complex64)
        want = signal.lfilter(k, [1.0], x)
        y, _ = B.fir_apply(jnp.asarray(x), jnp.asarray(k),
                           jnp.zeros(30, jnp.complex64))
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)

    def test_decimate_matches_reference_alignment(self):
        """Oracle: literal per-sample DecimatingFIR::Pass port in numpy."""
        factor, K = 6, 25
        x = (RNG.standard_normal(600) + 1j * RNG.standard_normal(600)).astype(np.complex64)
        k = design.lowpass_sinc(K, 96000, 2304000)

        buf = np.zeros(K, np.complex128)
        ip = 0
        counter = 0
        want = []
        for z in x:                      # fir-filters.cpp:397-424
            buf[ip] = z
            counter += 1
            if counter < factor:
                ip = (ip + 1) % K
                continue
            counter = 0
            acc = 0
            for i in range(ip + 1):
                acc += buf[ip - i] * k[i]
            for i in range(ip + 1, K):
                acc += buf[K + ip - i] * k[i]
            ip = (ip + 1) % K
            want.append(acc)
        want = np.asarray(want)

        carry = jnp.zeros(K - 1, jnp.complex64)
        got = []
        for blk in _blocks(x, 2):
            y, carry = B.fir_decimate(jnp.asarray(blk), jnp.asarray(k, dtype=jnp.float32),
                                      factor, carry)
            got.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(got), want, atol=1e-5)


class TestFFTFilter:
    def test_overlap_save_equals_lfilter(self):
        x = RNG.standard_normal(4096).astype(np.float32)
        k = design.lowpass_sinc(251, 0.05, 1.0)
        H = jnp.asarray(design.fft_filter_response(k, 1024), jnp.complex64)
        hop = 512
        want = signal.lfilter(k, [1.0], x)
        carry = B.fft_filter_zero_state(1024, hop)
        got = []
        for blk in _blocks(x, 4):
            y, carry = B.fft_filter_apply(jnp.asarray(blk), H, hop, carry)
            got.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(got), want, atol=2e-4)

    def test_blocks_smaller_than_halo_stitch_exactly(self):
        """T < F-hop (ultra-low-latency geometry, block_fm=2048 with
        fm_fft=8192): the carry is 'the trailing halo input samples'
        regardless of block size, so tiny blocks == whole-array."""
        x = RNG.standard_normal(8192).astype(np.float32)
        k = design.lowpass_sinc(751, 0.05, 1.0)
        F, hop = 4096, 512                    # halo = 3584 >> block 512
        H = jnp.asarray(design.fft_filter_response(k, F), jnp.complex64)
        whole, _ = B.fft_filter_apply(jnp.asarray(x), H, hop,
                                      B.fft_filter_zero_state(F, hop))
        carry = B.fft_filter_zero_state(F, hop)
        got = []
        for blk in _blocks(x, 16):            # 512-sample blocks
            y, carry = B.fft_filter_apply(jnp.asarray(blk), H, hop, carry)
            got.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(got), np.asarray(whole),
                                   atol=1e-5)

    def test_multi_blocks_smaller_than_halo_stitch_exactly(self):
        x = RNG.standard_normal(8192).astype(np.float32)
        k1 = design.lowpass_sinc(751, 0.05, 1.0)
        k2 = design.lowpass_sinc(751, 0.2, 1.0)
        F, hop = 4096, 512
        H = jnp.asarray(np.stack([design.fft_filter_response(k1, F),
                                  design.fft_filter_response(k2, F)]),
                        jnp.complex64)
        whole, _ = B.fft_filter_apply_multi(
            jnp.asarray(x), H, hop, B.fft_filter_zero_state(F, hop))
        carry = B.fft_filter_zero_state(F, hop)
        got = []
        for blk in _blocks(x, 16):
            ys, carry = B.fft_filter_apply_multi(jnp.asarray(blk), H, hop,
                                                 carry)
            got.append(np.asarray(ys))
        np.testing.assert_allclose(np.concatenate(got, axis=1),
                                   np.asarray(whole), atol=1e-5)

    def test_overlap_save_complex_onesided(self):
        """One-sided (analytic) bandpass: output ~ analytic signal of a tone."""
        fs, f0 = 192000.0, 19000.0
        t = np.arange(8192) / fs
        x = np.cos(2 * np.pi * f0 * t).astype(np.float32)
        k = design.bandpass_complex(1537, f0 - 500, f0 + 500, fs)
        H = jnp.asarray(design.fft_filter_response(k, 8192), jnp.complex64)
        y, _ = B.fft_filter_apply(jnp.asarray(x.astype(np.complex64)), H, 4096,
                                  B.fft_filter_zero_state(8192, 4096))
        y = np.asarray(y)[2000:]          # skip filter fill-in
        # analytic amplitude = 0.5, phase advances at f0
        np.testing.assert_allclose(np.abs(y), 0.5, atol=0.02)
        dphi = np.diff(np.unwrap(np.angle(y)))
        np.testing.assert_allclose(dphi, 2 * np.pi * f0 / fs, atol=1e-3)


class TestFFTFilterMulti:
    def test_rows_match_single_filters(self):
        """Shared-forward-FFT bank == per-filter overlap-save (real input)."""
        fs = 192000.0
        x = RNG.standard_normal(16384).astype(np.float32)
        k1 = design.bandpass_complex(1537, 18500.0, 19500.0, fs)
        k2 = design.bandpass_complex(769, 54600.0, 59400.0, fs)
        F, hop = 8192, 4096
        H = jnp.asarray(np.stack([design.fft_filter_response(k1, F),
                                  design.fft_filter_response(k2, F)]),
                        jnp.complex64)
        carry = B.fft_filter_zero_state(F, hop)
        ys, _ = B.fft_filter_apply_multi(jnp.asarray(x), H, hop, carry)
        for m, km in enumerate((k1, k2)):
            want, _ = B.fft_filter_apply(
                jnp.asarray(x.astype(np.complex64)), H[m], hop,
                B.fft_filter_zero_state(F, hop))
            np.testing.assert_allclose(np.asarray(ys[m]), np.asarray(want),
                                       atol=2e-4)

    def test_block_stitching(self):
        """Block-split through the bank == whole-array, bit-exactly."""
        fs = 192000.0
        x = RNG.standard_normal(16384).astype(np.float32)
        k1 = design.bandpass_complex(1537, 18500.0, 19500.0, fs)
        k2 = design.bandpass_complex(769, 54600.0, 59400.0, fs)
        F, hop = 8192, 4096
        H = jnp.asarray(np.stack([design.fft_filter_response(k1, F),
                                  design.fft_filter_response(k2, F)]),
                        jnp.complex64)
        whole, _ = B.fft_filter_apply_multi(
            jnp.asarray(x), H, hop, B.fft_filter_zero_state(F, hop))
        carry = B.fft_filter_zero_state(F, hop)
        got = []
        for blk in _blocks(x, 2):
            y, carry = B.fft_filter_apply_multi(jnp.asarray(blk), H, hop,
                                                carry)
            got.append(np.asarray(y))
        np.testing.assert_array_equal(np.concatenate(got, axis=1),
                                      np.asarray(whole))


class TestLinRec:
    def test_ema_matches_sequential(self):
        x = RNG.standard_normal(2048).astype(np.float32)
        alpha = 1e-3
        y0 = 0.7
        want = np.empty_like(x)
        acc = y0
        for i, v in enumerate(x):
            acc = (1 - alpha) * acc + alpha * v
            want[i] = acc
        y, yT = B.ema_apply(jnp.asarray(x), alpha, y0)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)
        assert np.allclose(np.asarray(yT), want[-1], atol=1e-5)

    def test_ema_block_stitching(self):
        x = RNG.standard_normal(1000).astype(np.float32)
        full, _ = B.ema_apply(jnp.asarray(x), 0.01, 0.0)
        acc = 0.0
        parts = []
        for blk in np.split(x, [300, 700]):
            y, acc = B.ema_apply(jnp.asarray(blk), 0.01, acc)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), np.asarray(full),
                                   atol=1e-5)


class TestIIR:
    @pytest.mark.parametrize("order,ftype", [(4, "cheby"), (5, "butter")])
    def test_cascade_matches_sosfilt(self, order, ftype):
        fs = 192000.0
        if ftype == "cheby":
            sos = design.cheby1_sos(order, 20000.0, fs)
        else:
            sos = design.butter_sos(order, 20000.0, fs)
        spec = B.IIRSpec(sos)
        x = RNG.standard_normal(4096).astype(np.float32)
        want = signal.sosfilt(sos, x)
        y, _ = B.iir_apply(jnp.asarray(x), spec, spec.zero_state())
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-3)

    def test_cascade_block_stitching(self):
        sos = design.bandpass_butter_sos(2, 1181.5, 1193.5, 24000.0)
        spec = B.IIRSpec(sos)
        x = RNG.standard_normal(2400).astype(np.float32)
        full, _ = B.iir_apply(jnp.asarray(x), spec, spec.zero_state())
        st = spec.zero_state()
        parts = []
        for blk in np.split(x, 4):
            y, st = B.iir_apply(jnp.asarray(blk), spec, st)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), np.asarray(full),
                                   atol=1e-3)


class TestRunlength:
    def test_matches_sequential_counter(self):
        flags = RNG.random(512) > 0.3
        r = 0
        want = np.empty(512, np.int32)
        for i, f in enumerate(flags):
            r = r + 1 if f else 0
            want[i] = r
        rl, rT = B.runlength_true(jnp.asarray(flags), 0)
        np.testing.assert_array_equal(np.asarray(rl), want)
        assert int(rT) == want[-1]

    def test_carry(self):
        flags = np.ones(16, bool)
        rl, rT = B.runlength_true(jnp.asarray(flags), 5)
        assert int(rl[0]) == 6 and int(rT) == 21


class TestDelayAndNCO:
    def test_delay(self):
        x = np.arange(10.0, dtype=np.float32)
        carry = jnp.asarray(np.array([-2.0, -1.0], np.float32))
        y, c = B.delay_apply(jnp.asarray(x), carry)
        np.testing.assert_array_equal(np.asarray(y),
                                      [-2, -1, 0, 1, 2, 3, 4, 5, 6, 7])
        np.testing.assert_array_equal(np.asarray(c), [8, 9])

    def test_mix_lo_continuity(self):
        fs, f = 2304000.0, 100000.0
        x = np.ones(4096, np.complex64)
        a = np.asarray(B.mix_lo(jnp.asarray(x), f, fs, 0))
        b1 = np.asarray(B.mix_lo(jnp.asarray(x[:2048]), f, fs, 0))
        b2 = np.asarray(B.mix_lo(jnp.asarray(x[2048:]), f, fs, 2048))
        np.testing.assert_allclose(np.concatenate([b1, b2]), a, atol=1e-5)
        # spectral check: tone at -f
        X = np.fft.fft(a)
        peak = np.argmax(np.abs(X))
        assert peak == round((fs - f) / fs * 4096)
