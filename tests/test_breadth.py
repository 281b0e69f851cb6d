"""Breadth: sound selectors, panorama, clock-time groups, noise robustness."""

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
from sdrjfm_tpu.runtime.stream import run_offline


def stereo_iq(seconds=1.2, fl=1000.0, fr=3000.0, noise=0.0):
    n = int(seconds * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.7 * np.sin(2 * np.pi * fl * t),
                          0.7 * np.sin(2 * np.pi * fr * t),
                          synth.MPXParams())
    return synth.fm_modulate(mpx, C.FM_RATE, noise_std=noise)


def band_power(x, f):
    w = np.hanning(len(x))
    X = np.abs(np.fft.rfft(x * w)) ** 2
    b = int(round(f * len(x) / C.WORKING_RATE))
    return X[b - 3:b + 4].sum()


@pytest.fixture(scope="module")
def iq():
    return stereo_iq(2.0)


class TestSoundSelectors:
    def _run(self, iq, sound):
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="off",
                                     audio_filter_hz=15000, sound=sound))
        return run_offline(rx, iq, drop_blocks=8).audio

    def test_swapped(self, iq):
        a = self._run(iq, "stereo_swapped")
        # left tone (1 kHz) must appear in the RIGHT channel
        assert band_power(a[:, 1], 1000) > 10 * band_power(a[:, 1], 3000)
        assert band_power(a[:, 0], 3000) > 10 * band_power(a[:, 0], 1000)

    def test_left_only(self, iq):
        a = self._run(iq, "left")
        np.testing.assert_allclose(a[:, 0], a[:, 1], atol=2e-6)
        assert band_power(a[:, 0], 1000) > 10 * band_power(a[:, 0], 3000)

    def test_left_plus_right(self, iq):
        a = self._run(iq, "left_plus_right")
        # mono sum: both tones at half level, channels identical
        np.testing.assert_allclose(a[:, 0], a[:, 1], atol=2e-6)
        r = band_power(a[:, 0], 1000) / band_power(a[:, 0], 3000)
        assert 0.5 < r < 2.0

    def test_left_minus_right(self, iq):
        a = self._run(iq, "left_minus_right")
        assert band_power(a[:, 0], 1000) > 0  # both tones in the difference
        np.testing.assert_allclose(a[:, 0], a[:, 1], atol=2e-6)


class TestPanorama:
    def test_pano_scales_separation(self, iq):
        def sep(mode, pano=1.0):
            rx = Receiver(ReceiverConfig(block_fm=32768, rds="off",
                                         audio_filter_hz=15000, mode=mode,
                                         panorama=pano))
            a = run_offline(rx, iq, drop_blocks=8).audio
            return 10 * np.log10(band_power(a[:, 0], 1000)
                                 / band_power(a[:, 1], 1000))
        s_full = sep("stereo")
        s_half = sep("stereo_pano", 0.5)
        assert s_full > s_half + 5.0, (s_full, s_half)


class TestClockTime:
    def test_group4a_decodes(self):
        from sdrjfm_tpu.rds import encode
        from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
        from sdrjfm_tpu.rds.groups import GroupDecoder
        bits = []
        for _ in range(6):
            bits.extend(encode.group_4a(0x1234, 3, mjd=60000, hours=15,
                                        minutes=42))
        sync, dec, grp = BlockSynchronizer(), GroupDecoder(), Group()
        sync.push_bits(np.asarray(bits, np.int8), grp, on_group=dec.decode)
        assert dec.result.clock_time is not None
        assert "15:42" in dec.result.clock_time
        assert "60000" in dec.result.clock_time


class TestNoiseRobustness:
    @pytest.mark.parametrize("noise,min_snr,expect_lock", [
        (0.05, 25.0, True),      # strong signal
        (0.30, 10.0, True),      # moderate noise
    ])
    def test_graceful_degradation(self, noise, min_snr, expect_lock):
        iq = stereo_iq(2.0, noise=noise)
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="off",
                                     audio_filter_hz=15000))
        res = run_offline(rx, iq, drop_blocks=8)
        assert bool(res.meta[-1]["pilot_locked"]) == expect_lock
        x = res.audio[:, 0]
        sig = band_power(x, 1000)
        w = np.hanning(len(x))
        X = np.abs(np.fft.rfft(x * w)) ** 2
        snr = 10 * np.log10(sig / max(X[8:].sum() - sig, 1e-30))
        assert snr > min_snr, (noise, snr)
