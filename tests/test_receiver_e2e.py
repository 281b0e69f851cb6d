"""End-to-end receiver tests on synthesized broadcast-FM IQ.

The reference validates by ear/scopes (SURVEY.md §4); these tests are the
quantitative replacement: tone SNR, stereo separation, pilot lock, RDS BER.
"""

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
from sdrjfm_tpu.runtime.stream import run_offline

BLOCK_FM = 32768


def make_iq(seconds=1.5, left=None, right=None, rds_bits=None,
            mpx_kwargs=None, **fm_kwargs):
    n = int(seconds * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    if left is None:
        left = 0.6 * np.sin(2 * np.pi * 1000.0 * t)
    if right is None:
        right = left
    p = synth.MPXParams(**(mpx_kwargs or {}))
    mpx = synth.synth_mpx(left, right, p, rds_bits=rds_bits)
    return synth.fm_modulate(mpx, C.FM_RATE, **fm_kwargs)


def tone_snr_db(x, rate, freq, guard_bins=3):
    """Power at `freq` (±guard bins) vs everything else (excluding DC)."""
    w = np.hanning(len(x))
    X = np.abs(np.fft.rfft(x * w)) ** 2
    bin_f = int(round(freq * len(x) / rate))
    sig = X[bin_f - guard_bins : bin_f + guard_bins + 1].sum()
    noise = X[8:].sum() - sig
    return 10 * np.log10(sig / max(noise, 1e-30))


def band_power(x, rate, freq, guard_bins=3):
    w = np.hanning(len(x))
    X = np.abs(np.fft.rfft(x * w)) ** 2
    bin_f = int(round(freq * len(x) / rate))
    return X[bin_f - guard_bins : bin_f + guard_bins + 1].sum()


class TestMono:
    def test_tone_snr(self):
        iq = make_iq(seconds=1.0)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono", rds="off",
                                     audio_filter_hz=15000))
        res = run_offline(rx, iq, drop_blocks=2)
        mono = res.audio[:, 0]
        snr = tone_snr_db(mono, C.WORKING_RATE, 1000.0)
        assert snr > 40.0, f"mono tone SNR {snr:.1f} dB"

    def test_output_level_matches_contract(self):
        """Audio level = mpx_level * audio_share/2*(L+R) * demod gain *
        deemphasis response at 1 kHz."""
        iq = make_iq(seconds=1.0)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono", rds="off"))
        res = run_offline(rx, iq, drop_blocks=2)
        mono = res.audio[:, 0]
        amp = np.sqrt(2 * band_power(mono, C.WORKING_RATE, 1000.0)
                      / (np.hanning(len(mono)) ** 2).sum() / len(mono) * 2)
        g = synth.expected_demod_gain()
        alpha = C.deemphasis_alpha()
        import cmath
        hd = abs(alpha / (1 - (1 - alpha)
                          * cmath.exp(-2j * np.pi * 1000 / C.FM_RATE)))
        expected = 0.6 * 0.9 * g * hd
        assert abs(amp - expected) / expected < 0.15, (amp, expected)


class TestStereo:
    @pytest.fixture(scope="class")
    def stereo_result(self):
        n = int(2.5 * C.FM_RATE)
        t = np.arange(n) / C.FM_RATE
        left = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
        right = np.zeros(n)
        iq = make_iq(seconds=2.5, left=left, right=right)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, rds="off",
                                     audio_filter_hz=15000))
        return run_offline(rx, iq, drop_blocks=8)

    def test_pilot_locks(self, stereo_result):
        assert stereo_result.meta[-1]["pilot_locked"] == 1.0
        assert stereo_result.meta[-1]["pilot_strength"] > 0.07

    def test_separation(self, stereo_result):
        l = stereo_result.audio[:, 0]
        r = stereo_result.audio[:, 1]
        pl = band_power(l, C.WORKING_RATE, 1000.0)
        pr = band_power(r, C.WORKING_RATE, 1000.0)
        sep = 10 * np.log10(pl / max(pr, 1e-30))
        assert sep > 25.0, f"stereo separation {sep:.1f} dB"

    def test_left_tone_clean(self, stereo_result):
        l = stereo_result.audio[:, 0]
        snr = tone_snr_db(l, C.WORKING_RATE, 1000.0)
        assert snr > 30.0, f"left SNR {snr:.1f} dB"


class TestAutoMono:
    def test_no_pilot_falls_back_to_mono(self):
        iq = make_iq(seconds=1.0, mpx_kwargs=dict(pilot_level=0.0))
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, rds="off"))
        res = run_offline(rx, iq, drop_blocks=2)
        assert res.meta[-1]["pilot_locked"] == 0.0
        # L and R identical in auto-mono
        np.testing.assert_allclose(res.audio[:, 0], res.audio[:, 1],
                                   atol=1e-6)


class TestRDS:
    def test_rds_bits_and_groups_decode(self):
        from sdrjfm_tpu.rds import encode
        from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
        from sdrjfm_tpu.rds.groups import GroupDecoder

        data_bits = encode.make_bitstream(pi=0x20AB, pty=5,
                                          station="JAXRADIO",
                                          radiotext="TPU NATIVE FM\r")
        channel_syms = encode.differential_encode(data_bits)
        n = int(4.0 * C.FM_RATE)
        t = np.arange(n) / C.FM_RATE
        left = right = 0.3 * np.sin(2 * np.pi * 700.0 * t)
        mpx = synth.synth_mpx(left, right, synth.MPXParams(rds_level=0.08),
                              rds_bits=channel_syms)
        iq = synth.fm_modulate(mpx, C.FM_RATE)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM))
        res = run_offline(rx, iq, drop_blocks=4)
        assert res.rds_bits is not None and len(res.rds_bits) > 3000

        sync = BlockSynchronizer()
        dec = GroupDecoder()
        grp = Group()
        sync.push_bits(res.rds_bits, grp, on_group=dec.decode)
        assert sync.groups_decoded > 20, (sync.groups_decoded,
                                          sync.num_sync_errors)
        assert dec.result.pi_code == 0x20AB
        assert dec.result.station_label == "JAXRADIO"
        assert dec.result.pty_code == 5
        assert "TPU NATIVE FM" in dec.result.radio_text
        assert sync.bit_error_rate < 0.01


class TestAudioModes:
    def test_192k_audio_mode(self):
        """audio_rate=192000 (the reference's -m flag) upsamples x4 and
        preserves the tone."""
        iq = make_iq(seconds=0.7)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", audio_rate=192000,
                                     audio_filter_hz=15000))
        res = run_offline(rx, iq, drop_blocks=2)
        assert len(res.audio) % 4 == 0
        assert len(res.audio) == (len(iq) // rx.cfg.block_in - 2) \
            * rx.cfg.block_audio
        snr = tone_snr_db(res.audio[:, 0], 192000, 1000.0)
        assert snr > 35.0, snr

    def test_test_tone_injection(self):
        iq = make_iq(seconds=2.5)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", test_tone=True))
        res = run_offline(rx, iq, drop_blocks=0)
        x = res.audio[:, 0]
        # a 25 ms burst of 1 kHz at 0.9 exists at the start of each 2 s period
        burst = x[:1200]
        rest = x[24000:48000]
        assert np.abs(burst).max() > 0.5
        # outside the burst the program is attenuated to 0.1
        assert np.abs(rest).max() < 0.25


class TestDecoderVariants:
    @pytest.mark.parametrize("decoder", ["mixed", "real_baseband",
                                         "difference", "pll"])
    def test_all_discriminators_demodulate(self, decoder):
        iq = make_iq(seconds=0.7)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", decoder=decoder,
                                     audio_filter_hz=15000))
        res = run_offline(rx, iq, drop_blocks=2)
        snr = tone_snr_db(res.audio[:, 0], C.WORKING_RATE, 1000.0)
        assert snr > 22.0, (decoder, snr)

    def test_am_decoder(self):
        """AM: envelope-modulated carrier -> recovered tone."""
        n = int(0.7 * C.INPUT_RATE)
        t = np.arange(n) / C.INPUT_RATE
        env = 1.0 + 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        iq = (0.3 * env).astype(np.complex64)   # carrier at DC
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", decoder="am",
                                     audio_filter_hz=15000))
        res = run_offline(rx, iq, drop_blocks=1)
        snr = tone_snr_db(res.audio[:, 0], C.WORKING_RATE, 1000.0)
        assert snr > 20.0, snr


class TestSquelch:
    def test_noise_squelch_gates_noise(self):
        """Pure noise with a high threshold must be suppressed; a clean
        carrier with the same setting must pass."""
        rng = np.random.default_rng(0)
        n = int(0.7 * C.INPUT_RATE)
        noise_iq = (0.1 * (rng.standard_normal(n) + 1j *
                           rng.standard_normal(n))).astype(np.complex64)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", squelch="nsq"))
        from sdrjfm_tpu.models.receiver import default_controls
        ctl = default_controls()._replace(
            squelch_level=np.float32(70.0))
        res_noise = run_offline(rx, noise_iq, controls=ctl, drop_blocks=1)

        iq = make_iq(seconds=0.7)
        res_sig = run_offline(rx, iq, controls=ctl, drop_blocks=1)
        p_noise = float((res_noise.audio ** 2).mean())
        p_sig = float((res_sig.audio ** 2).mean())
        assert p_sig > 100 * max(p_noise, 1e-12), (p_sig, p_noise)

    def test_level_squelch_gates_weak_carrier(self):
        iq = make_iq(seconds=0.7, amplitude=0.001)
        rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, mode="mono",
                                     rds="off", squelch="lsq"))
        from sdrjfm_tpu.models.receiver import default_controls
        ctl = default_controls()._replace(squelch_level=np.float32(60.0))
        res_weak = run_offline(rx, iq, controls=ctl, drop_blocks=1)
        iq2 = make_iq(seconds=0.7, amplitude=1.0)
        res_strong = run_offline(rx, iq2, controls=ctl, drop_blocks=1)
        p_weak = float((res_weak.audio ** 2).mean())
        p_strong = float((res_strong.audio ** 2).mean())
        assert p_strong > 100 * max(p_weak, 1e-12), (p_strong, p_weak)


class TestDeemphasisFold:
    def test_folded_equals_scan_path(self):
        """Deemphasis folded into the audio-filter kernel == the standalone
        one-pole scan applied after an unfolded audio filter."""
        import jax.numpy as jnp
        from sdrjfm_tpu.ops import blockops as B
        iq = make_iq(seconds=0.75)
        cfg = ReceiverConfig(block_fm=BLOCK_FM, mode="mono", rds="off",
                             audio_filter_hz=15000)
        rx = Receiver(cfg)
        assert rx.deemph_folded
        res = run_offline(rx, iq)
        # reference: unfolded filter (deemphasis off) then exact scan
        cfg0 = ReceiverConfig(block_fm=BLOCK_FM, mode="mono", rds="off",
                              audio_filter_hz=15000, deemphasis_us=0.0)
        rx0 = Receiver(cfg0)
        res0 = run_offline(rx0, iq)
        alpha = rx.deemph_alpha
        want = np.empty_like(res0.audio[:, 0])
        acc = 0.0
        # scan at 48 kHz is NOT equivalent (deemphasis runs at 192 kHz
        # before decimation), so compare in the spectral domain instead:
        # folded output / unfolded output at f == |Hd(f)| of the one-pole
        f = np.fft.rfftfreq(len(res.audio), 1.0 / C.WORKING_RATE)
        F1 = np.abs(np.fft.rfft(res.audio[:, 0] * np.hanning(len(res.audio))))
        F0 = np.abs(np.fft.rfft(res0.audio[:, 0] * np.hanning(len(res0.audio))))
        import cmath
        for probe in (1000.0,):
            k = int(round(probe * len(res.audio) / C.WORKING_RATE))
            hd = abs(alpha / (1 - (1 - alpha)
                              * cmath.exp(-2j * np.pi * probe / C.FM_RATE)))
            ratio = F1[k] / F0[k]
            assert abs(ratio - hd) / hd < 0.02, (ratio, hd)

    def test_folded_matches_unfiltered_deemphasis_tone(self):
        """Folded config's 1 kHz level matches the scan-deemphasis config
        within tolerance (both hit the analog deemphasis curve)."""
        iq = make_iq(seconds=0.75)
        r_fold = run_offline(Receiver(ReceiverConfig(
            block_fm=BLOCK_FM, mode="mono", rds="off",
            audio_filter_hz=15000)), iq, drop_blocks=1)
        r_scan = run_offline(Receiver(ReceiverConfig(
            block_fm=BLOCK_FM, mode="mono", rds="off")), iq, drop_blocks=1)
        a1 = np.sqrt((r_fold.audio[:, 0] ** 2).mean())
        a2 = np.sqrt((r_scan.audio[:, 0] ** 2).mean())
        assert abs(a1 - a2) / a2 < 0.02, (a1, a2)
