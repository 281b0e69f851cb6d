"""Tuner window logic, AFC convergence, band scan detection."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
from sdrjfm_tpu.models.tuner import RadioController

BLOCK_FM = 32768


def make_offset_iq(seconds, offset_hz, tone=1000.0, noise=0.0):
    n = int(seconds * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    l = r = 0.6 * np.sin(2 * np.pi * tone * t)
    mpx = synth.synth_mpx(l, r, synth.MPXParams())
    return synth.fm_modulate(mpx, C.FM_RATE, carrier_offset_hz=offset_hz,
                             noise_std=noise)


class TestTuner:
    def test_window_rejects_out_of_range(self):
        rc = RadioController(Receiver(ReceiverConfig(block_fm=BLOCK_FM,
                                                     rds="off")))
        with pytest.raises(ValueError):
            rc.set_tuner(rc.max_offset + 1000)

    def test_retune_recovers_offset_station(self):
        offset = 300_000
        iq = make_offset_iq(1.0, offset)
        rc = RadioController(Receiver(ReceiverConfig(
            block_fm=BLOCK_FM, mode="mono", rds="off",
            audio_filter_hz=15000)))
        rc.set_tuner(offset)
        T = rc.rx.cfg.block_in
        outs = [rc.process_block(iq[i * T:(i + 1) * T])
                for i in range(len(iq) // T)]
        audio = np.concatenate([np.asarray(o.audio) for o in outs[2:]])
        w = np.hanning(len(audio))
        X = np.abs(np.fft.rfft(audio[:, 0] * w)) ** 2
        b = int(round(1000 * len(audio) / C.WORKING_RATE))
        snr = 10 * np.log10(X[b - 3:b + 4].sum() / (X[8:].sum() - X[b - 3:b + 4].sum()))
        assert snr > 30.0, snr

    def test_afc_pulls_in_residual_offset(self):
        offset = 1500.0                      # beyond the 3 Hz deadband
        iq = make_offset_iq(2.0, offset)
        rc = RadioController(Receiver(ReceiverConfig(
            block_fm=BLOCK_FM, mode="mono", rds="off")), afc_active=True)
        T = rc.rx.cfg.block_in
        for i in range(len(iq) // T):
            rc.process_block(iq[i * T:(i + 1) * T])
        assert abs(rc._afc.offset - offset) < 400.0, rc._afc.offset
        assert abs(rc._afc.offset - offset) < 0.5 * offset


class TestScan:
    def test_scan_finds_station_offsets(self):
        iq = make_offset_iq(0.25, 400_000, noise=0.02)
        rc = RadioController(Receiver(ReceiverConfig(block_fm=BLOCK_FM,
                                                     rds="off")))
        T = rc.rx.cfg.block_in
        found = rc.scan(iq[:T], grid_hz=100_000)
        assert 400_000 in found, found
        # far-away offsets must not trigger
        assert not any(abs(f - 400_000) > 200_000 for f in found), found
