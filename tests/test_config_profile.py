"""Settings profile (--config): the reference's QSettings identity.

The reference persists its state in .jsdr-fm.ini and restores it on
startup (main.cpp:33,69; save-on-close throughout radio.cpp) — last
frequency, volume, squelch, decoder come back without retyping them.
--config is that cycle for the CLI: profile keys become flag defaults
(explicit flags still win) and the final state — including runtime
control-channel edits — is saved back on clean exit.
"""

import json

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.rds import encode

BLOCK_FM = 16384


@pytest.fixture(scope="module")
def offset_wav(tmp_path_factory):
    from sdrjfm_tpu.io.wavio import write_iq_wav

    n = 10 * BLOCK_FM
    t = np.arange(n) / C.FM_RATE
    bits = encode.make_bitstream(pi=0xC0F0, station="PROFILED", repeats=2)
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700 * t),
                          0.5 * np.sin(2 * np.pi * 350 * t),
                          synth.MPXParams(rds_level=0.07),
                          rds_bits=encode.differential_encode(bits))
    iq = synth.fm_modulate(mpx, C.FM_RATE, carrier_offset_hz=250_000)
    path = tmp_path_factory.mktemp("prof") / "off.wav"
    write_iq_wav(str(path), iq, C.INPUT_RATE, float32=False)
    return str(path)


def test_profile_supplies_defaults_and_saves_back(offset_wav, tmp_path):
    from sdrjfm_tpu.app import main

    cfg = str(tmp_path / "profile.json")
    json.dump({"freq_offset": 250_000, "rds": True, "volume_db": -3.0,
               "block_fm": BLOCK_FM, "ignored_key": 1},
              open(cfg, "w"))
    rep = str(tmp_path / "rep.json")
    # no --freq-offset/--rds on the command line: the profile supplies them
    assert main(["rx", "--iq", offset_wav, "--config", cfg,
                 "--report", rep]) == 0
    r = json.load(open(rep))
    assert r["rds"]["pi_code"] == "0xC0F0"          # tuned via the profile
    saved = json.load(open(cfg))
    assert saved["freq_offset"] == 250_000
    assert saved["volume_db"] == -3.0
    assert saved["rds"] is True and saved["mode"] == "stereo"
    assert saved["ignored_key"] == 1                # unknown keys preserved


def test_explicit_flag_beats_profile(offset_wav, tmp_path):
    from sdrjfm_tpu.app import main

    cfg = str(tmp_path / "profile.json")
    json.dump({"freq_offset": 0, "block_fm": BLOCK_FM}, open(cfg, "w"))
    rep = str(tmp_path / "rep.json")
    assert main(["rx", "--iq", offset_wav, "--config", cfg, "--rds",
                 "--freq-offset", "250000", "--report", rep]) == 0
    assert json.load(open(rep))["rds"]["pi_code"] == "0xC0F0"
    assert json.load(open(cfg))["freq_offset"] == 250_000   # saved back


def test_control_channel_edits_persist(offset_wav, tmp_path):
    """A runtime retune through the control channel lands in the saved
    profile — the next run starts on the new station."""
    from sdrjfm_tpu.app import main

    cfg = str(tmp_path / "profile.json")
    json.dump({"freq_offset": 0, "block_fm": BLOCK_FM}, open(cfg, "w"))
    fifo = str(tmp_path / "ctl.fifo")
    import os
    import threading
    import time
    os.mkfifo(fifo)

    rc_box = {}

    def run():
        rc_box["rc"] = main(["rx", "--iq", offset_wav, "--config", cfg,
                             "--follow", "--loop-seconds", "60",
                             "--control", fifo])

    th = threading.Thread(target=run, daemon=True)
    th.start()
    w = os.open(fifo, os.O_WRONLY)
    deadline = time.time() + 90
    os.write(w, b"tune 250000\nvolume -9\n")
    os.write(w, b"quit\n")
    os.close(w)
    th.join(120)
    assert rc_box.get("rc") == 0, rc_box
    saved = json.load(open(cfg))
    assert saved["freq_offset"] == 250_000
    assert saved["volume_db"] == -9.0


def test_pano_and_sound_edits_round_trip(offset_wav, tmp_path):
    """Live 'pano'/'sound' edits save to the profile and genuinely shape
    the NEXT run's traced controls (the finding-regression: pano now seeds
    from cfg.panorama in every mode, so a restored profile applies)."""
    import os
    import threading

    from sdrjfm_tpu.app import main

    cfg = str(tmp_path / "profile.json")
    json.dump({"freq_offset": 250000, "block_fm": BLOCK_FM}, open(cfg, "w"))
    fifo = str(tmp_path / "ctl.fifo")
    os.mkfifo(fifo)
    rc_box = {}

    def run():
        rc_box["rc"] = main(["rx", "--iq", offset_wav, "--config", cfg,
                             "--follow", "--loop-seconds", "60",
                             "--control", fifo])

    th = threading.Thread(target=run, daemon=True)
    th.start()
    w = os.open(fifo, os.O_WRONLY)
    os.write(w, b"pano 40\nsound swapped\nquit\n")
    os.close(w)
    th.join(120)
    assert rc_box.get("rc") == 0, rc_box
    saved = json.load(open(cfg))
    assert saved["panorama"] == pytest.approx(0.4)
    assert saved["sound"] == "stereo_swapped"

    # the restored profile seeds the next run's controls
    from sdrjfm_tpu.models.receiver import (Receiver, ReceiverConfig,
                                            SOUND_MATRICES)
    rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM,
                                 sound=saved["sound"],
                                 panorama=saved["panorama"]))
    c = rx.initial_controls()
    assert float(np.asarray(c.pano)) == pytest.approx(0.4)
    np.testing.assert_array_equal(
        np.asarray(c.sound_mix),
        np.asarray(SOUND_MATRICES["stereo_swapped"], np.float32))
