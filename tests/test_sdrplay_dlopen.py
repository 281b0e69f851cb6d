"""In-process dlopen(libsdrplay_api) backend — the FOURTH vendor device,
covering the reference zoo's remaining distinctive pattern
(devices/sdrplay-handler-v3/): a service API with device selection under
a global lock, a device-params STRUCT TREE edited in place and committed
via sdrplay_api_Update reason masks, Init/Uninit around streaming, and
PLANAR short sample delivery (separate xi/xq arrays — a fourth wire
convention, interleaved into the i16 ring by the backend's callback).
The ABI lives in runtime/native/sdrplay_abi.h (transcribed v3.06 vendor
layout, shared by backend and fake service).
"""

import ctypes
import json
import subprocess
from pathlib import Path

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.app import main
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.rds import encode


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("fakesdrplay")
    so = d / "libfakesdrplay.so"
    src = Path(__file__).parent / "fake_libsdrplay.c"
    inc = Path(__file__).parent.parent / "sdrjfm_tpu" / "runtime" / "native"
    subprocess.run(["cc", "-shared", "-fPIC", "-O2", f"-I{inc}",
                    "-o", str(so), str(src), "-lpthread"], check=True)
    return str(so)


@pytest.fixture(scope="module")
def i16_capture(tmp_path_factory):
    """4 s capture, 14-bit range (RSP1A denominator 4096,
    sdrplay-handler-v3.cpp:585-599)."""
    d = tmp_path_factory.mktemp("sdrplayiq")
    bits = encode.make_bitstream(pi=0x5D29, station="SDRPLAY ", repeats=8)
    syms = encode.differential_encode(bits)
    n = int(4.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700.0 * t),
                          0.5 * np.sin(2 * np.pi * 300.0 * t),
                          synth.MPXParams(rds_level=0.08), rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    i16 = np.empty((len(iq), 2), np.int16)
    i16[:, 0] = np.round(iq.real * 4095)
    i16[:, 1] = np.round(iq.imag * 4095)
    path = d / "capture.i16"
    i16.tofile(path)
    return str(path)


def test_param_tree_and_update_masks_reach_the_fake(fake_lib, i16_capture,
                                                    monkeypatch):
    from sdrjfm_tpu.runtime.native_source import SdrplayUsbSource

    monkeypatch.setenv("FAKE_SDRPLAY_IQ", i16_capture)
    monkeypatch.setenv("FAKE_SDRPLAY_FPS", "8000000")    # fast test
    src = SdrplayUsbSource(libname=fake_lib)
    try:
        assert src.rate == C.INPUT_RATE
        assert src.hw_ver == 255                 # RSP1A
        fake = ctypes.CDLL(fake_lib)             # same handle
        fake.fake_sdrplay_last_fs.restype = ctypes.c_double
        fake.fake_sdrplay_last_rf.restype = ctypes.c_double
        # open() must have configured the param tree like Rsp-device
        assert fake.fake_sdrplay_last_fs() == 2304000.0
        assert fake.fake_sdrplay_last_bw() == 1536       # BW_1_536
        assert fake.fake_sdrplay_last_grdb() == 30
        assert fake.fake_sdrplay_last_lna() == 3
        assert fake.fake_sdrplay_last_agc() == 0         # AGC_DISABLE
        src.start()
        # live param edits commit with the right Update reason masks
        src.set_grdb(42)
        src.set_frequency(94_300_000)
        src.set_agc(True)
        assert fake.fake_sdrplay_last_grdb() == 42
        assert fake.fake_sdrplay_last_rf() == 94_300_000.0
        assert fake.fake_sdrplay_last_agc() == 1         # AGC_100HZ
        reason = fake.fake_sdrplay_last_update_reason()
        assert reason & 0x00008000                       # Tuner_Gr
        assert reason & 0x00020000                       # Tuner_Frf
        assert reason & 0x01000000                       # Ctrl_Agc
        blk = src.read_block(262144, timeout_ms=10_000)
        assert blk.shape == (262144, 2) and blk.dtype == np.int16
        assert blk.std() > 300.0                         # real signal
    finally:
        src.close()


def test_rx_decodes_from_fake_sdrplay(fake_lib, i16_capture, tmp_path,
                                      monkeypatch):
    """End-to-end: the CLI opens the service-API backend and decodes the
    planted PI/station from the fake's PLANAR short stream."""
    monkeypatch.setenv("SDRJFM_LIBSDRPLAY", fake_lib)
    monkeypatch.setenv("FAKE_SDRPLAY_IQ", i16_capture)
    # pace BELOW real time so CI load cannot flake the consumer
    monkeypatch.setenv("FAKE_SDRPLAY_FPS", "1200000")
    report = str(tmp_path / "report.json")
    audio = str(tmp_path / "audio.wav")
    rc = main(["rx", "--iq", "sdrplay", "--rds", "--audio", audio,
               "--report", report, "--block-fm", "32768",
               "--loop-seconds", "3", "--tune", "94300000",
               "--grdb", "40", "--lna-state", "2"])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["rds"]["pi_code"] == "0x5D29"
    assert rep["rds"]["station_label"] == "SDRPLAY "
    assert rep["meta_last"]["pilot_locked"] is True


def test_missing_library_is_clean_device_load_failure(tmp_path, capsys,
                                                      monkeypatch):
    monkeypatch.setenv("SDRJFM_LIBSDRPLAY",
                       str(tmp_path / "no_such_libsdrplay.so"))
    rc = main(["rx", "--iq", "sdrplay", "--rds"])
    assert rc == 2
    assert "loading device failed" in capsys.readouterr().err


def test_no_device_plugged_in_is_clean_failure(fake_lib, capsys,
                                               monkeypatch):
    monkeypatch.setenv("SDRJFM_LIBSDRPLAY", fake_lib)
    monkeypatch.setenv("FAKE_SDRPLAY_PRESENT", "0")
    rc = main(["rx", "--iq", "sdrplay", "--rds"])
    assert rc == 2
    assert "loading device failed" in capsys.readouterr().err


def test_sdrplay_flags_require_sdrplay(capsys, tmp_path):
    rc = main(["rx", "--iq", str(tmp_path / "x.wav"), "--grdb", "40"])
    assert rc == 2
    assert "--grdb" in capsys.readouterr().err
