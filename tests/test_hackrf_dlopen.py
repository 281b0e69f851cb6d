"""In-process dlopen(libhackrf) backend — the THIRD vendor-lib device,
completing the wire-format triangle: u8 (rtlsdr) / i16+rate-negotiation
(airspy) / i8 at the chain rate (hackrf).

What this exercises beyond the other two backends:
  - SIGNED 8-bit wire format straight from the vendor callback
    (hackrf-handler.cpp:357-368) through iq_format='i8';
  - arbitrary-rate hardware: set_sample_rate(2304000.0) directly
    (hackrf-handler.cpp:112) — NO on-device rate adapter in the chain;
  - the lna/vga/amp/antenna control surface.
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
    d = tmp_path_factory.mktemp("fakehackrf")
    so = d / "libfakehackrf.so"
    src = Path(__file__).parent / "fake_libhackrf.c"
    subprocess.run(["cc", "-shared", "-fPIC", "-O2", "-o", str(so),
                    str(src), "-lpthread"], check=True)
    return str(so)


@pytest.fixture(scope="module")
def i8_capture(tmp_path_factory):
    """4 s capture at 2.304 MS/s in the hackrf signed-byte wire format."""
    d = tmp_path_factory.mktemp("hackrfiq")
    bits = encode.make_bitstream(pi=0xC0DE, station="HACKRFRX", repeats=8)
    syms = encode.differential_encode(bits)
    n = int(4.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700.0 * t),
                          0.5 * np.sin(2 * np.pi * 300.0 * t),
                          synth.MPXParams(rds_level=0.08), rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    path = d / "capture.i8"
    synth.iq_to_i8(iq * 0.95).tofile(path)
    return str(path)


def test_rate_and_controls_reach_the_fake(fake_lib, i8_capture,
                                          monkeypatch):
    from sdrjfm_tpu.runtime.native_source import HackRfUsbSource

    monkeypatch.setenv("FAKE_HACKRF_IQ", i8_capture)
    monkeypatch.setenv("FAKE_HACKRF_FPS", "8000000")     # fast test
    src = HackRfUsbSource(libname=fake_lib)
    try:
        assert src.rate == C.INPUT_RATE
        fake = ctypes.CDLL(fake_lib)    # same handle: globals shared
        fake.fake_hackrf_last_rate.restype = ctypes.c_double
        fake.fake_hackrf_last_freq.restype = ctypes.c_uint64
        # the backend must have asked for EXACTLY the chain rate
        assert fake.fake_hackrf_last_rate() == 2304000.0
        # control surface in the hackrf-handler's order
        src.set_lna_gain(24)
        src.set_vga_gain(30)
        src.set_amp(True)
        src.set_antenna(True)
        src.set_frequency(94_300_000)
        assert fake.fake_hackrf_last_freq() == 94_300_000
        assert fake.fake_hackrf_last_lna() == 24
        assert fake.fake_hackrf_last_vga() == 30
        assert fake.fake_hackrf_last_amp() == 1
        src.start()
        blk = src.read_block(262144, timeout_ms=10_000)
        assert blk.shape == (262144, 2) and blk.dtype == np.int8
        assert blk.std() > 20.0         # real signal, not silence
    finally:
        src.close()


def test_rx_decodes_from_fake_hackrf(fake_lib, i8_capture, tmp_path,
                                     monkeypatch):
    """End-to-end: the CLI opens the dlopen backend and decodes the
    planted PI/station from the fake's signed-byte stream."""
    monkeypatch.setenv("SDRJFM_LIBHACKRF", fake_lib)
    monkeypatch.setenv("FAKE_HACKRF_IQ", i8_capture)
    # pace BELOW real time so CI load cannot flake the consumer
    monkeypatch.setenv("FAKE_HACKRF_FPS", "1200000")
    report = str(tmp_path / "report.json")
    audio = str(tmp_path / "audio.wav")
    rc = main(["rx", "--iq", "hackrf", "--rds", "--audio", audio,
               "--report", report, "--block-fm", "32768",
               "--loop-seconds", "3", "--tune", "94300000",
               "--lna-gain", "24", "--vga-gain", "30"])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["rds"]["pi_code"] == "0xC0DE"
    assert rep["rds"]["station_label"] == "HACKRFRX"
    assert rep["meta_last"]["pilot_locked"] is True


def test_missing_library_is_clean_device_load_failure(tmp_path, capsys,
                                                      monkeypatch):
    monkeypatch.setenv("SDRJFM_LIBHACKRF",
                       str(tmp_path / "no_such_libhackrf.so"))
    rc = main(["rx", "--iq", "hackrf", "--rds"])
    assert rc == 2
    assert "loading device failed" in capsys.readouterr().err


def test_no_device_plugged_in_is_clean_failure(fake_lib, capsys,
                                               monkeypatch):
    monkeypatch.setenv("SDRJFM_LIBHACKRF", fake_lib)
    monkeypatch.setenv("FAKE_HACKRF_PRESENT", "0")
    rc = main(["rx", "--iq", "hackrf", "--rds"])
    assert rc == 2
    assert "loading device failed" in capsys.readouterr().err


def test_hackrf_gain_flags_require_hackrf(capsys, tmp_path):
    rc = main(["rx", "--iq", str(tmp_path / "x.wav"), "--lna-gain", "24"])
    assert rc == 2
    assert "--lna-gain" in capsys.readouterr().err
