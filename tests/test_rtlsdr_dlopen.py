"""In-process dlopen(librtlsdr) device backend (r3 verdict Missing #1).

The reference's rtlsdr-handler loads the vendor library at runtime and
degrades gracefully when it is absent
(devices/rtlsdr-handler/rtlsdr-handler.cpp:102-116); acquisition is an
async callback feeding a ring, with u8 conversion in getSamples
(:285-294).  These tests drive the whole path against an in-tree fake
librtlsdr (tests/fake_librtlsdr.c): a `rx --iq rtlsdr:0 --follow` run
decodes a planted station end-to-end, live hardware commands reach the
fake's setters, and a missing/defective library is a clean
"loading device failed" exit 2.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.app import main
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.rds import encode


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    """Compile tests/fake_librtlsdr.c like the native ingest library."""
    d = tmp_path_factory.mktemp("fakelib")
    so = d / "libfakertlsdr.so"
    src = Path(__file__).parent / "fake_librtlsdr.c"
    subprocess.run(["cc", "-shared", "-fPIC", "-O2", "-o", str(so),
                    str(src)], check=True)
    return str(so)


@pytest.fixture(scope="module")
def u8_capture(tmp_path_factory):
    """4 s u8 raw capture with a known station (rtl_sdr wire format)."""
    d = tmp_path_factory.mktemp("fakeiq")
    bits = encode.make_bitstream(pi=0xDAB5, station="DLOPENRX", repeats=8)
    syms = encode.differential_encode(bits)
    n = int(4.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700.0 * t),
                          0.5 * np.sin(2 * np.pi * 300.0 * t),
                          synth.MPXParams(rds_level=0.08), rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    path = d / "capture.u8"
    synth.iq_to_u8(iq).tofile(path)
    return str(path)


def test_source_streams_and_controls_reach_the_fake(fake_lib, u8_capture,
                                                    monkeypatch):
    from sdrjfm_tpu.runtime.native_source import RtlSdrUsbSource

    monkeypatch.setenv("FAKE_RTLSDR_IQ", u8_capture)
    monkeypatch.setenv("FAKE_RTLSDR_FPS", "8000000")   # fast test
    src = RtlSdrUsbSource(0, rate=C.INPUT_RATE, libname=fake_lib)
    try:
        # control surface in the rtlsdr-handler's order
        src.set_freq_correction(12)
        src.set_gain_mode(True)
        src.set_gain(297)
        src.set_frequency(94_300_000)
        assert src.get_frequency() == 94_300_000
        src.start()
        blk = src.read_block(262144, timeout_ms=10_000)
        assert blk.shape == (262144, 2) and blk.dtype == np.uint8
        # real signal, not DC fill
        assert blk.std() > 3.0
    finally:
        src.close()


def test_rx_follow_decodes_from_fake_dongle(fake_lib, u8_capture, tmp_path,
                                            monkeypatch):
    """End-to-end: the CLI drives the dlopen backend and decodes the
    planted PI/station from the fake dongle's async stream."""
    monkeypatch.setenv("SDRJFM_LIBRTLSDR", fake_lib)
    monkeypatch.setenv("FAKE_RTLSDR_IQ", u8_capture)
    # pace modestly above real time: the CPU consumer keeps up post-
    # compile and the ring absorbs the compile window
    monkeypatch.setenv("FAKE_RTLSDR_FPS", "2500000")
    report = str(tmp_path / "report.json")
    audio = str(tmp_path / "audio.wav")
    rc = main(["rx", "--iq", "rtlsdr:0", "--rds", "--audio", audio,
               "--report", report, "--block-fm", "32768",
               "--tune", "94300000", "--gain", "297"])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["rds"]["pi_code"] == "0xDAB5"
    assert rep["rds"]["station_label"] == "DLOPENRX"
    assert rep["meta_last"]["pilot_locked"] is True


def test_missing_library_is_clean_device_load_failure(tmp_path, capsys,
                                                      monkeypatch):
    """No librtlsdr anywhere -> 'loading device failed', exit 2, no
    traceback (the reference's device-load contract, radio.cpp:758-831)."""
    monkeypatch.setenv("SDRJFM_LIBRTLSDR",
                       str(tmp_path / "no_such_librtlsdr.so"))
    rc = main(["rx", "--iq", "rtlsdr:0", "--rds"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "loading device failed" in err


def test_no_dongle_plugged_in_is_clean_failure(fake_lib, tmp_path, capsys,
                                               monkeypatch):
    """Library present but zero devices -> same clean contract."""
    monkeypatch.setenv("SDRJFM_LIBRTLSDR", fake_lib)
    monkeypatch.setenv("FAKE_RTLSDR_COUNT", "0")
    rc = main(["rx", "--iq", "rtlsdr:0", "--rds"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "loading device failed" in err and "no rtlsdr device" in err


def _sweep_centers(cfg, f_start, f_stop, grid):
    """Replicate scan_band's stop grouping (models/bandscan.py:156-171)
    so the fake dongle can pre-stage a capture per hardware stop."""
    window = cfg.input_rate // 2 - cfg.fm_rate
    half = (window - cfg.fm_rate // 2) // grid * grid
    span = 2 * half + grid
    chans = list(range(f_start, f_stop + 1, grid))
    centers, i = [], 0
    while i < len(chans):
        group = [c for c in chans[i:] if c - chans[i] < span]
        i += len(group)
        centers.append(group[len(group) // 2])
    return centers


def test_hardware_band_sweep_on_fake_dongle(fake_lib, tmp_path_factory,
                                            monkeypatch):
    """`scan --iq rtlsdr:0` steps the dlopen dongle across the raster and
    finds/identifies a planted station — full parity with the rtl_tcp
    sweep (test_bandscan.py) on the in-process backend."""
    from test_bandscan import _station_iq
    from sdrjfm_tpu.models.bandscan import scan_band
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
    from sdrjfm_tpu.runtime.native_source import RtlSdrUsbSource

    d = tmp_path_factory.mktemp("fakescan")
    cfg = ReceiverConfig(block_fm=32768, rds="off")
    planted = {88_400_000: dict(pi=0x4D4D, name="DLSWEEP ")}
    n_frames = 2_600_000
    n_fm = -(-n_frames // 12) + 2048
    rng = np.random.default_rng(1)
    for center in _sweep_centers(cfg, 88_000_000, 90_000_000, 100_000):
        iq = 0.02 * (rng.standard_normal(n_fm * 12)
                     + 1j * rng.standard_normal(n_fm * 12)
                     ).astype(np.complex64)
        for f, kw in planted.items():
            off = f - center
            if abs(off) <= 1_000_000:
                iq += _station_iq(n_fm, off, pi=kw["pi"],
                                  name=kw["name"])[:len(iq)]
        synth.iq_to_u8(iq[:n_frames]).tofile(d / f"{center}.u8")

    monkeypatch.delenv("FAKE_RTLSDR_IQ", raising=False)
    monkeypatch.setenv("FAKE_RTLSDR_IQ_DIR", str(d))
    monkeypatch.setenv("FAKE_RTLSDR_FPS", "6000000")
    rx = Receiver(cfg)
    src = RtlSdrUsbSource(0, rate=C.INPUT_RATE, libname=fake_lib)
    try:
        src.start()
        hits = scan_band(rx, src, f_start=88_000_000, f_stop=90_000_000,
                         grid_hz=100_000, blocks=2, settle_ms=250,
                         identify_seconds=1.4)
    finally:
        src.close()
    freqs = sorted(h["freq_hz"] for h in hits)
    assert 88_400_000 in freqs, hits
    by_freq = {h["freq_hz"]: h for h in hits}
    assert by_freq[88_400_000]["pi_code"] == "0x4D4D"
    assert by_freq[88_400_000]["station"] == "DLSWEEP"


def test_cli_follow_hw_retune_flips_pi(fake_lib, tmp_path_factory,
                                       monkeypatch):
    """Live `rx --follow` on the dlopen dongle, retuned over the control
    socket: the hardware retune (set_center_freq + ring flush) lands on
    the fake's frequency-aware payloads and the decoded PI flips —
    the rtl_tcp retune criterion (test_control.py) on the in-process
    backend."""
    import json
    import socket
    import threading
    import time as _time
    from sdrjfm_tpu.app import main

    d = tmp_path_factory.mktemp("fakeretune")
    f_a, f_b = 94_300_000, 101_700_000
    for freq, pi, name in ((f_a, 0x1111, "STATIONA"),
                           (f_b, 0x2222, "STATIONB")):
        bits = encode.make_bitstream(pi=pi, station=name, repeats=6)
        n = int(3.0 * C.FM_RATE)
        t = np.arange(n) / C.FM_RATE
        mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700.0 * t),
                              0.5 * np.sin(2 * np.pi * 300.0 * t),
                              synth.MPXParams(rds_level=0.08),
                              rds_bits=encode.differential_encode(bits))
        synth.iq_to_u8(synth.fm_modulate(mpx, C.FM_RATE)).tofile(
            d / f"{freq}.u8")

    monkeypatch.setenv("SDRJFM_LIBRTLSDR", fake_lib)
    monkeypatch.delenv("FAKE_RTLSDR_IQ", raising=False)
    monkeypatch.setenv("FAKE_RTLSDR_IQ_DIR", str(d))
    monkeypatch.setenv("FAKE_RTLSDR_FPS", "3500000")
    ctl = str(tmp_path_factory.mktemp("ctl") / "ctl.sock")
    rep = str(tmp_path_factory.mktemp("rep") / "rep.json")
    rc_box = {}

    def run():
        rc_box["rc"] = main(["rx", "--iq", "rtlsdr:0", "--tune",
                             str(f_a), "--loop-seconds", "240",
                             "--block-fm", "32768", "--rds",
                             "--control", ctl, "--report", rep])

    th = threading.Thread(target=run, daemon=True)
    th.start()

    def connect(deadline_s=180):
        deadline = _time.time() + deadline_s
        while _time.time() < deadline:
            if os.path.exists(ctl):
                s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                try:
                    s.connect(ctl)
                    s.settimeout(10)
                    return s
                except OSError:
                    s.close()
            _time.sleep(0.1)
        raise TimeoutError("control socket never appeared")

    cli = connect()
    buf = b""

    def cmd(line):
        nonlocal buf
        cli.sendall(line.encode() + b"\n")
        while b"\n" not in buf:
            buf += cli.recv(4096)
        out, buf = buf.split(b"\n", 1)
        return json.loads(out)

    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            st = cmd("status")
            if st.get("rds", {}).get("pi_code") == "0x1111":
                break
            _time.sleep(0.25)
        else:
            raise AssertionError(f"station A never decoded: {st}")
        r = cmd(f"tune {f_b}")
        assert r.get("hw_frequency_hz") == f_b or r.get("retune_reset"), r
        deadline = _time.time() + 120
        while _time.time() < deadline:
            st = cmd("status")
            if st.get("rds", {}).get("pi_code") == "0x2222":
                break
            _time.sleep(0.25)
        else:
            raise AssertionError(f"station B never decoded: {st}")
        cmd("quit")
    finally:
        cli.close()
        th.join(90)

    assert rc_box.get("rc") == 0
    report = json.load(open(rep))
    assert report["rds"]["pi_code"] == "0x2222"
