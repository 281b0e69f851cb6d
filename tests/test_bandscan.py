"""Band scan: multi-block averaged file decisions + the full hardware sweep.

Covers the round-2 verdict's scan items: the file scan now averages its
decision over blocks spread across the capture (clearAverage depth,
fm-processor.cpp:480-495 — a station flickering in one block is not a
hit), and `scan --iq rtl_tcp://...` steps the *device* across the FM band
raster (radio.cpp:1115-1158) deciding every channel of each stop in one
vmapped dispatch.  The mock rtl_tcp server synthesizes different stations
per tuned frequency, so the sweep is exercised end-to-end without
hardware: the scan must find exactly the planted carriers.
"""

import socket
import struct
import threading

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.bandscan import cluster_hits, scan_capture
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
from sdrjfm_tpu.rds import encode

BLOCK_FM = 32768

try:
    from sdrjfm_tpu.runtime.native_source import RtlTcpSource, load_library
    load_library()
    HAVE_NATIVE = True
except Exception:                                    # pragma: no cover
    HAVE_NATIVE = False


def _station_iq(n_fm, offset_hz, tone=900.0, pi=None, name="        ",
                amplitude=0.6):
    t = np.arange(n_fm) / C.FM_RATE
    rds = None
    if pi is not None:
        raw = []
        for _ in range(1 + n_fm // (4 * 26 * 1187)):
            for seg in range(4):
                raw.extend(encode.group_0a(pi, 3, seg,
                                           name[2 * seg:2 * seg + 2]))
        rds = encode.differential_encode(np.asarray(raw, np.int8))
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * tone * t),
                          0.5 * np.sin(2 * np.pi * (tone / 2.5) * t),
                          synth.MPXParams(rds_level=0.07 if rds is not None
                                          else 0.0),
                          rds_bits=rds)
    return synth.fm_modulate(mpx, C.FM_RATE, carrier_offset_hz=offset_hz,
                             amplitude=amplitude)


def test_file_scan_averages_out_flicker():
    """A carrier present only in the first block must NOT be a hit (the
    round-1 scan decided from block 0 alone); a steady carrier must."""
    rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, rds="off"))
    T = rx.cfg.block_in
    n_fm = 6 * BLOCK_FM
    steady = _station_iq(n_fm, 300_000)
    flicker = _station_iq(n_fm, -500_000)
    rng = np.random.default_rng(0)
    noise = 0.02 * (rng.standard_normal(6 * T)
                    + 1j * rng.standard_normal(6 * T)).astype(np.complex64)
    iq = steady + noise
    iq[:T] += flicker[:T]              # station B exists only in block 0
    hits = scan_capture(rx, iq, max_blocks=6)
    offs = [h["offset_hz"] for h in hits]
    assert 300_000 in offs, hits
    assert all(abs(o - 300_000) <= 200_000 for o in offs), hits

    # sanity: the single-block decision WOULD have seen the flicker
    one = scan_capture(rx, iq[:T], max_blocks=1)
    assert any(abs(h["offset_hz"] + 500_000) <= 100_000 for h in one), one


def test_cluster_hits_picks_contrast_peaks():
    offs = [-500_000, -400_000, -300_000, 200_000, 300_000]
    contrast = [21.0, 30.0, 22.0, 25.0, 24.0]
    assert cluster_hits(offs, contrast, 100_000) == [-400_000, 200_000]
    assert cluster_hits([0], [25.0], 100_000) == [0]


def test_file_scan_two_stations_clustered():
    """Two carriers -> exactly two clustered peaks at the right offsets."""
    rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, rds="off"))
    n_fm = 4 * BLOCK_FM
    iq = (_station_iq(n_fm, -600_000) + _station_iq(n_fm, 400_000)
          ).astype(np.complex64)
    rng = np.random.default_rng(1)
    iq = iq + 0.02 * (rng.standard_normal(len(iq))
                      + 1j * rng.standard_normal(len(iq))
                      ).astype(np.complex64)
    hits = scan_capture(rx, iq, max_blocks=4)
    offs = sorted(h["offset_hz"] for h in hits)
    assert len(offs) == 2 and offs == [-600_000, 400_000], hits


class FreqAwareRtlTcpServer:
    """Mock rtl_tcp server whose stream depends on the tuned frequency:
    0x01 commands switch the payload, so a hardware band sweep sees
    different stations per stop — the planted-station fixture the
    round-2 verdict asked for."""

    def __init__(self, payload_for_freq, default_freq=100_000_000,
                 speed=6.0):
        self.payload_for_freq = payload_for_freq
        self.freq = default_freq
        self.speed = speed      # x real-time; a real dongle paces at 1x —
        # unpaced blasting buries a retune under megabytes of stale
        # in-flight samples no realistic settle window could cover
        self.commands = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self._srv.settimeout(30.0)
        try:
            conn, _ = self._srv.accept()
        except socket.timeout:            # pragma: no cover
            return
        # small send buffer bounds the stale in-flight data after a retune
        # (what settle_ms has to cover)
        conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 65536)
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        threading.Thread(target=self._read_commands, args=(conn,),
                         daemon=True).start()
        pos = 0
        payload = b""
        cur_freq = None
        rate_bytes = 2 * 2_304_000 * self.speed
        import time
        t0 = time.monotonic()
        sent = 0
        try:
            while not self._stop.is_set():
                with self._lock:
                    f = self.freq
                if f != cur_freq:
                    payload = self.payload_for_freq(f)
                    cur_freq = f
                    pos = 0
                if pos >= len(payload):
                    pos = 0
                chunk = payload[pos:pos + 65536]
                conn.sendall(chunk)
                pos += len(chunk)
                sent += len(chunk)
                ahead = sent / rate_bytes - (time.monotonic() - t0)
                if ahead > 0.02:
                    time.sleep(ahead)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _read_commands(self, conn):
        buf = b""
        try:
            while not self._stop.is_set():
                data = conn.recv(256)
                if not data:
                    return
                buf += data
                while len(buf) >= 5:
                    cmd, param = buf[0], struct.unpack(">I", buf[1:5])[0]
                    self.commands.append((cmd, param))
                    if cmd == 0x01:
                        with self._lock:
                            self.freq = param
                    buf = buf[5:]
        except OSError:
            pass

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


PLANTED = {88_400_000: dict(pi=0x3333, name="SCANHIT "),
           89_500_000: dict(pi=None, name=None)}


def _payload_for_freq(center, n_frames=3_000_000, cache={}):
    """u8 IQ as seen when tuned to `center`: every planted station within
    the capture window appears at its offset; plus a noise floor."""
    if center in cache:
        return cache[center]
    n_fm = -(-n_frames // 12) + 2048
    rng = np.random.default_rng(center % 2**32)
    iq = 0.02 * (rng.standard_normal(n_fm * 12)
                 + 1j * rng.standard_normal(n_fm * 12)).astype(np.complex64)
    for f, kw in PLANTED.items():
        off = f - center
        if abs(off) <= 1_000_000:
            iq += _station_iq(n_fm, off, pi=kw["pi"],
                              name=kw["name"] or "        ")[:len(iq)]
    cache[center] = synth.iq_to_u8(iq[:n_frames]).tobytes()
    return cache[center]


@pytest.mark.skipif(not HAVE_NATIVE, reason="native toolchain unavailable")
def test_hardware_band_sweep_finds_planted_stations():
    """scan_band steps the mock dongle over 88-90 MHz and finds exactly
    the planted carriers; the RDS one is identified by PI and name."""
    from sdrjfm_tpu.models.bandscan import scan_band

    srv = FreqAwareRtlTcpServer(_payload_for_freq)
    rx = Receiver(ReceiverConfig(block_fm=BLOCK_FM, rds="off"))
    try:
        with RtlTcpSource("127.0.0.1", srv.port, rate=C.INPUT_RATE) as src:
            hits = scan_band(rx, src, f_start=88_000_000,
                             f_stop=90_000_000, grid_hz=100_000,
                             blocks=2, settle_ms=250,
                             identify_seconds=1.4)
    finally:
        srv.close()
    freqs = sorted(h["freq_hz"] for h in hits)
    assert freqs == [88_400_000, 89_500_000], hits
    by_freq = {h["freq_hz"]: h for h in hits}
    assert by_freq[88_400_000]["pi_code"] == "0x3333"
    assert by_freq[88_400_000]["station"] == "SCANHIT"
    assert by_freq[88_400_000]["pilot_locked"] is True
    # the sweep really stepped the hardware across the raster
    tunes = [p for c, p in srv.commands if c == 0x01]
    assert len(tunes) >= 2 and all(88_000_000 <= t <= 90_000_000
                                   for t in tunes)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native toolchain unavailable")
def test_cli_hardware_band_scan(tmp_path, capsys):
    """scan --iq rtl_tcp://... end-to-end through the CLI."""
    import json
    from sdrjfm_tpu.app import main

    srv = FreqAwareRtlTcpServer(_payload_for_freq)
    try:
        rc = main(["scan", "--iq", f"rtl_tcp://127.0.0.1:{srv.port}",
                   "--band-start", "88.0", "--band-stop", "90.0",
                   "--scan-blocks", "2", "--settle-ms", "250",
                   "--block-fm", str(BLOCK_FM)])
    finally:
        srv.close()
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    freqs = sorted(h["freq_hz"] for h in out["hits"])
    assert freqs == [88_400_000, 89_500_000], out
