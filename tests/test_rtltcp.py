"""rtl_tcp network source: protocol client vs an in-repo mock server.

Makes V2 (the rtlsdr device class, SURVEY.md §2.5) real without hardware:
rtl_tcp is the standard network protocol a dongle exposes — 12-byte header
("RTL0" + tuner type + gain count), endless u8 IQ stream, 5-byte big-endian
control commands.  The mock server streams a synthesized stereo+RDS u8
capture and records every command; tests assert the wire format both ways
and a full receiver decode off the socket.
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.rds import encode

try:
    from sdrjfm_tpu.runtime.native_source import RtlTcpSource, load_library
    load_library()
    HAVE_NATIVE = True
except Exception:                                    # pragma: no cover
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


class MockRtlTcpServer:
    """One-client rtl_tcp server: header + u8 stream out, commands in."""

    def __init__(self, frames: np.ndarray, tuner_type: int = 5,
                 gain_count: int = 29, chunk: int = 65536,
                 loop: bool = False):
        assert frames.dtype == np.uint8 and frames.ndim == 2
        self.payload = frames.tobytes()
        self.tuner_type = tuner_type
        self.gain_count = gain_count
        self.chunk = chunk
        self.loop = loop
        self.commands = []            # [(cmd, param)]
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self._srv.settimeout(10.0)
        try:
            conn, _ = self._srv.accept()
        except socket.timeout:            # pragma: no cover
            return
        conn.sendall(b"RTL0" + struct.pack(">II", self.tuner_type,
                                           self.gain_count))
        reader = threading.Thread(target=self._read_commands, args=(conn,),
                                  daemon=True)
        reader.start()
        pos = 0
        try:
            while not self._stop.is_set():
                if pos >= len(self.payload):
                    if not self.loop:
                        break
                    pos = 0
                part = self.payload[pos:pos + self.chunk]
                conn.sendall(part)
                pos += len(part)
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass
        finally:
            try:
                conn.shutdown(socket.SHUT_WR)
            except OSError:
                pass
            time.sleep(0.5)           # let the client drain + send commands
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
                    buf = buf[5:]
        except OSError:
            pass

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


@pytest.fixture(scope="module")
def u8_capture():
    """~1.6 s synthesized stereo+RDS broadcast as u8 IQ frames (long enough
    that every 0A name segment also occurs away from the loop seam)."""
    n = 18 * 16384
    t = np.arange(n) / C.FM_RATE
    # name-dense rotation (one make_bitstream repeat is ~1.75 s — longer
    # than the capture — which would leave name segment 0 only at the
    # warm-up-eaten stream head)
    raw = []
    for _ in range(5):
        for seg in range(4):
            raw.extend(encode.group_0a(0x7E57, 3, seg,
                                       "RTLTCP  "[2 * seg:2 * seg + 2]))
    bits = np.asarray(raw, np.int8)
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 900 * t),
                          0.5 * np.sin(2 * np.pi * 400 * t),
                          synth.MPXParams(rds_level=0.07),
                          rds_bits=encode.differential_encode(bits))
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    return synth.iq_to_u8(iq)


def test_header_and_stream_match(u8_capture):
    """Client parses the header and receives the byte-exact u8 stream."""
    srv = MockRtlTcpServer(u8_capture[:100_000], tuner_type=5, gain_count=29)
    try:
        with RtlTcpSource("127.0.0.1", srv.port) as src:
            assert src.tuner_type == 5
            assert src.tuner_gain_count == 29
            got = src.read_block(100_000, timeout_ms=10_000)
            assert src.dropped == 0
    finally:
        srv.close()
    np.testing.assert_array_equal(got, u8_capture[:100_000])


def test_commands_wire_format(u8_capture):
    """Tuning/gain commands reach the server as 5-byte big-endian frames
    (cmd set: 0x01 freq, 0x02 rate, 0x03 gain mode, 0x04 gain, 0x08 AGC)."""
    srv = MockRtlTcpServer(u8_capture[:20_000], loop=True)
    try:
        with RtlTcpSource("127.0.0.1", srv.port,
                          rate=C.INPUT_RATE) as src:
            src.set_frequency(94_300_000)
            src.set_gain_mode(True)
            src.set_gain(297)
            src.set_agc(False)
            src.read_block(10_000, timeout_ms=5000)
            time.sleep(0.3)           # let the server's reader catch up
    finally:
        srv.close()
    cmds = dict()
    for c, p in srv.commands:
        cmds.setdefault(c, []).append(p)
    assert cmds[0x02] == [C.INPUT_RATE]          # sent at connect
    assert cmds[0x01] == [94_300_000]
    assert cmds[0x03] == [1]
    assert cmds[0x04] == [297]
    assert cmds[0x08] == [0]


def test_receiver_decodes_rds_from_socket(u8_capture):
    """Full chain off the network: rtl_tcp u8 stream -> run_live ->
    stereo audio + decoded RDS groups (V2 made real)."""
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
    from sdrjfm_tpu.rds.live import LiveRDSDecoder
    from sdrjfm_tpu.runtime.stream import run_live

    srv = MockRtlTcpServer(u8_capture, loop=True)
    live = LiveRDSDecoder()
    try:
        rx = Receiver(ReceiverConfig(block_fm=16384, rds="block",
                                     iq_format="u8"))
        with RtlTcpSource("127.0.0.1", srv.port) as src:
            res = run_live(rx, src, max_blocks=16, rds_feedback=live.feed)
    finally:
        srv.close()
    assert len(res.meta) == 16
    assert res.meta[-1]["pilot_locked"] is True
    assert live.sync.groups_decoded > 5
    # the looping mock stream has a discontinuous wrap seam, so a Meggitt
    # miscorrection can slip one wrong PI through — the majority vote is
    # the robust readout (rds/groups.py PS/PI voting extension)
    assert live.result.pi_voted == 0x7E57
    assert live.result.station_label_voted == "RTLTCP  "


def test_cli_rtltcp_source(u8_capture, tmp_path):
    """rx --iq rtltcp://host:port streams from the network SDR (implies
    --follow), tunes via --tune-hz, and reports drops + RDS."""
    import json
    from sdrjfm_tpu.app import main

    srv = MockRtlTcpServer(u8_capture, loop=True)
    rep = str(tmp_path / "rep.json")
    audio = str(tmp_path / "a.wav")
    try:
        rc = main(["rx", "--iq", f"rtltcp://127.0.0.1:{srv.port}",
                   "--tune-hz", "94300000", "--block-fm", "16384",
                   "--rds", "--audio", audio, "--report", rep,
                   "--loop-seconds", "1"])
    finally:
        srv.close()
    assert rc == 0
    r = json.load(open(rep))
    want_blocks = int(1 * C.INPUT_RATE) // (16384 * 12)
    assert r["blocks"] == want_blocks
    assert "ingest_dropped" in r
    assert r["rds"]["pi_code"] == "0x7E57"
    assert (0x01, 94_300_000) in srv.commands


def test_source_protocol_adapter(u8_capture):
    """open_source('rtltcp://...') exposes the deviceHandler contract;
    set_vfo_frequency really tunes the remote dongle."""
    from sdrjfm_tpu.io.source import open_source

    srv = MockRtlTcpServer(u8_capture[:50_000], loop=True)
    try:
        dev = open_source(f"rtltcp://127.0.0.1:{srv.port}")
        assert dev.get_rate() == C.INPUT_RATE
        assert dev.bit_depth() == 8
        assert dev.legal_frequency(94_300_000)
        dev.set_vfo_frequency(101_700_000)
        x = dev.get_samples(30_000)
        dev.stop_reader()
        time.sleep(0.3)
    finally:
        srv.close()
    assert x.dtype == np.complex64 and len(x) == 30_000
    want = ((u8_capture[:30_000, 0].astype(np.float32) - 127)
            + 1j * (u8_capture[:30_000, 1].astype(np.float32) - 127)) / 128.0
    np.testing.assert_allclose(x, want.astype(np.complex64), atol=1e-6)
    assert (0x01, 101_700_000) in srv.commands


class RestartableRtlTcpServer:
    """Serves session 1 (header + some frames), drops the connection hard,
    then accepts session 2 and serves the stream indefinitely — the
    server-died-mid-run fixture for the reconnect/backoff path."""

    def __init__(self, frames: np.ndarray, first_session_frames: int = 60_000):
        assert frames.dtype == np.uint8 and frames.ndim == 2
        self.payload = frames.tobytes()
        self.cut = first_session_frames * 2
        self.sessions = []            # [[(cmd, param), ...] per session]
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _read_commands(self, conn, sink):
        buf = b""
        try:
            while not self._stop.is_set():
                data = conn.recv(256)
                if not data:
                    return
                buf += data
                while len(buf) >= 5:
                    sink.append((buf[0], struct.unpack(">I", buf[1:5])[0]))
                    buf = buf[5:]
        except OSError:
            pass

    def _serve(self):
        self._srv.settimeout(30.0)
        for session in range(2):
            try:
                conn, _ = self._srv.accept()
            except (socket.timeout, OSError):     # pragma: no cover
                return
            cmds = []
            self.sessions.append(cmds)
            conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
            threading.Thread(target=self._read_commands, args=(conn, cmds),
                             daemon=True).start()
            try:
                if session == 0:
                    conn.sendall(self.payload[:self.cut])
                    time.sleep(0.1)   # let the client drain it
                    # hard drop mid-stream.  NB: plain close() would be
                    # DEFERRED — the command-reader thread blocked in
                    # recv() holds a socket io-ref, so CPython keeps the
                    # fd open and the client never sees the drop;
                    # shutdown() tears the connection down immediately.
                    conn.shutdown(socket.SHUT_RDWR)
                    conn.close()
                else:
                    pos = self.cut
                    while not self._stop.is_set():
                        if pos >= len(self.payload):
                            pos = 0
                        conn.sendall(self.payload[pos:pos + 65536])
                        pos += 65536
            except OSError:
                pass
        try:
            conn.close()
        except OSError:
            pass

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


def test_reconnect_after_server_drop(u8_capture):
    """Server dies mid-run: with reconnect_timeout_ms the native reader
    retries with backoff, replays the device settings on the new session,
    counts the outage as drops, and the stream resumes
    (rtlsdr-handler.cpp restart plumbing; round-2 verdict item 6)."""
    srv = RestartableRtlTcpServer(u8_capture[:200_000])
    try:
        with RtlTcpSource("127.0.0.1", srv.port, rate=C.INPUT_RATE,
                          reconnect_timeout_ms=10_000) as src:
            src.set_frequency(94_300_000)
            a = src.read_block(50_000, timeout_ms=10_000)
            assert len(a) == 50_000
            b = src.read_block(100_000, timeout_ms=30_000)   # spans the drop
            assert len(b) == 100_000
            assert src.reconnects == 1
            assert src.dropped > 0          # the outage gap is accounted
            assert src.connected
            time.sleep(0.3)
    finally:
        srv.close()
    assert len(srv.sessions) == 2
    s2 = dict(srv.sessions[1])
    # settings replayed on the fresh session: rate then the frequency
    assert s2.get(0x02) == C.INPUT_RATE
    assert s2.get(0x01) == 94_300_000


def test_no_reconnect_without_optin(u8_capture):
    """Default (reconnect_timeout_ms=0): a dead server is EOF, not a retry
    loop — the pre-round-3 contract is preserved."""
    srv = RestartableRtlTcpServer(u8_capture[:200_000])
    try:
        with RtlTcpSource("127.0.0.1", srv.port, rate=C.INPUT_RATE) as src:
            a = src.read_block(60_000, timeout_ms=10_000)
            assert len(a) == 60_000
            b = src.read_block(100_000, timeout_ms=5_000)
            assert len(b) < 100_000         # EOF'd short
            assert src.eof
            assert src.reconnects == 0
    finally:
        srv.close()


def test_cli_device_flags(u8_capture, tmp_path):
    """--gain/--agc/--ppm reach the wire as command frames and the report
    carries the device identity (tuner type/gain count/reconnects)."""
    import json
    from sdrjfm_tpu.app import main

    srv = MockRtlTcpServer(u8_capture, loop=True)
    rep = str(tmp_path / "rep.json")
    try:
        rc = main(["rx", "--iq", f"rtl_tcp://127.0.0.1:{srv.port}",
                   "--tune-hz", "94300000", "--block-fm", "16384",
                   "--gain", "297", "--ppm", "12",
                   "--reconnect-timeout", "5",
                   "--report", rep, "--loop-seconds", "0.5"])
        time.sleep(0.3)
    finally:
        srv.close()
    assert rc == 0
    cmds = dict()
    for c, p in srv.commands:
        cmds.setdefault(c, []).append(p)
    assert cmds[0x05] == [12]                # ppm correction
    assert cmds[0x03] == [1]                 # manual gain mode
    assert cmds[0x04] == [297]               # tuner gain
    assert cmds[0x01] == [94_300_000]
    r = json.load(open(rep))
    assert r["device"] == {"tuner_type": 5, "tuner_gain_count": 29,
                           "reconnects": 0}


def test_device_flags_require_rtltcp(tmp_path):
    from sdrjfm_tpu.app import main

    assert main(["rx", "--iq", "nope.wav", "--gain", "297"]) == 2


def test_control_hw_commands_reach_wire(u8_capture):
    """gain/agc/ppm through the runtime control channel dispatch land on
    the rtl_tcp control plane as the right opcodes."""
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
    from sdrjfm_tpu.runtime.control import CommandProcessor

    srv = MockRtlTcpServer(u8_capture[:20_000], loop=True)
    try:
        with RtlTcpSource("127.0.0.1", srv.port) as src:
            rx = Receiver(ReceiverConfig(block_fm=16384))
            proc = CommandProcessor(rx, None, center_hz=94_300_000,
                                    source=src)
            assert proc._dispatch("gain 297", None) == {"ok": "gain",
                                                        "tenth_db": 297}
            assert proc._dispatch("agc on", None) == {"ok": "agc",
                                                      "active": True}
            assert proc._dispatch("ppm -7", None) == {"ok": "ppm", "ppm": -7}
            src.read_block(5_000, timeout_ms=5000)
            time.sleep(0.3)
    finally:
        srv.close()
    cmds = [(c, p) for c, p in srv.commands if c != 0x02]
    assert (0x03, 1) in cmds and (0x04, 297) in cmds
    assert (0x08, 1) in cmds and (0x03, 0) in cmds
    assert (0x05, 0xFFFFFFF9) in cmds        # -7 as u32 big-endian
