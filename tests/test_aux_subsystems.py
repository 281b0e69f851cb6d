"""Auxiliary subsystems: checkpoint/resume, sources, scopes, station list."""

import numpy as np
import jax.numpy as jnp

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.io.source import SynthSource, WavFileSource, open_source
from sdrjfm_tpu.io.stations import StationList
from sdrjfm_tpu.io.wavio import write_iq_wav
from sdrjfm_tpu.models import scopes
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig, default_controls
from sdrjfm_tpu.runtime.checkpoint import load_state, save_state


def _iq(seconds=1.0, rds_bits=None):
    n = int(seconds * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 1000 * t),
                          0.5 * np.sin(2 * np.pi * 500 * t),
                          synth.MPXParams(), rds_bits=rds_bits)
    return synth.fm_modulate(mpx, C.FM_RATE)


class TestCheckpoint:
    def test_resume_is_bit_exact(self, tmp_path):
        """stop/save/load/continue == uninterrupted run, bit for bit."""
        import jax
        iq = _iq(1.0)
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="block"))
        step = jax.jit(rx.step)
        ctl = default_controls()
        T = rx.cfg.block_in
        nb = len(iq) // T
        # uninterrupted
        s = rx.init_state()
        outs = []
        for b in range(nb):
            s, o = step(s, ctl, jnp.asarray(iq[b * T:(b + 1) * T]))
            outs.append(np.asarray(o.audio))
        # interrupted at the midpoint
        s2 = rx.init_state()
        for b in range(nb // 2):
            s2, o = step(s2, ctl, jnp.asarray(iq[b * T:(b + 1) * T]))
        path = str(tmp_path / "ck.npz")
        save_state(path, s2, {"pos": nb // 2})
        s3, meta = load_state(path, rx.init_state())
        assert meta["pos"] == nb // 2
        outs2 = []
        for b in range(nb // 2, nb):
            s3, o = step(s3, ctl, jnp.asarray(iq[b * T:(b + 1) * T]))
            outs2.append(np.asarray(o.audio))
        np.testing.assert_array_equal(np.concatenate(outs[nb // 2:]),
                                      np.concatenate(outs2))

    def test_config_fingerprint_mismatch(self, tmp_path):
        import pytest
        from sdrjfm_tpu.runtime.checkpoint import CheckpointError
        cfg_a = ReceiverConfig(block_fm=32768, rds="off")
        cfg_b = ReceiverConfig(block_fm=32768, rds="off", deemphasis_us=75.0)
        rx = Receiver(cfg_a)
        path = str(tmp_path / "ck.npz")
        save_state(path, rx.init_state(), cfg=cfg_a)
        load_state(path, rx.init_state(), cfg=cfg_a)   # ok
        with pytest.raises(CheckpointError):
            load_state(path, Receiver(cfg_b).init_state(), cfg=cfg_b)

    def test_v0_checkpoint_still_loads(self, tmp_path):
        """Pre-versioning npz (bare extra dict in __meta__) loads as v0."""
        import jax, json
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="off"))
        state = rx.init_state()
        flat, _ = jax.tree_util.tree_flatten(state)
        arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)}
        arrays["__meta__"] = np.frombuffer(
            json.dumps({"pos": 3}).encode(), dtype=np.uint8)
        path = str(tmp_path / "v0.npz")
        np.savez(path, **arrays)
        s, meta = load_state(path, rx.init_state())
        assert meta["pos"] == 3


class TestSources:
    def test_wav_source_contract(self, tmp_path):
        iq = _iq(0.3)
        path = str(tmp_path / "x.wav")
        write_iq_wav(path, iq, C.INPUT_RATE)
        src = WavFileSource(path)
        assert src.get_rate() == C.INPUT_RATE
        assert src.legal_frequency(94_000_000)
        assert not src.legal_frequency(50_000_000)
        assert src.samples() == len(iq)
        a = src.get_samples(1000)
        b = src.get_samples(1000)
        np.testing.assert_array_equal(a, iq[:1000])
        np.testing.assert_array_equal(b, iq[1000:2000])
        src.reset_buffer()
        np.testing.assert_array_equal(src.get_samples(10), iq[:10])

    def test_wav_source_loop(self, tmp_path):
        iq = _iq(0.1)
        path = str(tmp_path / "x.wav")
        write_iq_wav(path, iq, C.INPUT_RATE)
        src = WavFileSource(path, loop=True)
        got = src.get_samples(len(iq) + 500)
        np.testing.assert_array_equal(got[len(iq):], iq[:500])

    def test_synth_source_stream(self):
        src = SynthSource(seconds_per_chunk=0.2)
        x = src.get_samples(500_000)
        assert len(x) == 500_000
        assert np.abs(np.abs(x) - 1.0).max() < 1e-3   # constant-envelope FM

    def test_factory(self, tmp_path):
        iq = _iq(0.1)
        path = str(tmp_path / "x.wav")
        write_iq_wav(path, iq, C.INPUT_RATE)
        src = open_source(f"file:{path}")
        assert src.samples() == len(iq)


class TestScopes:
    def test_hf_spectrum_peak_at_offset(self):
        n = 2048 * 8
        t = np.arange(n)
        x = np.exp(1j * 2 * np.pi * 0.1 * t).astype(np.complex64)
        s = np.asarray(scopes.spectrum_db(jnp.asarray(x), display_size=512))
        assert s.shape == (512,)
        # tone at +0.1 of fs -> bin 256 + 51
        assert abs(int(np.argmax(s)) - (256 + 51)) <= 1

    def test_constellation_grid(self):
        pts = np.asarray([1 + 0j, -1 + 0j] * 50, np.complex64)
        img = scopes.iq_constellation(pts, extent=4.0)
        assert img.shape == (101, 101)
        assert img.sum() == 100
        assert img[50, 75] == 50 and img[50, 25] == 50

    def test_map_spectrum_matches_reference_fold(self):
        """map_spectrum == a direct port of ls_scope::mapSpectrum
        (ls-scope.cpp:131-176) for every zoom factor, full and half."""
        rng = np.random.default_rng(11)
        D = 64
        bins = (rng.standard_normal(4 * D)
                + 1j * rng.standard_normal(4 * D)).astype(np.complex64)

        def ref_map(inp, display_size, zoom, show_full):
            n = len(inp)
            factor = n // display_size
            factor //= 2
            if factor // zoom >= 1:
                factor //= zoom
                eff = zoom
            else:
                eff = factor
                factor = 1
            out = np.zeros(display_size)
            if show_full:
                for i in range(display_size // 2):
                    out[display_size // 2 + i] = np.mean(
                        np.abs(inp[i * factor:(i + 1) * factor]))
                    out[display_size // 2 - 1 - i] = np.mean(
                        [abs(inp[n - 1 - (i * factor + j)])
                         for j in range(factor)])
            else:
                for i in range(display_size):
                    out[i] = np.mean(
                        np.abs(inp[i * factor:(i + 1) * factor]))
            return out, eff

        for zoom in (1, 2, 4, 99):
            for full in (True, False):
                want, eff_want = ref_map(bins, D, zoom, full)
                got, eff = scopes.map_spectrum(jnp.asarray(bins), D,
                                               zoom, full)
                assert eff == eff_want, (zoom, full)
                np.testing.assert_allclose(np.asarray(got), want,
                                           rtol=1e-5)

    def test_lf_spectrum_zoom_narrows_axis(self):
        n = 2048 * 4
        t = np.arange(n)
        x = np.exp(1j * 2 * np.pi * 0.01 * t).astype(np.complex64)
        xa1, a1, z1 = scopes.lf_spectrum(jnp.asarray(x), 192_000,
                                         display_size=512, zoom_factor=1)
        xa2, a2, z2 = scopes.lf_spectrum(jnp.asarray(x), 192_000,
                                         display_size=512, zoom_factor=2)
        assert z1 == 1 and z2 == 2
        assert xa2.max() == xa1.max() / 2       # zoomed span is halved
        assert a1.shape == a2.shape == (512,)

    def test_rds_input_tap_present(self):
        """The LF scope's RDS_INPUT tap (fm-processor.cpp:566-569): the
        24 kHz decoder input x20, emitted with the other taps."""
        from sdrjfm_tpu.io import synth
        from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
        from sdrjfm_tpu.runtime.stream import run_offline

        n = 2 * 32768
        t = np.arange(n) / C.FM_RATE
        mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700 * t),
                              0.5 * np.sin(2 * np.pi * 300 * t),
                              synth.MPXParams(rds_level=0.08),
                              rds_bits=np.asarray([1, 0] * 40, np.int8))
        iq = synth.fm_modulate(mpx, C.FM_RATE)
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="block",
                                     emit_taps=True))
        res = run_offline(rx, iq, collect_taps=True)
        assert "rds_input" in res.taps
        np.testing.assert_allclose(res.taps["rds_input"],
                                   20.0 * res.taps["rds_baseband"],
                                   rtol=1e-6)


class TestStations:
    def test_roundtrip_and_update(self, tmp_path):
        path = str(tmp_path / "stations.json")
        sl = StationList()
        sl.add("Radio One", 94_300_000, pi_code=0x1234)
        sl.add("Radio Two", 101_100_000)
        sl.add("Radio One Renamed", 94_300_000)        # update, not dup
        sl.save(path)
        sl2 = StationList.load(path)
        assert len(sl2.stations) == 2
        assert sl2.find(94_320_000).name == "Radio One Renamed"
        assert sl2.find(94_300_000).pi_code == 0x1234
        assert sl2.remove(101_100_000)
        assert sl2.find(101_100_000) is None


class TestScanRunner:
    def test_scan_run_matches_block_loop(self):
        """Audio matches at fp-fusion level; RDS decodes to the same groups
        (the bit grid's acquisition argmax is fp-sensitive, so streams may
        carry a one-bit alignment slip — the group decode is the invariant)."""
        from sdrjfm_tpu.rds import encode
        from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
        from sdrjfm_tpu.rds.groups import GroupDecoder
        from sdrjfm_tpu.runtime.stream import run_offline, run_offline_scan

        syms = encode.differential_encode(
            encode.make_bitstream(pi=0x4242, station="SCANRUNR"))
        iq = _iq(2.0, rds_bits=syms)
        rx = Receiver(ReceiverConfig(block_fm=32768, rds="block"))
        loop = run_offline(rx, iq)
        st, outs = run_offline_scan(rx, iq)
        audio = np.asarray(outs.audio).reshape(-1, 2)
        # scan-body fusion differs from the standalone jit at fp level only
        np.testing.assert_allclose(audio, loop.audio, atol=1e-5)

        def decode(bits):
            sync, dec, grp = BlockSynchronizer(), GroupDecoder(), Group()
            sync.push_bits(bits, grp, on_group=dec.decode)
            return sync, dec.result

        counts = np.asarray(outs.rds.count)
        bits = np.asarray(outs.rds.bits)
        collected = np.concatenate([bits[b, :counts[b]]
                                    for b in range(len(counts))])
        s1, r1 = decode(collected)
        s2, r2 = decode(loop.rds_bits)
        assert r1.pi_code == r2.pi_code == 0x4242
        assert r1.station_label == r2.station_label == "SCANRUNR"
        assert s1.groups_decoded > 10 and s2.groups_decoded > 10


class TestWavFormats:
    def test_pcm16_roundtrip(self, tmp_path):
        from sdrjfm_tpu.io.wavio import read_wav, write_wav
        x = (np.sin(np.linspace(0, 20, 4800))[:, None]
             * np.asarray([[0.5, -0.25]])).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x, 48000, float32=False)
        y, info = read_wav(p)
        assert (info.rate, info.channels, info.fmt) == (48000, 2, 1)
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    def test_float32_roundtrip(self, tmp_path):
        from sdrjfm_tpu.io.wavio import read_wav, write_wav
        x = np.random.default_rng(0).standard_normal((1000, 1)).astype(np.float32)
        p = str(tmp_path / "b.wav")
        write_wav(p, x, 192000, float32=True)
        y, info = read_wav(p)
        assert info.fmt == 3 and info.rate == 192000
        np.testing.assert_array_equal(y, x)

    def test_pcm24_read(self, tmp_path):
        """Hand-built 24-bit PCM file reads correctly."""
        import struct
        vals = np.asarray([0, 1 << 22, -(1 << 22), (1 << 23) - 1], np.int64)
        payload = b""
        for v in vals:
            u = int(v) & 0xFFFFFF
            payload += struct.pack("<I", u)[:3]
        hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000,
                                     48000 * 3, 3, 24)
        hdr += b"data" + struct.pack("<I", len(payload))
        p = str(tmp_path / "c.wav")
        open(p, "wb").write(hdr + payload)
        from sdrjfm_tpu.io.wavio import read_wav
        y, info = read_wav(p)
        assert info.sampwidth == 3
        np.testing.assert_allclose(
            y[:, 0], vals / (1 << 23), atol=1e-6)
