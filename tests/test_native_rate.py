"""Device-native input rates (the reference device zoo's rate negotiation).

The airspy/hackrf/lime handlers convert their native rates to 2.304 MS/s
with a per-millisecond linear-interpolation mapTable
(airspy-handler.cpp:118-127, conversion loop :281-305, convBuffer[0]
hand-over :299-303).  `ops.blockops.rate_map_linear` is the block-batched
equivalent with exact integer positions; `ReceiverConfig.native_rate`
inserts it after the wire conversion so captures from any SDR feed the
chain.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
from sdrjfm_tpu.ops import blockops as B
from sdrjfm_tpu.rds import encode
from sdrjfm_tpu.runtime.stream import run_offline


def _lerp_reference(x, num, den, n_out, prev):
    """Direct per-sample port of the reference's mapTable interpolation."""
    xx = np.concatenate([[prev], x])
    out = np.empty(n_out, x.dtype)
    for j in range(n_out):
        pos = j * num
        base, rem = divmod(pos, den)
        f = rem / den
        out[j] = xx[base] * (1.0 - f) + xx[base + 1] * f
    return out, x[-1]


def test_rate_map_matches_reference_port_and_stitches():
    rng = np.random.default_rng(5)
    num, den = 625, 576                   # 2.5 MS/s -> 2.304 MS/s
    n_out = 2 * 576 * 8
    t_in = n_out * num // den
    x = (rng.normal(size=2 * t_in) + 1j * rng.normal(size=2 * t_in)
         ).astype(np.complex64)
    want1, c = _lerp_reference(x[:t_in], num, den, n_out, 0.0 + 0.0j)
    want2, _ = _lerp_reference(x[t_in:], num, den, n_out, c)

    carry = jnp.asarray(0.0 + 0.0j, jnp.complex64)
    got1, carry = B.rate_map_linear(jnp.asarray(x[:t_in]), num, den,
                                    n_out, carry)
    got2, _ = B.rate_map_linear(jnp.asarray(x[t_in:]), num, den,
                                n_out, carry)
    np.testing.assert_allclose(np.asarray(got1), want1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-6)
    # block-split == whole-array (the carry contract)
    gotw, _ = B.rate_map_linear(jnp.asarray(x), num, den, 2 * n_out,
                                jnp.asarray(0.0 + 0.0j, jnp.complex64))
    np.testing.assert_allclose(np.asarray(gotw),
                               np.concatenate([want1, want2]), atol=1e-6)


def test_upsampling_direction_too():
    """A sub-2.304 native rate (e.g. 2.048 MS/s SDRs) interpolates up."""
    rng = np.random.default_rng(6)
    num, den = 8, 9                       # 2.048 -> 2.304
    n_out = 9 * 512
    t_in = n_out * num // den
    x = rng.normal(size=t_in).astype(np.float32)
    want, _ = _lerp_reference(x, num, den, n_out, np.float32(0))
    got, _ = B.rate_map_linear(jnp.asarray(x), num, den, n_out,
                               jnp.asarray(0.0, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_receiver_decodes_airspy_rate_capture(tmp_path):
    """End-to-end: a 2.5 MS/s capture (scipy-resampled from the oracle)
    through `--input-rate 2500000` decodes PI/station with clean audio."""
    from scipy import signal

    bits = encode.make_bitstream(pi=0xA5A5, station="AIRSPYRX", repeats=6)
    syms = encode.differential_encode(bits)
    n = int(3.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700.0 * t),
                          0.5 * np.sin(2 * np.pi * 300.0 * t),
                          synth.MPXParams(rds_level=0.08), rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)          # 2.304 MS/s complex
    # independent high-quality resample to the device-native 2.5 MS/s
    # (polyphase 625/576) — the "capture" an airspy would have delivered
    iq_native = signal.resample_poly(iq, 625, 576).astype(np.complex64)

    cfg = ReceiverConfig(block_fm=12288, rds="block",
                         native_rate=2_500_000)
    rx = Receiver(cfg)
    assert cfg.wire_len == cfg.block_in * 625 // 576
    res = run_offline(rx, iq_native, drop_blocks=8)

    from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
    from sdrjfm_tpu.rds.groups import GroupDecoder
    sync = BlockSynchronizer()
    dec = GroupDecoder()
    sync.push_bits(res.rds_bits, Group(), on_group=dec.decode)
    assert sync.groups_decoded > 20, (sync.groups_decoded,
                                      sync.num_sync_errors)
    assert dec.result.pi_code == 0xA5A5
    assert dec.result.station_label == "AIRSPYRX"
    # stereo audio present and sane
    rms = float(np.sqrt((res.audio ** 2).mean()))
    assert 0.15 < rms < 0.9, rms


def test_cli_input_rate_flag(tmp_path):
    """`rx --input-rate` drives the adapter from a raw i16 capture."""
    import json
    from scipy import signal
    from sdrjfm_tpu.app import main

    n = int(2.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    bits = encode.make_bitstream(pi=0x7777, station="RATECAPT", repeats=4)
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 900.0 * t),
                          0.5 * np.sin(2 * np.pi * 440.0 * t),
                          synth.MPXParams(rds_level=0.08),
                          rds_bits=encode.differential_encode(bits))
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    iq_native = signal.resample_poly(iq, 625, 576)
    raw = str(tmp_path / "native.iq")
    synth.iq_to_i16(iq_native).tofile(raw)

    report = str(tmp_path / "r.json")
    rc = main(["rx", "--iq", raw, "--iq-format", "i16",
               "--input-rate", "2500000", "--block-fm", "12288",
               "--rds", "--report", report])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["rds"]["pi_code"] == "0x7777"
    assert rep["rds"]["station_label"] == "RATECAPT"


def test_bad_block_geometry_is_a_clean_error():
    with pytest.raises(AssertionError):
        Receiver(ReceiverConfig(block_fm=131072, rds="block",
                                native_rate=2_500_000))


def test_live_streaming_at_native_rate(tmp_path):
    """The live runner streams a native-rate raw capture through the
    adapter bit-identically to the offline run (the carry contract holds
    on the ring path; pacing/accounting use wire_rate)."""
    from scipy import signal
    from sdrjfm_tpu.runtime.stream import run_live, run_offline

    n = int(1.5 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 800.0 * t),
                          0.5 * np.sin(2 * np.pi * 333.0 * t),
                          synth.MPXParams())
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    i16 = synth.iq_to_i16(signal.resample_poly(iq, 625, 576))
    raw = str(tmp_path / "native.iq")
    i16.tofile(raw)

    cfg = ReceiverConfig(block_fm=12288, rds="block", iq_format="i16",
                         native_rate=2_500_000)
    rx = Receiver(cfg)
    ref = run_offline(rx, i16)
    try:
        from sdrjfm_tpu.runtime.native_source import NativeRawSource
    except Exception:
        pytest.skip("native toolchain unavailable")
    with NativeRawSource(raw, fmt="i16", rate=cfg.wire_rate,
                         pace=False) as src:
        assert src.rate == 2_500_000
        live = run_live(rx, src)
    assert live.dropped_total == 0
    assert len(live.meta) == len(ref.meta)
    np.testing.assert_array_equal(live.audio, ref.audio)
    np.testing.assert_array_equal(live.rds_bits, ref.rds_bits)
