"""Reference-parity per-sample RDS decoders decode a synthetic baseband."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io.synth import rds_baseband
from sdrjfm_tpu.rds import encode, scan_decoders as SD
from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
from sdrjfm_tpu.rds.groups import GroupDecoder


@pytest.fixture(scope="module")
def baseband24k():
    """Clean complex RDS baseband at 24 kS/s with a known bitstream."""
    data_bits = encode.make_bitstream(pi=0x1234, station="SCANDEC ",
                                      repeats=3)
    syms = encode.differential_encode(data_bits)
    n = int(6.0 * C.RDS_RATE)
    bb = rds_baseband(syms, n, C.RDS_RATE)
    # small constant rotation: the decoders' Costas must absorb it
    z = (bb * np.exp(1j * 0.4)).astype(np.complex64)
    return jnp.asarray(z), data_bits


def _decode_groups(bits):
    sync = BlockSynchronizer()
    dec = GroupDecoder()
    grp = Group()
    sync.push_bits(bits, grp, on_group=dec.decode)
    return sync, dec.result


@pytest.mark.parametrize("which", ["1", "2", "3"])
def test_scan_decoder_recovers_groups(baseband24k, which):
    z, _ = baseband24k
    if which == "1":
        cfg = SD.make_decoder1_config()
        bits, mask, _, _ = SD.decoder1_block(z, cfg,
                                             SD.decoder1_zero_state(cfg))
    elif which == "2":
        cfg = SD.make_decoder2_config()
        bits, mask, _, _ = SD.decoder2_block(z, cfg,
                                             SD.decoder2_zero_state(cfg))
    else:
        cfg = SD.make_decoder3_config()
        bits, mask, _, _ = SD.decoder3_block(z, cfg,
                                             SD.decoder3_zero_state(cfg))
    got = np.asarray(bits)[np.asarray(mask)]
    # expect roughly bitclock-rate output
    assert abs(len(got) - 6.0 * C.RDS_BITCLK_HZ) < 0.05 * 6 * C.RDS_BITCLK_HZ, \
        len(got)
    sync, res = _decode_groups(got)
    assert sync.groups_decoded > 30, (which, sync.groups_decoded,
                                      sync.num_sync_errors)
    assert res.pi_code == 0x1234
    assert res.station_label == "SCANDEC "


def test_decoder3_resync_feedback_recovers_clock():
    """rds-decoder-3.cpp:94-99: when the block synchronizer accumulates >3
    sync errors the decoder must re-acquire its bit clock.  Inject a
    quarter-bit clock-phase jump mid-stream (cut 5 of ~20.2 samples/bit, so
    the integrate-and-dump windows straddle the biphase symbol transitions;
    a half-bit jump is transparent — the inverted bits cancel in the
    differential decode); without the feedback the decoder never recovers;
    with it (LiveRDSDecoder.feed -> need_resync) group decoding resumes."""
    from sdrjfm_tpu.rds.live import LiveRDSDecoder

    data_bits = encode.make_bitstream(pi=0x3C3C, station="RESYNC  ",
                                      repeats=16)
    syms = encode.differential_encode(data_bits)
    n = int(20.0 * C.RDS_RATE)
    bb = rds_baseband(syms, n, C.RDS_RATE).astype(np.complex64)
    cut = n // 4
    z = np.concatenate([bb[:cut], bb[cut + 5:]])  # ~quarter-bit phase jump
    nblk = 16
    z = z[: (len(z) // nblk) * nblk]
    blocks = z.reshape(nblk, -1)

    cfg = SD.make_decoder3_config()

    def run(with_feedback):
        st = SD.decoder3_zero_state(cfg)
        live = LiveRDSDecoder()
        groups_per_block = []
        for b in range(nblk):
            bits, mask, _, st = SD.decoder3_block(jnp.asarray(blocks[b]),
                                                  cfg, st)
            got = np.asarray(bits)[np.asarray(mask)]
            before = live.sync.groups_decoded
            resync = live.feed(got)
            if with_feedback and resync:
                st = st._replace(need_resync=jnp.asarray(True))
            groups_per_block.append(live.sync.groups_decoded - before)
        return live, groups_per_block

    live_fb, per_fb = run(True)
    live_no, per_no = run(False)
    # both decode cleanly before the jump (blocks 0-3)
    assert sum(per_fb[:4]) > 40 and sum(per_no[:4]) > 40
    # without feedback the clock stays lost after the jump (the stray group
    # is a chance 4-block syndrome alignment in the garbage bits)
    assert sum(per_no[6:]) <= 2, per_no
    # with feedback: sync errors accumulate (~1.5/block of garbage — the
    # sliding block-A search is uncounted), the >3 threshold fires, and a
    # re-acquisition attempt succeeds (each attempt has ~50% polarity odds,
    # like the reference's; it retries until groups flow again)
    assert sum(per_fb[8:]) > 80, per_fb
    assert live_fb.resyncs_requested >= 1
    assert live_fb.result.pi_code == 0x3C3C


def test_request_rds_resync_flag():
    """Receiver.request_rds_resync arms decoder-3's need_resync and is a
    no-op for the continuously-adaptive decoders."""
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig

    rx3 = Receiver(ReceiverConfig(block_fm=32768, rds="scan3"))
    st = rx3.init_state()
    st = st._replace(bitrec=st.bitrec._replace(
        need_resync=jnp.asarray(False)))
    st2 = rx3.request_rds_resync(st)
    assert bool(st2.bitrec.need_resync)

    rxb = Receiver(ReceiverConfig(block_fm=32768, rds="block"))
    stb = rxb.init_state()
    assert rxb.request_rds_resync(stb) is stb


def test_receiver_with_scan_decoder_mode():
    """Full chain with rds='scan2' (reference M&M algorithm) decodes groups."""
    from sdrjfm_tpu.io import synth
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
    from sdrjfm_tpu.runtime.stream import run_offline

    data_bits = encode.make_bitstream(pi=0x5678, station="SCANMODE")
    syms = encode.differential_encode(data_bits)
    n = int(4.0 * C.FM_RATE)
    t = np.arange(n) / C.FM_RATE
    l = r = 0.3 * np.sin(2 * np.pi * 700.0 * t)
    mpx = synth.synth_mpx(l, r, synth.MPXParams(rds_level=0.08),
                          rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)
    rx = Receiver(ReceiverConfig(block_fm=32768, rds="scan2"))
    res = run_offline(rx, iq, drop_blocks=3)
    sync, result = _decode_groups(res.rds_bits)
    assert sync.groups_decoded > 15, (sync.groups_decoded,
                                      sync.num_sync_errors)
    assert result.pi_code == 0x5678
    assert result.station_label == "SCANMODE"
