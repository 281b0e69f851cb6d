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
        bits, mask, _ = SD.decoder1_block(z, cfg, SD.decoder1_zero_state(cfg))
    elif which == "2":
        cfg = SD.make_decoder2_config()
        bits, mask, _ = SD.decoder2_block(z, cfg, SD.decoder2_zero_state(cfg))
    else:
        cfg = SD.make_decoder3_config()
        bits, mask, _ = SD.decoder3_block(z, cfg, SD.decoder3_zero_state(cfg))
    got = np.asarray(bits)[np.asarray(mask)]
    # expect roughly bitclock-rate output
    assert abs(len(got) - 6.0 * C.RDS_BITCLK_HZ) < 0.05 * 6 * C.RDS_BITCLK_HZ, \
        len(got)
    sync, res = _decode_groups(got)
    assert sync.groups_decoded > 30, (which, sync.groups_decoded,
                                      sync.num_sync_errors)
    assert res.pi_code == 0x1234
    assert res.station_label == "SCANDEC "


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
