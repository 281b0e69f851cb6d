"""Multi-chip sharding: the 8-way time-sharded step must be bit-exact vs 1-chip."""

import numpy as np
import jax
import jax.numpy as jnp

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig, default_controls
from sdrjfm_tpu.parallel.sharding import ShardedReceiver, make_mesh


def _make_iq(blocks, cfg):
    n_fm = cfg.block_fm * blocks
    t = np.arange(n_fm) / C.FM_RATE
    left = 0.7 * np.sin(2 * np.pi * 1000.0 * t)
    right = 0.4 * np.sin(2 * np.pi * 3000.0 * t)
    mpx = synth.synth_mpx(left, right, synth.MPXParams())
    return synth.fm_modulate(mpx, C.FM_RATE)[: cfg.block_in * blocks]


def test_sharded_step_bitexact_vs_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = ReceiverConfig(block_fm=16384, rds="block")
    rx = Receiver(cfg)
    iq = _make_iq(2, cfg)
    controls = default_controls()

    # single device
    step1 = jax.jit(rx.step)
    s1 = rx.init_state()
    outs1 = []
    for b in range(2):
        s1, o = step1(s1, controls,
                      jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in]))
        outs1.append(o)

    # 8-way time mesh
    mesh = make_mesh(8)
    srx = ShardedReceiver(rx, mesh)
    s8 = srx.init_state()
    outs8 = []
    for b in range(2):
        s8, o = srx.step(s8, controls,
                         jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in]))
        outs8.append(o)

    for o1, o8 in zip(outs1, outs8):
        np.testing.assert_array_equal(np.asarray(o1.audio),
                                      np.asarray(o8.audio))
        np.testing.assert_array_equal(np.asarray(o1.rds.bits),
                                      np.asarray(o8.rds.bits))
        assert int(o1.rds.count) == int(o8.rds.count)


def test_dryrun_multichip_entry():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_fully_sharded_step_equivalent():
    """Front end + fm chain both sharded (8-way): audio numerically matches
    the single-chip run and the RDS stream decodes to the same groups."""
    from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver
    from sdrjfm_tpu.rds import encode
    from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
    from sdrjfm_tpu.rds.groups import GroupDecoder

    cfg = ReceiverConfig(block_fm=32768, rds="block", audio_filter_hz=15000)
    rx = Receiver(cfg)
    name_bits = []
    for _ in range(30):                      # name-heavy stream: 0A groups only
        for seg in range(4):
            name_bits.extend(encode.group_0a(0x7777, 10, seg,
                                             "FULSHARD"[2 * seg:2 * seg + 2]))
    syms = encode.differential_encode(np.asarray(name_bits, np.int8))
    n_fm = cfg.block_fm * 10
    t = np.arange(n_fm) / C.FM_RATE
    mpx = synth.synth_mpx(0.7 * np.sin(2 * np.pi * 1000.0 * t),
                          0.3 * np.sin(2 * np.pi * 2500.0 * t),
                          synth.MPXParams(rds_level=0.08), rds_bits=syms)
    iq = synth.fm_modulate(mpx, C.FM_RATE)[: cfg.block_in * 10]
    controls = default_controls()

    step1 = jax.jit(rx.step)
    s1 = rx.init_state()
    srx = FullyShardedReceiver(rx, make_mesh(8))
    s8 = srx.init_state()

    audio1, audio8, bits1, bits8 = [], [], [], []
    for b in range(10):
        blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
        s1, o1 = step1(s1, controls, blk)
        s8, o8 = srx.step(s8, controls, blk)
        audio1.append(np.asarray(o1.audio))
        audio8.append(np.asarray(o8.audio))
        bits1.append(np.asarray(o1.rds.bits)[: int(o1.rds.count)])
        bits8.append(np.asarray(o8.rds.bits)[: int(o8.rds.count)])

    a1 = np.concatenate(audio1)
    a8 = np.concatenate(audio8)
    np.testing.assert_allclose(a8, a1, atol=2e-4)

    def decode(bits):
        sync, dec, grp = BlockSynchronizer(), GroupDecoder(), Group()
        sync.push_bits(np.concatenate(bits), grp, on_group=dec.decode)
        return sync, dec.result

    sy1, r1 = decode(bits1)
    sy8, r8 = decode(bits8)
    assert r1.pi_code == r8.pi_code == 0x7777
    assert r1.station_label == r8.station_label == "FULSHARD"
    assert sy8.groups_decoded > 10


def test_fully_sharded_squelch_tone_upsample_equivalent():
    """The last three stages to be sharded — noise squelch, test tone, and
    the 192 kHz audio upsampler — must match the single-chip run."""
    from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver
    cfg = ReceiverConfig(block_fm=65536, rds="off", squelch="nsq",
                         test_tone=True, audio_rate=192000,
                         audio_filter_hz=15000)
    rx = Receiver(cfg)
    iq = _make_iq(4, cfg)
    controls = default_controls()._replace(
        squelch_level=jnp.asarray(30.0, jnp.float32))

    step1 = jax.jit(rx.step)
    s1 = rx.init_state()
    srx = FullyShardedReceiver(rx, make_mesh(8))
    s8 = srx.init_state()
    for b in range(4):
        blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
        s1, o1 = step1(s1, controls, blk)
        s8, o8 = srx.step(s8, controls, blk)
        np.testing.assert_allclose(np.asarray(o8.audio),
                                   np.asarray(o1.audio), atol=5e-4)
    assert bool(s8.squelch.suppress) == bool(s1.squelch.suppress)
    assert int(s8.tone_index) == int(s1.tone_index)


def test_fully_sharded_level_squelch_equivalent():
    from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver
    cfg = ReceiverConfig(block_fm=65536, rds="off", squelch="lsq")
    rx = Receiver(cfg)
    iq = _make_iq(3, cfg)
    controls = default_controls()._replace(
        squelch_level=jnp.asarray(60.0, jnp.float32))
    step1 = jax.jit(rx.step)
    s1 = rx.init_state()
    srx = FullyShardedReceiver(rx, make_mesh(8))
    s8 = srx.init_state()
    for b in range(3):
        blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
        s1, o1 = step1(s1, controls, blk)
        s8, o8 = srx.step(s8, controls, blk)
        np.testing.assert_allclose(np.asarray(o8.audio),
                                   np.asarray(o1.audio), atol=5e-4)
    assert bool(s8.squelch.suppress) == bool(s1.squelch.suppress)


def test_fully_sharded_pll_and_difference_decoders():
    """The last two discriminators to be sharded: `pll` (distributed-prefix
    one-pole) and `difference` (2-sample ppermute halo) must match the
    single-chip run."""
    import pytest
    from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver
    for dec, atol in (("pll", 5e-4), ("difference", 5e-4)):
        cfg = ReceiverConfig(block_fm=32768, rds="off", decoder=dec,
                             audio_filter_hz=15000)
        rx = Receiver(cfg)
        iq = _make_iq(3, cfg)
        controls = default_controls()
        step1 = jax.jit(rx.step)
        s1 = rx.init_state()
        srx = FullyShardedReceiver(rx, make_mesh(8))
        s8 = srx.init_state()
        for b in range(3):
            blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
            s1, o1 = step1(s1, controls, blk)
            s8, o8 = srx.step(s8, controls, blk)
            np.testing.assert_allclose(np.asarray(o8.audio),
                                       np.asarray(o1.audio), atol=atol,
                                       err_msg=dec)
        np.testing.assert_allclose(np.asarray(s8.demod.prev2),
                                   np.asarray(s1.demod.prev2), atol=1e-6)
        np.testing.assert_allclose(float(s8.demod.pll_incr),
                                   float(s1.demod.pll_incr), atol=1e-5)


def test_fully_sharded_am_decoder_equivalent():
    """Sharded AM path matches single-chip (guards the stream-tail carry)."""
    from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver
    cfg = ReceiverConfig(block_fm=32768, rds="off", decoder="am", mode="mono",
                         audio_filter_hz=15000)
    rx = Receiver(cfg)
    n = cfg.block_in * 3
    t = np.arange(n) / C.INPUT_RATE
    iq = (0.3 * (1.0 + 0.5 * np.sin(2 * np.pi * 1000.0 * t))
          ).astype(np.complex64)
    controls = default_controls()
    step1 = jax.jit(rx.step)
    s1 = rx.init_state()
    srx = FullyShardedReceiver(rx, make_mesh(8))
    s8 = srx.init_state()
    for b in range(3):
        blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
        s1, o1 = step1(s1, controls, blk)
        s8, o8 = srx.step(s8, controls, blk)
        np.testing.assert_allclose(np.asarray(o8.audio),
                                   np.asarray(o1.audio), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s8.demod.prev1),
                               np.asarray(s1.demod.prev1), atol=1e-6)


def test_station_time_2d_mesh_matches_vmap():
    """BOTH parallel axes at once: Mesh(2 station groups x 4-way time).
    Station axis is collective-free; each station's chain runs the
    fully-sharded time decomposition — per-station outputs numerically
    equivalent to the plain vmap, RDS bit-exact."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sdrjfm_tpu.models.multistation import MultiStationReceiver
    from sdrjfm_tpu.models.receiver import Receiver, ReceiverConfig
    from sdrjfm_tpu.parallel.sharding import (StationTimeShardedReceiver,
                                              make_mesh_2d)

    cfg = ReceiverConfig(block_fm=32768, rds="block", audio_filter_hz=15000)
    rx = Receiver(cfg)
    st2 = StationTimeShardedReceiver(rx, make_mesh_2d(2, 4))
    vm = MultiStationReceiver(rx)
    offsets = [-500_000, 400_000]
    rng = np.random.default_rng(3)
    n = 3 * cfg.block_in
    iq = (np.exp(1j * 0.2 * np.arange(n))
          + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)

    s_states = st2.init_states(2)
    v_states = vm.init_states(2)
    controls_s = st2.controls_for(offsets)
    controls_v = vm.controls_for(offsets)
    for b in range(3):
        blk = jnp.asarray(iq[b * cfg.block_in:(b + 1) * cfg.block_in])
        s_states, s_out = st2.step(s_states, controls_s, blk)
        v_states, v_out = vm.step(v_states, controls_v, blk)
        np.testing.assert_allclose(np.asarray(s_out.audio),
                                   np.asarray(v_out.audio), atol=5e-4)
        np.testing.assert_array_equal(np.asarray(s_out.rds.count),
                                      np.asarray(v_out.rds.count))
        np.testing.assert_array_equal(np.asarray(s_out.rds.bits),
                                      np.asarray(v_out.rds.bits))
