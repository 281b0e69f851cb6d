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
