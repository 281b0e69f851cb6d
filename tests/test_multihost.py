"""Multi-host ingest utilities on the single-process 8-device CPU mesh.

`global_iq_block` + `FullyShardedReceiver` is the multi-host recipe
(parallel/multihost.py); with process_count == 1 the same code path runs
here and must be bit-identical to staging the block directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.io import synth
from sdrjfm_tpu.models.receiver import (Receiver, ReceiverConfig,
                                        default_controls)
from sdrjfm_tpu.parallel import multihost as MH
from sdrjfm_tpu.parallel.sharding import FullyShardedReceiver, make_mesh

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def test_host_slice_partition():
    starts = [MH.host_slice(1024, pi, 4) for pi in range(4)]
    assert starts == [(0, 256), (256, 512), (512, 768), (768, 1024)]
    with pytest.raises(AssertionError):
        MH.host_slice(1000, 0, 3)


@needs_mesh
def test_global_block_feeds_sharded_receiver():
    rx = Receiver(ReceiverConfig(block_fm=32768, rds="block",
                                 iq_format="i16"))
    n = rx.cfg.block_in
    t = np.arange(rx.cfg.block_fm) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 700 * t),
                          0.5 * np.sin(2 * np.pi * 300 * t),
                          synth.MPXParams())
    iq = synth.fm_modulate(mpx, C.FM_RATE)[:n]
    i16 = synth.iq_to_i16(iq)

    mesh = MH.make_global_mesh()
    lo, hi = MH.host_slice(n)
    assert (lo, hi) == (0, n)          # single process holds everything
    gblk = MH.global_iq_block(i16[lo:hi], mesh)
    assert gblk.shape == (n, 2)
    assert len(gblk.sharding.device_set) == len(jax.devices())

    srx = FullyShardedReceiver(rx, mesh)
    st = srx.init_state()
    st, out = srx._step(st, default_controls(), gblk)

    st1 = rx.init_state()
    st1, out1 = rx.jit_step()(st1, default_controls(), jnp.asarray(i16))
    np.testing.assert_allclose(np.asarray(out.audio), np.asarray(out1.audio),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out.rds.bits),
                                  np.asarray(out1.rds.bits))
