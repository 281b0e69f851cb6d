"""Pallas fused front-end kernel: gains + DC + LO mix + ÷12 in one HBM pass.

The XLA front end materialises the mixed 2.304 MS/s stream in HBM between the
elementwise stage and the decimating convolution (~3 extra full-rate array
round-trips per block).  This kernel keeps each input tile in VMEM through
the whole front end:

    tile DMA (HBM->VMEM) -> gains/DC -> exact integer-NCO mix -> composite
    307-tap polyphase ÷12 -> 1/12-rate output tile

The NCO uses the same base-512 modular-digit arithmetic as
`blockops.oscillator_phases` (phase exact for unbounded streams, all int32
products < 2^31).  The composite kernel and output alignment are identical
to `fir_decimate(x, k_decim12, 12)`: y[g] = sum_k hc[k] * s[12g+11-k].

Complex data travels as separate float32 planes (the axon backend dislikes
eager complex buffers, and planar f32 is the natural VMEM layout anyway).

STATUS: semantics validated in interpret mode (tests/test_pallas_frontend.py);
the Mosaic TPU lowering rejects the kernel's 1-D->2-D vector reshapes
("infer-vector-layout: unsupported shape cast").  Re-probed round 3
(2026-08-20) and round 4 (2026-08-21): still blocked — the tunnel's remote
tpu_compile_helper exits 1 (MosaicError, details scrubbed server-side;
/tmp/pallas_probe logs), so non-interpret compilation remains unavailable
on this runtime.  Engineering analysis of the
fix options (kept here so the next perf round doesn't re-derive it):

  * phase-major layout [12, T/12]: makes the polyphase rows lane-aligned and
    the NCO expressible trig-free via modular-digit factor tables
    (e^{-j th} = t0 * A[m mod 512] * B[m//512] * R[p], each a small table or
    per-row scalar), BUT requires an XLA transpose into the kernel and a
    12-row partial-sum array out of it — ~25 MB extra HBM per block, which
    cancels the fused kernel's ~30 MB saving.  Net zero.
  * time-major with in-kernel relayout (99,128)->(1056,12): blocked on the
    Mosaic shape-cast limitation.
  * strided/column DMA per phase: 4-byte DMA granularity, unusable.

Conclusion: on v5e the XLA composite ÷12 path is already within ~2x of the
input-read roofline, and a Pallas win needs Mosaic relayout support; the
production front end stays models/receiver.py's XLA path.  The kernel and
its interpret-mode tests remain as the validated starting point.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_OUT = 1024                    # 192k-rate samples per grid step
TILE_IN = 12 * TILE_OUT            # 12288
TILE_READ = TILE_IN + 384          # halo window (307-tap kernel needs 318)
NCO_BASE = 512


def _weight_table(hc: np.ndarray) -> np.ndarray:
    """w[r, p] = hc[317 - 12r - p] (0 outside [0, 306]) for the rows view."""
    assert len(hc) == 307
    w = np.zeros((27, 12), np.float32)
    for r in range(27):
        for p in range(12):
            k = 317 - 12 * r - p
            if 0 <= k <= 306:
                w[r, p] = hc[k]
    return w


def _kernel(scalars_ref, xr_ref, xi_ref, w_ref, yr_ref, yi_ref,
            xr_v, xi_v, sem, *, q: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    # scalars: [f_c0, f_c1, f_c2, n0c, 0, 0] int32  |  [dcr, dci, lg, rg] f32
    c0 = scalars_ref[0]
    c1 = scalars_ref[1]
    c2 = scalars_ref[2]
    n0c = scalars_ref[3]

    cp_r = pltpu.make_async_copy(xr_ref.at[pl.ds(i * TILE_IN, TILE_READ)],
                                 xr_v, sem.at[0])
    cp_i = pltpu.make_async_copy(xi_ref.at[pl.ds(i * TILE_IN, TILE_READ)],
                                 xi_v, sem.at[1])
    cp_r.start()
    cp_i.start()

    # tile start phase index: (n0c + i*TILE_IN) mod q, then t0 = (f*start)%q
    start = (n0c + i * TILE_IN) % q
    a0 = start % NCO_BASE
    a1 = (start // NCO_BASE) % NCO_BASE
    a2 = start // (NCO_BASE * NCO_BASE)
    t0 = ((a0 * c0) % q + (a1 * c1) % q) % q
    t0 = (t0 + (a2 * c2) % q) % q

    # per-sample phase index over the (99, 128) view of the tile window
    j = (jax.lax.broadcasted_iota(jnp.int32, (99, 128), 0) * 128
         + jax.lax.broadcasted_iota(jnp.int32, (99, 128), 1))
    d0 = j % NCO_BASE
    d1 = j // NCO_BASE                      # < 25
    t = ((d0 * c0) % q + (d1 * c1) % q) % q
    t = (t + t0) % q
    ph = t.astype(jnp.float32) * np.float32(2.0 * np.pi / q)
    c = jnp.cos(ph)
    s = jnp.sin(ph)

    cp_r.wait()
    cp_i.wait()

    dcr = scalars_ref[4].astype(jnp.float32) * np.float32(2**-16)
    dci = scalars_ref[5].astype(jnp.float32) * np.float32(2**-16)
    lg = scalars_ref[6].astype(jnp.float32) * np.float32(2**-16)
    rg = scalars_ref[7].astype(jnp.float32) * np.float32(2**-16)

    xr = xr_v[:].reshape(99, 128) * lg - dcr
    xi = xi_v[:].reshape(99, 128) * rg - dci
    # mix with e^{-j ph}
    mr = xr * c + xi * s
    mi = xi * c - xr * s

    rows_r = mr.reshape(1056, 12)
    rows_i = mi.reshape(1056, 12)
    acc_r = jnp.zeros((TILE_OUT, 12), jnp.float32)
    acc_i = jnp.zeros((TILE_OUT, 12), jnp.float32)
    for r in range(27):
        wrow = w_ref[r, :][None, :]
        acc_r = acc_r + rows_r[r : r + TILE_OUT, :] * wrow
        acc_i = acc_i + rows_i[r : r + TILE_OUT, :] * wrow
    yr_ref[:, :] = jnp.sum(acc_r, axis=1).reshape(8, 128)
    yi_ref[:, :] = jnp.sum(acc_i, axis=1).reshape(8, 128)


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def _frontend_call(xr_pad, xi_pad, w, scalars, rate: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = (xr_pad.shape[0] - 384) // TILE_IN
    kern = functools.partial(_kernel, q=rate)
    yr, yi = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_READ,), jnp.float32),
            pltpu.VMEM((TILE_READ,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scalars, xr_pad, xi_pad, w)
    return yr.reshape(-1), yi.reshape(-1)


class PallasFrontend:
    """Fused gains+DC+mix+÷12 front end.

    Drop-in alternative to the XLA composite path for the single-chip hot
    loop (numerically equivalent within fp32 reassociation; tests compare
    against `fir_decimate`).
    """

    def __init__(self, hc: np.ndarray, rate: int, interpret: bool = False):
        assert len(hc) == 307, "composite ÷12 kernel must be 307 taps"
        self.w = jnp.asarray(_weight_table(np.asarray(hc, np.float64)))
        self.rate = int(rate)
        self.interpret = interpret

    def __call__(self, xr, xi, *, lo_freq, n0_mod, dc_r, dc_i,
                 lgain, rgain, carry_r, carry_i):
        """xr/xi: [T] f32 planes (T % 12288 == 0); carry: [306] f32 planes.

        Returns (yr, yi [T/12], new_carry_r, new_carry_i).
        """
        T = xr.shape[0]
        assert T % TILE_IN == 0
        q = self.rate
        pad = 384 - 306
        xr_pad = jnp.concatenate([carry_r, xr, jnp.zeros(pad, jnp.float32)])
        xi_pad = jnp.concatenate([carry_i, xi, jnp.zeros(pad, jnp.float32)])
        f = jnp.asarray(lo_freq, jnp.int32) % q
        c0 = f
        c1 = (c0 * NCO_BASE) % q
        c2 = (c1 * NCO_BASE) % q
        n0c = (jnp.asarray(n0_mod, jnp.int32) - 306) % q
        # pack f32 scalars as fixed-point int32 (SMEM likes one dtype)
        to_fx = lambda v: (jnp.asarray(v, jnp.float32)
                           * (2.0 ** 16)).astype(jnp.int32)
        scalars = jnp.stack([c0, c1, c2, n0c,
                             to_fx(dc_r), to_fx(dc_i),
                             to_fx(lgain), to_fx(rgain)])
        yr, yi = _frontend_call(xr_pad, xi_pad, self.w, scalars, self.rate,
                                self.interpret)
        return yr, yi, xr[-306:], xi[-306:]
