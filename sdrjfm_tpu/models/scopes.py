"""Spectrum / waterfall / constellation computation — the scopes, headless.

The reference renders HF/LF spectra, a waterfall, and the RDS IQ
constellation with Qt/Qwt (src/scopes-qwt6/, SURVEY.md C4-C7).  The TPU
framework computes the same displays as arrays for file export or downstream
UIs:

  hf_spectrum  : windowed segment FFT of the raw input, bin-averaged to
                 display size, exponentially averaged over frames
                 (hs-scope.cpp:96-203)
  lf_spectrum  : same machinery on a selectable tap of the chain
                 (ls-scope.cpp:76-192; tap selection = ELfPlot,
                 fm-processor.h:84-86 — here the receiver's emit_taps dict)
  waterfall    : stacked per-block spectra
  iq_points    : decimated RDS constellation samples (iqdisplay.cpp:32-79)
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

Window = Literal["hann", "blackman"]


def _window(n: int, kind: Window = "blackman") -> jnp.ndarray:
    i = jnp.arange(n)
    if kind == "hann":
        return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * i / (n - 1))
    return (0.42 - 0.5 * jnp.cos(2 * jnp.pi * i / (n - 1))
            + 0.08 * jnp.cos(4 * jnp.pi * i / (n - 1)))


def spectrum(x: jnp.ndarray, display_size: int = 512,
             window: Window = "blackman", average: float = 0.5,
             prev: jnp.ndarray | None = None):
    """Averaged power spectrum of a block, fftshifted, bin-averaged down to
    display_size (the hs-scope recipe: segments of 4*displaySize)."""
    seg = 4 * display_size
    n = (x.shape[0] // seg) * seg
    frames = x[:n].reshape(-1, seg) * _window(seg, window)[None, :]
    spec = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(frames, axis=-1),
                                    axes=-1)) ** 2
    spec = spec.mean(axis=0)
    binned = spec.reshape(display_size, 4).mean(axis=-1)
    if prev is not None:
        binned = average * prev + (1.0 - average) * binned
    return binned


def spectrum_db(x, display_size: int = 512, **kw):
    p = spectrum(x, display_size, **kw)
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-20))


def waterfall(blocks_spectra: np.ndarray) -> np.ndarray:
    """Stack per-block spectra [n_blocks, display] into a waterfall image."""
    return np.stack(blocks_spectra, axis=0)


def iq_constellation(iq_points: np.ndarray, extent: float = 2.0,
                     grid: int = 101) -> np.ndarray:
    """Histogram RDS symbols onto the reference's 101x101 display grid."""
    img = np.zeros((grid, grid), np.float32)
    pts = np.clip((np.stack([iq_points.real, iq_points.imag], -1) / extent
                   + 0.5) * (grid - 1), 0, grid - 1).astype(np.int32)
    np.add.at(img, (pts[:, 1], pts[:, 0]), 1.0)
    return img
