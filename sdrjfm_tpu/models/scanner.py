"""Band scanner — signal/noise detection at the fm rate (D7).

Semantics: fmProcessor's scan path (fm-processor.cpp:480-495,886-904) runs a
1024-point FFT on the decimated stream and compares edge-band mean magnitude
('signal': bins 5..25 from both edges) against centre-band mean ('noise');
a station is declared when the dB difference exceeds the threshold (default
20, radio.cpp:912-913).  Block shape: all 1024-frames of the block are
transformed in one batched FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SCAN_FFT = 1024


def get_db(x, full_scale: float = 256.0):
    """dB relative to full scale (fm-processor getSignal/getNoise usage)."""
    return 20.0 * jnp.log10(jnp.maximum(x, 1e-12) / full_scale)


def scan_block(v: jax.Array):
    """Scan one fm-rate block; returns (signal_db, noise_db) per 1024-frame.

    signal = mean |V[k]| over k in 5..24 and size-1-(5..24)  (edges)
    noise  = mean |V[k]| around the centre (size/2 ± 5..24)
    """
    T = v.shape[0]
    n = T // SCAN_FFT
    frames = v[: n * SCAN_FFT].reshape(n, SCAN_FFT)
    spec = jnp.abs(jnp.fft.fft(frames, axis=-1))
    lo = jnp.arange(5, 25)
    signal = (spec[:, lo].sum(axis=1) + spec[:, SCAN_FFT - 1 - lo].sum(axis=1)) / 40.0
    noise = (spec[:, SCAN_FFT // 2 - 1 - lo].sum(axis=1)
             + spec[:, SCAN_FFT // 2 + 1 + lo].sum(axis=1)) / 40.0
    return get_db(signal), get_db(noise)


def scan_decision(v: jax.Array, threshold_db: float = 20.0):
    """Reference trigger rule: any frame with signal-noise > threshold."""
    s_db, n_db = scan_block(v)
    return jnp.any(s_db - n_db > threshold_db), jnp.mean(s_db - n_db)
