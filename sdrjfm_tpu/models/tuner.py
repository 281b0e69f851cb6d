"""Tuning / AFC / band-scan controller (the RadioInterface logic, C1).

Host-side control loop around the jitted receiver step, mirroring the
reference controller semantics:

  set_tuner    : radio.cpp:1040-1075 — retune inside the capture window by
                 changing the LO offset only (a traced control, no recompile);
                 offsets beyond the window are rejected (a live SDR would
                 retune hardware; a file capture cannot).
  AFC          : radio.cpp:1786-1809 — closes a loop around the demodulator's
                 DC component every block with the reference's adaptive gain
                 (0.05 nominal, 0.8 when |dc| is large, 0.005 near lock) and
                 3 Hz deadband.
  scan         : radio.cpp:1115-1158 + fm-processor scan path — steps the LO
                 over a grid and reports offsets whose edge/centre spectral
                 contrast exceeds the threshold.
  retune resets: triggerFrequencyChange (fm-processor.cpp:849-855) — audio
                 ramp, RDS reset, PSS reset.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .receiver import Controls, Receiver
from .scanner import scan_decision



class AFCTracker:
    """The AFC loop filter (radio.cpp:1786-1809), step-able per block.

    offset = K_FM-scaled demod DC converted to Hz, integrated with an
    adaptive alpha (0.005 near lock / 0.05 / 0.8 far off) and a 3 Hz
    deadband.  Shared by RadioController and the rx CLI's --afc.
    """

    def __init__(self, fm_rate: int = C.FM_RATE):
        self.fm_rate = fm_rate
        self.offset = 0.0

    def reset(self):
        self.offset = 0.0

    def update(self, dc_component: float) -> float:
        """Feed the block's demod DC (meta.dc_if); returns the accumulated
        LO correction in Hz."""
        freq_off = dc_component * self.fm_rate / (2.0 * np.pi)
        if abs(freq_off) > 1000.0:
            alpha = 0.8
        elif abs(freq_off) > 100.0:
            alpha = 0.05
        else:
            alpha = 0.005
        if abs(freq_off) >= 3.0:       # deadband (radio.cpp:1809)
            self.offset += alpha * freq_off
        return self.offset


@dataclass
class RadioController:
    rx: Receiver
    afc_active: bool = False
    lo_freq: int = 0
    controls: Optional[Controls] = None

    def __post_init__(self):
        if self.controls is None:
            # seed from the config so cfg.sound/cfg.panorama (now traced
            # controls) are honored, exactly like the runners
            self.controls = self.rx.initial_controls()
        self._step = self.rx.jit_step()
        self.state = self.rx.init_state()
        self._afc = AFCTracker(self.rx.cfg.fm_rate)
        self._set_lo(self.lo_freq)

    # -- tuning --------------------------------------------------------
    @property
    def max_offset(self) -> int:
        """Retune window: |offset| <= inputRate/2 - fmRate (radio.cpp:1048)."""
        return self.rx.cfg.input_rate // 2 - self.rx.cfg.fm_rate

    def set_tuner(self, offset_hz: int):
        if abs(offset_hz) > self.max_offset:
            raise ValueError(f"offset {offset_hz} outside capture window "
                             f"±{self.max_offset}")
        big_step = abs(offset_hz - self.lo_freq) >= 100_000
        self.lo_freq = int(offset_hz)
        self._afc.reset()
        self._set_lo(self.lo_freq)
        if big_step:
            self.trigger_frequency_change()

    def _set_lo(self, f: int):
        self.controls = self.controls._replace(
            lo_freq_hz=jnp.asarray(int(round(f)), jnp.int32))

    def trigger_frequency_change(self):
        """Audio mute ramp + RDS/PSS reset (fm-processor.cpp:849-855)."""
        self.state = self.rx.retune_reset(self.state)

    # -- processing with AFC -------------------------------------------
    def process_block(self, iq_block):
        self.state, out = self._step(self.state, self.controls,
                                     jnp.asarray(iq_block, jnp.complex64))
        if self.afc_active:
            self._afc_update(float(out.meta.dc_if))
        return out

    def _afc_update(self, dc_component: float):
        """radio.cpp:1786-1809 via AFCTracker (demod DC (fm_afc) is in
        pre-scale units; the frequency offset is dc * fmRate / (2*pi))."""
        self._set_lo(self.lo_freq + self._afc.update(dc_component))

    # -- band scan ------------------------------------------------------
    def scan(self, iq_block, grid_hz: int = 100_000,
             threshold_db: float = 20.0) -> List[int]:
        """Scan LO offsets across the capture window on one block; returns
        offsets that trigger the reference's detection rule."""
        cfg = self.rx.cfg
        found = []
        scan_fn = jax.jit(self._scan_at)
        start = -(self.max_offset // grid_hz) * grid_hz
        for off in range(start, self.max_offset + 1, grid_hz):
            hit, _ = scan_fn(jnp.asarray(iq_block, jnp.complex64),
                             jnp.asarray(off, jnp.int32),
                             threshold_db)
            if bool(hit):
                found.append(off)
        return found

    def _scan_at(self, iq, off, threshold_db):
        ctl = self.controls._replace(lo_freq_hz=off)
        state = self.rx.init_state()
        v, _ = self.rx.front_end(state, ctl, iq)
        return scan_decision(v, threshold_db)
