"""Decode a capture the package fixtures had no hand in.

tests/independent_modulator.py re-derives the whole transmit side from the
published standards (spec-polynomial RDS CRC, frequency-domain biphase
shaping, FFT resampling, trapezoidal FM) and shares no code with
io/synth.py / rds/encode.py.  Decoding it through the full chain guards
BASELINE's "recorded wav IQ" clause: encode/decode agree with the *spec*,
not merely with each other (round-2 verdict, weak #6).
"""

import json

import numpy as np
import pytest

from sdrjfm_tpu import constants as C

import independent_modulator as im


@pytest.fixture(scope="module")
def indep_wav(tmp_path_factory):
    from sdrjfm_tpu.io.wavio import write_iq_wav

    iq = im.make_capture(seconds=4.0)
    path = tmp_path_factory.mktemp("indep") / "indep.wav"
    write_iq_wav(str(path), iq, C.INPUT_RATE, float32=False)
    return str(path)


def _tone_snr_db(x, tone_hz, rate, excl_hz=None):
    """SNR of one tone; excl_hz masks the other channel's tone so
    crosstalk (measured separately as separation) doesn't count as
    noise."""
    w = np.hanning(len(x))
    X = np.abs(np.fft.rfft(x * w)) ** 2
    b = int(round(tone_hz * len(x) / rate))
    sig = X[b - 3:b + 4].sum()
    noise = X[8:].sum() - sig
    if excl_hz is not None:
        bo = int(round(excl_hz * len(x) / rate))
        noise -= X[bo - 3:bo + 4].sum()
    return 10.0 * np.log10(sig / noise)


def test_full_chain_decodes_independent_capture(indep_wav, tmp_path):
    """CLI rx on the spec-derived capture: RDS payload back with zero bit
    errors, pilot locked, clean stereo audio with real separation."""
    from sdrjfm_tpu.app import main
    from sdrjfm_tpu.io.wavio import read_wav

    audio = str(tmp_path / "a.wav")
    rep = str(tmp_path / "r.json")
    assert main(["rx", "--iq", indep_wav, "--audio", audio, "--rds",
                 "--report", rep, "--block-fm", "32768",
                 "--float32"]) == 0
    r = json.load(open(rep))
    rds = r["rds"]
    assert rds["pi_code"] == "0xA1B2"
    assert rds["station_label"] == "INDEPMOD"
    assert rds["radio_text"] == "second oracle from the spec"
    assert rds["pty"] == "Pop Music"
    assert rds["bit_error_rate"] == 0.0
    assert rds["crc_errors"] == 0
    assert rds["groups_decoded"] > 40
    assert r["meta_last"]["pilot_locked"] is True
    assert r["meta_last"]["pss_established"] is True

    x, info = read_wav(audio)
    assert info.rate == C.WORKING_RATE and x.shape[1] == 2
    x = x[info.rate:]                    # skip the startup mute ramp
    # the 1 kHz tone lives on the left, 440 Hz on the right
    assert _tone_snr_db(x[:, 0], 1000.0, info.rate, excl_hz=440.0) > 35.0
    assert _tone_snr_db(x[:, 1], 440.0, info.rate, excl_hz=1000.0) > 35.0
    # stereo separation: left tone suppressed in the right channel
    w = np.hanning(len(x))
    L = np.abs(np.fft.rfft(x[:, 0] * w)) ** 2
    R = np.abs(np.fft.rfft(x[:, 1] * w)) ** 2
    b = int(round(1000.0 * len(x) / info.rate))
    sep = 10.0 * np.log10(L[b - 3:b + 4].sum() / R[b - 3:b + 4].sum())
    assert sep > 20.0, sep


def test_spec_crc_differs_from_package_derivation():
    """The two CRC implementations agree on the wire format (they must —
    both claim the same standard) while being derived independently: one
    from g(x) long division, one from the decoder's syndrome tables."""
    from sdrjfm_tpu.rds import crc as pkg_crc

    rng = np.random.default_rng(7)
    for info in rng.integers(0, 1 << 16, 64):
        info = int(info)
        for name in ("A", "B", "C1", "D"):
            want = pkg_crc.encode_block(info, name) & 0x3FF
            got = im.crc10(info) ^ im._OFFSET[name[0]]
            assert got == want, (hex(info), name)


def test_independent_bits_decode_via_host_stack():
    """The spec-built bitstream (differential coding included) clears the
    host block synchronizer + group decoder directly."""
    from sdrjfm_tpu.rds.blocksync import BlockSynchronizer, Group
    from sdrjfm_tpu.rds.groups import GroupDecoder

    bits = im.bitstream(0x5EC0, 4, "SPECBITS", "independent", repeats=3)
    diff = np.bitwise_xor.accumulate(bits.astype(np.uint8))
    # the receiver sees the differentially-coded stream; the host stack
    # decodes it back (blocksync expects the post-recovery bit stream)
    sync, dec, grp = BlockSynchronizer(), GroupDecoder(), Group()
    sync.push_bits(diff[1:].astype(np.int8) ^ diff[:-1].astype(np.int8),
                   grp, on_group=dec.decode)
    assert sync.groups_decoded > 40
    assert sync.num_crc_errors == 0
    assert dec.result.pi_code == 0x5EC0
    assert dec.result.station_label == "SPECBITS"
