"""CLI control surface added in round 2: --afc, --fm-bandwidth,
--dc-remove, scan on raw captures (radio.cpp:1786-1809, setBandwidth,
setDCRemove, and the rx path's capture-format handling brought to scan)."""

import json

import numpy as np
import pytest

from sdrjfm_tpu import constants as C
from sdrjfm_tpu.app import main
from sdrjfm_tpu.io.wavio import read_iq_wav, write_iq_wav


@pytest.fixture(scope="module")
def offset_capture(tmp_path_factory):
    """3 s capture whose carrier sits +1500 Hz off the tuned frequency."""
    d = tmp_path_factory.mktemp("ctl")
    iq = str(d / "off1500.wav")
    rc = main(["synth", "--out", iq, "--seconds", "3",
               "--station", "AFCTEST ", "--pi", "0xAFC0",
               "--carrier-offset", "1500"])
    assert rc == 0
    return iq


def _meta_log(capture, tmp_path, name, *extra):
    log = str(tmp_path / f"{name}.jsonl")
    rc = main(["rx", "--iq", capture, "--block-fm", "32768",
               "--log-meta", log, *extra])
    assert rc == 0
    return [json.loads(line) for line in open(log)]


def test_afc_pulls_in_carrier_offset(offset_capture, tmp_path):
    """--afc drives the residual demod DC toward zero; without it the
    1.5 kHz offset stays as a constant DC on the discriminator."""
    no_afc = _meta_log(offset_capture, tmp_path, "noafc")
    with_afc = _meta_log(offset_capture, tmp_path, "afc", "--afc")
    dc_no = abs(no_afc[-1]["dc_if"])
    dc_afc = abs(with_afc[-1]["dc_if"])
    assert dc_no > 0.01                 # the offset is visible untracked
    assert dc_afc < 0.5 * dc_no         # AFC pulled most of it in
    # and the early blocks still show the untracked offset (loop converges)
    assert abs(with_afc[0]["dc_if"]) > dc_afc


def test_afc_through_streaming_runner(offset_capture, tmp_path):
    """--afc also closes its per-block loop through --pcm-out's streaming
    runner (run_streaming controls_update — same contract as run_live)."""
    pcm = str(tmp_path / "s.pcm")
    log = str(tmp_path / "safc.jsonl")
    rc = main(["rx", "--iq", offset_capture, "--block-fm", "32768",
               "--pcm-out", pcm, "--afc", "--log-meta", log])
    assert rc == 0
    recs = [json.loads(line) for line in open(log)]
    assert abs(recs[-1]["dc_if"]) < 0.5 * abs(recs[0]["dc_if"])


def test_afc_rejected_for_scan_runner(offset_capture, tmp_path):
    assert main(["rx", "--iq", offset_capture, "--block-fm", "32768",
                 "--afc", "--runner", "scan"]) == 2


def test_fm_bandwidth_controls_channel_filter(tmp_path):
    """setBandwidth semantics (fm-processor.cpp:232-239): a numeric kHz
    value enables the strong channel filter at that width — narrowing the
    channel starves the pilot (strength drops monotonically); 'off'
    disables the filter entirely (identical to no --input-filter)."""
    iq = str(tmp_path / "iq.wav")
    assert main(["synth", "--out", iq, "--seconds", "2"]) == 0

    def strength(*extra):
        rep = str(tmp_path / "r.json")
        assert main(["rx", "--iq", iq, "--block-fm", "32768",
                     "--report", rep, *extra]) == 0
        return json.load(open(rep))["meta_last"]["pilot_strength"]

    s_wide = strength("--fm-bandwidth", "160")
    s_narrow = strength("--fm-bandwidth", "30")
    assert s_wide > 2.0 * s_narrow
    # 'off' overrides --input-filter: byte-identical to the unfiltered run
    a1 = str(tmp_path / "a1.wav")
    a2 = str(tmp_path / "a2.wav")
    assert main(["rx", "--iq", iq, "--block-fm", "32768",
                 "--audio", a1]) == 0
    assert main(["rx", "--iq", iq, "--block-fm", "32768", "--input-filter",
                 "--fm-bandwidth", "off", "--audio", a2]) == 0
    x1, _ = read_iq_wav(a1)
    x2, _ = read_iq_wav(a2)
    np.testing.assert_array_equal(x1, x2)


def test_dc_remove_off(tmp_path):
    """--dc-remove off: the servo neither tracks nor subtracts (tracked DC
    reads as zero, fm-processor.cpp:922-925); 'on' reports the injected DC."""
    src = str(tmp_path / "dc_src.wav")
    assert main(["synth", "--out", src, "--seconds", "2"]) == 0
    iq, rate = read_iq_wav(src)
    biased = str(tmp_path / "dc_biased.wav")
    write_iq_wav(biased, iq + (0.05 + 0.05j), rate)
    rep_on = str(tmp_path / "on.json")
    rep_off = str(tmp_path / "off.json")
    assert main(["rx", "--iq", biased, "--block-fm", "32768",
                 "--report", rep_on]) == 0
    assert main(["rx", "--iq", biased, "--block-fm", "32768",
                 "--dc-remove", "off", "--report", rep_off]) == 0
    dc_on = json.load(open(rep_on))["meta_last"]["dc_rf_db"]
    dc_off = json.load(open(rep_off))["meta_last"]["dc_rf_db"]
    assert dc_on > -30.0                # ~|0.05+0.05j| ≈ -23 dB tracked
    assert dc_off < -85.0               # servo off: RfDC pinned at zero


def test_dump_input_rate_iq(tmp_path):
    """--dump-input writes the 2.304 MS/s post-DC-removal IQ (the
    reference's raw dump for offline A/B, fm-processor.cpp:448-455)."""
    iq = str(tmp_path / "iq.wav")
    assert main(["synth", "--out", iq, "--seconds", "1"]) == 0
    dump = str(tmp_path / "raw.wav")
    assert main(["rx", "--iq", iq, "--block-fm", "32768",
                 "--dump-input", dump]) == 0
    x, rate = read_iq_wav(dump)
    assert rate == C.INPUT_RATE
    n_blocks = (1 * C.INPUT_RATE) // (32768 * 12)
    assert len(x) == n_blocks * 32768 * 12
    # the dump is the input minus the (tiny, clean-signal) DC correction
    src, _ = read_iq_wav(iq)
    np.testing.assert_allclose(x[: 10_000], src[: 10_000], atol=1e-3)


def test_scan_raw_u8_capture(tmp_path, capsys):
    """scan accepts a headerless u8 capture (rtl_sdr convention)."""
    from sdrjfm_tpu.io import synth

    n = 4 * 32768
    t = np.arange(n) / C.FM_RATE
    mpx = synth.synth_mpx(0.5 * np.sin(2 * np.pi * 800 * t),
                          0.5 * np.sin(2 * np.pi * 300 * t),
                          synth.MPXParams())
    u8 = synth.iq_to_u8(synth.fm_modulate(mpx, C.FM_RATE))
    raw = str(tmp_path / "cap.bin")
    u8.tofile(raw)
    assert main(["scan", "--iq", raw, "--iq-format", "u8"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert {"offset_hz": 0} in [{"offset_hz": h["offset_hz"]}
                                for h in out["hits"]]
    # missing format flag is a clean error
    assert main(["scan", "--iq", raw]) == 2
