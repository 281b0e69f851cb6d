#!/usr/bin/env python
"""Decode an IQ capture with the REFERENCE receiver's own compiled code.

A debugging instrument around tools/reference_oracle/: any fidelity
question ("what would the reference do with this capture?") gets an
answer from the reference's actual DSP core instead of a re-derived
model.

    PYTHONPATH=. python tools/run_reference_oracle.py capture.wav \
        [--rds-mode 1|2|3|0] [--decoder 1..6] [--lo-freq HZ]
        [--audio-filter HZ] [--input-filter] [--deemphasis US]
        [--audio out_192k.wav] [--json report.json]

The capture must be 2.304 MS/s IQ (wav float32/PCM16 stereo, same
formats as `rx --iq`).  Audio is written at fmRate (192 kHz stereo) —
the reference's final 48 kHz resampler is libsamplerate (third-party),
which the oracle intentionally omits.
"""

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("iq")
    ap.add_argument("--iq-format", default="auto",
                    choices=["auto", "u8", "i8", "i16"],
                    help="raw headerless captures: the wire convention "
                         "(auto = RIFF wav)")
    ap.add_argument("--rds-mode", type=int, default=1,
                    help="0=off, 1/2/3 = the reference's decoders")
    ap.add_argument("--decoder", type=int, default=3,
                    help="1=AM 2=PLL 3=Mixed 4=ComplexBB 5=RealBB 6=Diff")
    ap.add_argument("--lo-freq", type=int, default=0)
    ap.add_argument("--audio-filter", type=int, default=0)
    ap.add_argument("--input-filter", action="store_true")
    ap.add_argument("--deemphasis", type=float, default=50.0)
    ap.add_argument("--audio", help="write fm-rate (192k) stereo wav here")
    ap.add_argument("--json", help="write the report as JSON here")
    args = ap.parse_args(argv)

    import numpy as np
    sys.path.insert(0, "tests")
    from reference_oracle_binding import ReferenceOracle, build_oracle
    from sdrjfm_tpu.io.wavio import is_riff, read_iq_raw, read_iq_wav

    build_oracle()
    if args.iq_format != "auto" and not is_riff(args.iq):
        from sdrjfm_tpu.models.bandscan import raw_to_c64
        iq = raw_to_c64(read_iq_raw(args.iq, args.iq_format),
                        args.iq_format)
    else:
        iq, rate = read_iq_wav(args.iq)
    o = ReferenceOracle(rds_mode=args.rds_mode, decoder=args.decoder,
                        input_filter=args.input_filter,
                        audio_filter_hz=args.audio_filter,
                        lo_freq=args.lo_freq,
                        deemphasis_us=args.deemphasis)
    out = o.process(np.asarray(iq, np.complex64))
    rep = o.rds_status()
    o.close()
    rep["input_samples"] = int(len(iq))
    rep["fm_samples"] = int(len(out["demod"]))
    rep["locked_fraction"] = float(out["locked"].mean())
    rep["audio_rms"] = float(np.sqrt((out["audio"] ** 2).mean()))
    print(json.dumps(rep, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=2)
    if args.audio:
        from sdrjfm_tpu.io.wavio import write_wav
        write_wav(args.audio, out["audio"], 192_000)
        print(f"wrote {args.audio} (192 kHz stereo)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
