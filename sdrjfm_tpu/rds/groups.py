"""RDS group decoder — station name, radio text, AF, clock/date, PTY.

Host-side semantics of src/rds/rds-groupdecoder.cpp:100-343 and the EBU
charset / PTY tables of src/rds/ebu-codetables.c, re-expressed as a plain
Python class with a result-dict + callback interface instead of Qt signals.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from .blocksync import Group
from .tables import PTY_TABLE, map_ebu_to_unicode

STATION_LABEL_LENGTH = 8
NUMBER_OF_NAME_SEGMENTS = 4
NUM_OF_CHARS_RADIOTEXT = 64
NUM_CHARS_PER_RTXT_SEGMENT = 4
NUM_OF_FRAGMENTS = 16
END_OF_RADIO_TEXT = 0x0D

GROUP_NAMES = {
    0: "BASIC_TUNING_AND_SWITCHING",
    1: "SLOW_LABELING_CODES",
    2: "RADIO_TEXT",
    3: "OPEN_DATA",
    4: "CLOCKTIME_AND_DATE",
    8: "TMC_DATA",
    10: "PROGRAM_TYPE_NAME",
}


@dataclass
class RDSResult:
    pi_code: int = 0
    pty_code: int = -1
    pty_text: str = ""
    station_label: str = ""
    radio_text: str = ""
    music_speech: Optional[int] = None
    di_code: int = 0
    af_frequencies: List[int] = field(default_factory=list)
    clock_time: Optional[str] = None
    group_counts: Dict[int, int] = field(default_factory=dict)


class GroupDecoder:
    def __init__(self, pty_locale: int = 0,
                 on_update: Optional[Callable[[str, object], None]] = None):
        self.pty_locale = pty_locale
        self.on_update = on_update or (lambda k, v: None)
        self.reset()

    def reset(self):
        self.result = RDSResult()
        self._label = [" "] * STATION_LABEL_LENGTH
        self._name_segments = 0
        self._text = [" "] * NUM_OF_CHARS_RADIOTEXT
        self._text_ab_flag = -1
        self._text_segments = 0
        self._alphabet = 0

    # ------------------------------------------------------------------
    def decode(self, grp: Group) -> bool:
        r = self.result
        gt = grp.group_type
        r.group_counts[gt] = r.group_counts.get(gt, 0) + 1

        if grp.pi_code != r.pi_code:
            # new station: reset (rds-groupdecoder.cpp:106-110)
            self.reset()
            r = self.result
            r.pi_code = grp.pi_code
            self.on_update("pi_code", r.pi_code)

        pty = grp.programme_type
        if pty != r.pty_code:
            r.pty_code = pty
            r.pty_text = PTY_TABLE[pty][self.pty_locale]
            self.on_update("pty", r.pty_text)

        if grp.is_type_b:
            return False

        if gt == 0:
            self._basic_tuning(grp)
        elif gt == 2:
            self._radio_text(grp)
        elif gt == 4:
            self._clock(grp)
        return True

    # ------------------------------------------------------------------
    def _basic_tuning(self, grp: Group):
        r = self.result
        seg = grp.get("B") & 0x3
        chars = grp.get("D") & 0xFFFF
        self._label[2 * seg] = chr((chars >> 8) & 0xFF)
        self._label[2 * seg + 1] = chr(chars & 0xFF)
        if seg == 0:
            self._name_segments = 0
        self._name_segments |= 2 * seg        # quirk preserved from
        # rds-groupdecoder.cpp:199-208 (|= 2*index, not 1<<index)
        r.station_label = "".join(self._label)
        self.on_update("station_label", r.station_label)

        af1 = (grp.get("C") >> 8) & 0xFF
        af2 = grp.get("C") & 0xFF
        f1 = af1 * 100 + 87500 if 0 < af1 < 205 else 0
        f2 = af2 * 100 + 87500 if (af1 != 250 and 0 < af2 < 205) else 0
        for f in (f1, f2):
            if f and f not in r.af_frequencies:
                r.af_frequencies.append(f)

        r.music_speech = (grp.get("B") >> 3) & 1
        r.di_code |= ((grp.get("B") >> 2) & 1) << seg

    def _radio_text(self, grp: Group):
        r = self.result
        ab = (grp.get("B") >> 4) & 1
        seg = grp.get("B") & 0xF
        if self._text_ab_flag != ab:
            self._text_ab_flag = ab
            self._text = [" "] * NUM_OF_CHARS_RADIOTEXT
            self._text_segments = 0
            r.radio_text = ""
            self.on_update("radio_text", "")
        c, d = grp.get("C"), grp.get("D")
        frag = [(c >> 8) & 0xFF, c & 0xFF, (d >> 8) & 0xFF, d & 0xFF]
        for i, ch in enumerate(frag):
            self._text[4 * seg + i] = chr(ch)
        self._text_segments |= 1 << seg

        end = any(ch == END_OF_RADIO_TEXT for ch in frag)
        contiguous = self._text_segments + 1 == (1 << (seg + 1))
        complete = self._text_segments + 1 == (1 << NUM_OF_FRAGMENTS)
        if end or complete:
            self._emit_text(NUM_OF_CHARS_RADIOTEXT)
        elif contiguous:
            self._emit_text(seg * NUM_CHARS_PER_RTXT_SEGMENT)

    def _emit_text(self, length: int):
        out = []
        chars = [ord(c) for c in self._text[:max(length, 1)]]
        i = 0
        prev = chars[0] if chars else 0x20
        i = 1
        while i < len(chars):
            cur = chars[i]
            if _alphabet_switch(prev, cur):
                self._alphabet = _set_alphabet(prev)
                i += 1
                prev = chars[i - 1] if i - 1 < len(chars) else 0x20
                i += 1
                continue
            out.append(map_ebu_to_unicode(self._alphabet, prev))
            prev = cur
            i += 1
        out.append(map_ebu_to_unicode(self._alphabet, prev))
        text = "".join(out).strip()
        if text != self.result.radio_text:
            self.result.radio_text = text
            self.on_update("radio_text", text)

    def _clock(self, grp: Group):
        hours = (grp.get("D") >> 12) & 0xF
        minutes = (grp.get("D") >> 6) & 0x3F
        mjd = grp.get("C")
        offset = grp.get("D") & 0x4F
        self.result.clock_time = f"{hours + offset // 2:02d}:{minutes:02d} (MJD {mjd})"
        self.on_update("clock_time", self.result.clock_time)


def _alphabet_switch(c1: int, c2: int) -> bool:
    return ((c1 == 0x0F and c2 == 0x0F) or (c1 == 0x0E and c2 == 0x0E)
            or (c1 == 0x1B and c2 == 0x6E))


def _set_alphabet(c1: int) -> int:
    return {0x0F: 0, 0x0E: 1, 0x1B: 2}.get(c1, 0)
