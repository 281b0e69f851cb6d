"""Station list persistence (the programList equivalent, C8).

The reference keeps a name+frequency table persisted as XML
(src/various/program-list.cpp:33-60, ~/.jsdr-programs.xml).  Here it's a JSON
file with the same data model plus per-station metadata the RDS stack can
fill in automatically (PI code, PTY) — something the reference's manual list
cannot do.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import List, Optional


@dataclass
class Station:
    name: str
    frequency_hz: int
    pi_code: Optional[int] = None
    pty: Optional[str] = None


@dataclass
class StationList:
    stations: List[Station] = field(default_factory=list)

    def add(self, name: str, frequency_hz: int, **kw) -> Station:
        for s in self.stations:
            if s.frequency_hz == frequency_hz:
                s.name = name
                for k, v in kw.items():
                    setattr(s, k, v)
                return s
        s = Station(name=name, frequency_hz=int(frequency_hz), **kw)
        self.stations.append(s)
        self.stations.sort(key=lambda s: s.frequency_hz)
        return s

    def remove(self, frequency_hz: int) -> bool:
        before = len(self.stations)
        self.stations = [s for s in self.stations
                         if s.frequency_hz != frequency_hz]
        return len(self.stations) != before

    def find(self, frequency_hz: int, tolerance_hz: int = 50_000):
        for s in self.stations:
            if abs(s.frequency_hz - frequency_hz) <= tolerance_hz:
                return s
        return None

    def save(self, path: str) -> None:
        Path(path).write_text(json.dumps(
            {"stations": [asdict(s) for s in self.stations]}, indent=2))

    @classmethod
    def load(cls, path: str) -> "StationList":
        p = Path(path)
        if not p.exists():
            return cls()
        data = json.loads(p.read_text())
        return cls(stations=[Station(**s) for s in data.get("stations", [])])
