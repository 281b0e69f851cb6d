"""Reference program-list XML interop (program-list.cpp:105-144).

A user migrating from the reference brings ~/.jsdr-programs.xml; the
station list must read that schema verbatim and write it back so the two
receivers can share one list.
"""

import textwrap

from sdrjfm_tpu.io.stations import Station, StationList


REFERENCE_XML = textwrap.dedent("""\
    <!DOCTYPE fmList>
    <fmList>
     <fm-transmitter theFrequency="94300" theName="Classic FM"/>
     <fm-transmitter theFrequency="100700" theName="Radio 2"/>
     <fm-transmitter theFrequency="88600" theName=""/>
    </fmList>
    """)


def test_loads_reference_schema_verbatim(tmp_path):
    p = tmp_path / "jsdr-programs.xml"
    p.write_text(REFERENCE_XML)
    sl = StationList.load(str(p))
    assert [(s.name, s.frequency_hz) for s in sl.stations] == [
        ("", 88_600_000), ("Classic FM", 94_300_000),
        ("Radio 2", 100_700_000)]


def test_xml_roundtrip_via_extension_dispatch(tmp_path):
    sl = StationList()
    sl.add("TPU FM", 94_300_000, pi_code=0x10F0)
    sl.add("Other", 101_100_000)
    p = tmp_path / "list.xml"
    sl.save(str(p))
    text = p.read_text()
    assert "<fmList>" in text and 'theFrequency="94300"' in text
    back = StationList.load(str(p))
    assert [(s.name, s.frequency_hz) for s in back.stations] == [
        ("TPU FM", 94_300_000), ("Other", 101_100_000)]


def test_xml_content_sniffing_without_extension(tmp_path):
    """A reference list copied without its .xml extension still loads
    (content starts with '<')."""
    p = tmp_path / "programs"
    p.write_text(REFERENCE_XML)
    sl = StationList.load(str(p))
    assert len(sl.stations) == 3


def test_json_path_still_default(tmp_path):
    sl = StationList(stations=[Station("A", 90_000_000, pi_code=7)])
    p = tmp_path / "list.json"
    sl.save(str(p))
    assert p.read_text().lstrip().startswith("{")
    back = StationList.load(str(p))
    assert back.stations[0].pi_code == 7


def test_junk_rows_skipped(tmp_path):
    p = tmp_path / "list.xml"
    p.write_text('<fmList><fm-transmitter theFrequency="oops" '
                 'theName="bad"/><fm-transmitter theFrequency="95500" '
                 'theName="ok"/></fmList>')
    sl = StationList.load(str(p))
    assert [(s.name, s.frequency_hz) for s in sl.stations] == [
        ("ok", 95_500_000)]
