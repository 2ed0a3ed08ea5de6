"""Legacy PowerPoint 97 binary .ppt lane: record-layout pins + round
trips.  Like the xls/doc lanes, no .ppt reader exists in this
container, so the tests pin the writer's raw record layout against the
published [MS-PPT] numbers independently of the reader, then pin
reader behavior over writer bytes."""

from __future__ import annotations

import struct

from machine_readability_checker_spark.core.cfb import (
    read_stream,
    write_streams,
)
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.ppt import (
    RT_DOCUMENT,
    RT_SLIDE_LIST_WITH_TEXT,
    RT_TEXT_BYTES_ATOM,
    RT_TEXT_CHARS_ATOM,
    RT_TEXT_HEADER_ATOM,
    extract_ppt_spans,
    write_ppt,
)

LONG = "This body sentence is long enough to classify as main content."


def test_record_layout_matches_spec():
    """RecordHeader: u16 verAndInstance (0xF ver = container), u16
    recType, u32 recLen; Document(1000) > SlideListWithText(4080) >
    TextHeaderAtom(3999)+TextBytesAtom(4008)."""
    data = write_ppt([[("title", "T"), ("body", "latin body")]])
    stream = read_stream(data, "PowerPoint Document")
    ver, rtype, rlen = struct.unpack_from("<HHI", stream, 0)
    assert (ver & 0xF) == 0xF and rtype == RT_DOCUMENT
    ver2, rtype2, rlen2 = struct.unpack_from("<HHI", stream, 8)
    assert (ver2 & 0xF) == 0xF and rtype2 == RT_SLIDE_LIST_WITH_TEXT
    assert rlen == rlen2 + 8
    ver3, rtype3, rlen3 = struct.unpack_from("<HHI", stream, 16)
    assert (ver3 & 0xF) == 0 and rtype3 == RT_TEXT_HEADER_ATOM
    assert rlen3 == 4 and struct.unpack_from("<I", stream, 24)[0] == 0
    _, rtype4, rlen4 = struct.unpack_from("<HHI", stream, 28)
    assert rtype4 == RT_TEXT_BYTES_ATOM
    assert stream[36 : 36 + rlen4] == b"T"


def test_chars_atom_for_non_latin():
    data = write_ppt([[("body", "日本語")]])
    stream = read_stream(data, "PowerPoint Document")
    _, rtype, rlen = struct.unpack_from("<HHI", stream, 28)
    assert rtype == RT_TEXT_CHARS_ATOM
    assert stream[36 : 36 + rlen].decode("utf-16le") == "日本語"


def test_round_trip_full_vocabulary():
    spans, err = extract_ppt_spans(write_ppt([
        [("title", "Deck Title"), ("body", f"{LONG}\rshort tail"),
         ("notes", "note")],
        [("title", "Second"), ("other", "fin")],
    ]))
    assert err is None
    assert spans == [
        ("title", "Deck Title", ""),
        ("main", LONG, ""),
        ("boilerplate", "short tail", ""),
        ("boilerplate", "note", ""),
        ("heading", "Second", ""),
        ("boilerplate", "fin", ""),
    ]


def test_soft_break_joins():
    spans, _ = extract_ppt_spans(
        write_ppt([[("body", "alpha\x0bbeta joined with space padding")]])
    )
    assert spans == [
        ("main", "alpha beta joined with space padding", ""),
    ]


def test_quarantine_paths():
    assert extract_ppt_spans(b"not cfb")[1] is not None
    empty = write_streams({"PowerPoint Document": b"\x00" * 16})
    spans, err = extract_ppt_spans(empty)
    assert spans == [] and err is not None
    # lying recLen clamps at parent end instead of reading past it
    hostile = struct.pack("<HHI", 0x000F, RT_DOCUMENT, 0xFFFFFFF0)
    spans, err = extract_ppt_spans(
        write_streams({"PowerPoint Document": hostile})
    )
    assert spans == [] and err is not None


def test_extract_document_integration():
    out = extract_document(
        "p1", "ppt", write_ppt([[("title", "T"), ("body", LONG)]])
    )
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]
