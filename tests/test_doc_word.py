"""Legacy Word 97 binary ``.doc`` lane: spec-layout pins + round trips.

No .doc reader library exists in this container (antiword / wvWare /
LibreOffice absent; python-docx reads only OOXML), so — like the BIFF8
xls lane — correctness rests on two independent legs:

1. RAW BYTE LAYOUT pins: tests below assert the writer's FIB field
   offsets, PCD bit packing and FKP geometry against the published
   [MS-DOC] numbers directly (struct.unpack on the streams, no reader
   involved), so the writer can't drift with the reader.
2. Behavior round trips: reader output over writer bytes for every
   feature (piece table, compressed/unicode pieces, fields, tables,
   heading styles, media anchors, footnote/header regions, quarantine
   paths).
"""

from __future__ import annotations

import struct

import pytest

from machine_readability_checker_spark.core.cfb import (
    list_streams,
    read_stream,
    write_streams,
)
from machine_readability_checker_spark.core.doc import (
    extract_doc_spans,
    write_doc,
)
from machine_readability_checker_spark.core.extract import extract_document

LONG = "This paragraph carries well over the twenty-five character floor."


# ------------------------------------------------------------ raw layout


def test_fib_field_offsets_match_spec():
    """[MS-DOC]: wIdent 0xA5EC at 0, nFib at 2, fibFlags at 0x0A,
    ccpText at 0x4C, FibRgFcLcb97 entry 33 (fcClx) at 0x1A2."""
    data = write_doc([("para", LONG)])
    word = read_stream(data, "WordDocument")
    assert struct.unpack_from("<H", word, 0)[0] == 0xA5EC
    assert struct.unpack_from("<H", word, 2)[0] == 0x00C1  # Word 97
    flags = struct.unpack_from("<H", word, 0x0A)[0]
    assert flags & 0x0200  # fWhichTblStm → 1Table
    assert struct.unpack_from("<I", word, 0x4C)[0] == len(LONG) + 1  # +\r
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 0x1A2)
    table = read_stream(data, "1Table")
    assert table[fc_clx] == 0x02  # Pcdt tag opens the CLX


def test_pcd_bit_packing_compressed_vs_unicode():
    """PCD.fc bit 30 marks an 8-bit piece whose fc is DOUBLED; a
    unicode piece stores the plain byte offset."""
    data = write_doc([("para", "ascii start"), ("para", "日本語テキスト")])
    word = read_stream(data, "WordDocument")
    table = read_stream(data, "1Table")
    fc_clx, lcb_clx = struct.unpack_from("<II", word, 0x1A2)
    clx = table[fc_clx : fc_clx + lcb_clx]
    lcb = struct.unpack_from("<I", clx, 1)[0]
    n = (lcb - 4) // 12
    assert n == 2
    base = 5 + 4 * (n + 1)
    raw0 = struct.unpack_from("<I", clx, base + 2)[0]
    raw1 = struct.unpack_from("<I", clx, base + 8 + 2)[0]
    assert raw0 & 0x40000000 and not (raw1 & 0x40000000)
    # compressed piece: fc/2 = real byte offset = end of 1024-byte FIB
    assert (raw0 & 0x3FFFFFFF) // 2 == 1024
    # unicode piece starts right after the 12 cp1252 bytes
    assert raw1 == 1024 + len("ascii start\r")


def test_fkp_geometry():
    """PapxFkp: crun in byte 511, rgfc ascending, bx offsets point at
    word-aligned PapxInFkp entries."""
    data = write_doc([("para", LONG), ("heading", 2, "Head")])
    word = read_stream(data, "WordDocument")
    fc_papx, lcb_papx = struct.unpack_from("<II", word, 0x102)
    table = read_stream(data, "1Table")
    pn = struct.unpack_from("<I", table, fc_papx + 8)[0] & 0x3FFFFF
    page = word[pn * 512 : (pn + 1) * 512]
    crun = page[511]
    assert crun == 2
    rgfc = struct.unpack_from("<3I", page, 0)
    assert list(rgfc) == sorted(rgfc)
    for i in range(crun):
        b_off = page[4 * (crun + 1) + 13 * i]
        assert b_off and 2 * b_off < 511
    # heading PAPX carries istd=2 (GrpPrlAndIstd leads with istd)
    b1 = page[4 * (crun + 1) + 13]
    papx = page[2 * b1 :]
    body = papx[2:] if papx[0] == 0 else papx[1:]
    assert struct.unpack_from("<H", body, 0)[0] == 2


# ---------------------------------------------------------- round trips


def test_full_block_vocabulary_round_trip():
    spans, err = extract_doc_spans(
        write_doc(
            [
                ("heading", 1, "Annual Report"),
                ("para", LONG),
                ("heading", 3, "Methods"),
                ("para", "short"),
                ("field", 'HYPERLINK "http://x.example"', "kept result"),
                ("table", [["h1", "h2"], ["a", "1"], ["b", "2"]]),
                ("media",),
                ("ftn", "a footnote"),
                ("hdd", "a header"),
            ]
        )
    )
    assert err is None
    assert spans == [
        ("title", "Annual Report", ""),
        ("main", LONG, ""),
        ("heading", "Methods", ""),
        ("boilerplate", "short", ""),
        ("boilerplate", "kept result", ""),
        ("line", "h1\th2", ""),
        ("line", "a\t1", ""),
        ("line", "b\t2", ""),
        ("media", "", "embedded:obj0"),
        ("boilerplate", "a footnote", ""),
        ("boilerplate", "a header", ""),
    ]


def test_piece_split_mid_word_invents_no_space():
    spans, err = extract_doc_spans(
        write_doc([("para", LONG)], piece_split=9)
    )
    assert err is None
    assert spans == [("main", LONG, "")]


@pytest.mark.parametrize("stream", ["0Table", "1Table"])
def test_table_stream_selector(stream):
    data = write_doc([("para", LONG)], table_stream=stream)
    assert stream in list_streams(data)
    spans, err = extract_doc_spans(data)
    assert err is None and spans == [("main", LONG, "")]


def test_unicode_piece_round_trip():
    txt = "確認用の日本語テキスト段落がここに続いて入りますよ"
    spans, err = extract_doc_spans(
        write_doc([("para", "ascii lead-in paragraph body"), ("para", txt)])
    )
    assert err is None
    assert spans == [
        ("main", "ascii lead-in paragraph body", ""),
        ("main", txt, ""),
    ]


def test_nested_field_keeps_only_outer_result():
    # inner field nests INSIDE the outer field's code — everything up
    # to the outer separator is plumbing and must vanish
    code = 'IF \x13DATE\x14noise\x15 "a" "b"'
    spans, err = extract_doc_spans(
        write_doc([("field", code, "only the visible result survives")])
    )
    assert err is None
    assert spans == [("main", "only the visible result survives", "")]


def test_row_without_ttp_mark_still_emits():
    """Malformed table (no row terminator): cells still surface as one
    row rather than vanishing."""
    from machine_readability_checker_spark.core import doc as D

    # handcraft: one in-table cell paragraph, then plain text, no TTP
    data = write_doc([("table", [["x", "y"]]), ("para", LONG)])
    word = bytearray(read_stream(data, "WordDocument"))
    spans, err = extract_doc_spans(data)
    assert err is None
    assert ("line", "x\ty", "") in spans


def test_encrypted_and_garbage_quarantine():
    data = write_doc([("para", LONG)])
    word = bytearray(read_stream(data, "WordDocument"))
    flags = struct.unpack_from("<H", word, 0x0A)[0]
    struct.pack_into("<H", word, 0x0A, flags | 0x0100)
    enc = write_streams(
        {"WordDocument": bytes(word), "1Table": read_stream(data, "1Table")}
    )
    assert extract_doc_spans(enc) == ([], "encrypted .doc quarantined")
    spans, err = extract_doc_spans(b"junk not cfb")
    assert spans == [] and err is not None
    spans, err = extract_doc_spans(
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100
    )
    assert spans == [] and err is not None


def test_extract_document_integration():
    out = extract_document(
        "d1", "doc", write_doc([("heading", 1, "T"), ("para", LONG)])
    )
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]
    assert out["metrics"]["spans_out"] == 2
    bad = extract_document("d2", "doc", b"\x00" * 64)
    assert bad["parse_error"] is not None and bad["spans"] == []


def test_vertical_tab_and_special_chars():
    spans, err = extract_doc_spans(
        write_doc(
            [("para", "line one\x0bline two joined by break plus pad")]
        )
    )
    assert err is None
    assert spans == [("main", "line one line two joined by break plus pad", "")]


# ----------------------------------------------------- CFB multi-stream


def test_write_streams_round_trip_and_listing():
    blobs = {"WordDocument": b"W" * 5000, "1Table": b"T" * 100,
             "Data": b"D" * 9000}
    data = write_streams(blobs)
    assert list_streams(data) == ["WordDocument", "1Table", "Data"]
    for name, payload in blobs.items():
        got = read_stream(data, name)
        assert got is not None and got[: len(payload)] == payload


def test_cfb_subtype_sniffing(spark):
    """CFB refinement: .doc → msword, .xls → ms-excel, bare CFB stays."""
    from pyspark.sql import functions as F, types as T

    from machine_readability_checker_spark.core.xls import write_xls
    from machine_readability_checker_spark.operators.mimetype import (
        sniff_mime,
    )

    rows = [
        ("doc", write_doc([("para", LONG)])),
        ("xls", write_xls([{"name": "S", "rows": [["a"]]}])),
        ("cfb", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 24),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("tag", T.StringType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    got = {
        r["tag"]: r["mime"]
        for r in sniff_mime(df, "content").select("tag", "mime").collect()
    }
    assert got == {
        "doc": "application/msword",
        "xls": "application/vnd.ms-excel",
        "cfb": "application/x-cfb",
    }


# --------------------------------------------------------- TAP (tables)


def _ttp_papx_blobs(doc: bytes):
    """All PAPX payload bodies (istd + grpprl) from every FKP page,
    located by raw struct walking — no reader involved."""
    word = read_stream(doc, "WordDocument")
    table = read_stream(doc, "1Table") or read_stream(doc, "0Table")
    fc_papx = struct.unpack_from("<I", word, 0x9A + 8 * 13)[0]
    lcb = struct.unpack_from("<I", word, 0x9A + 8 * 13 + 4)[0]
    plc = table[fc_papx : fc_papx + lcb]
    n = (lcb - 4) // 8
    bodies = []
    for i in range(n):
        pn = struct.unpack_from("<I", plc, 4 * (n + 1) + 4 * i)[0] & 0x3FFFFF
        page = word[pn * 512 : (pn + 1) * 512]
        crun = page[511]
        for k in range(crun):
            b_off = page[4 * (crun + 1) + 13 * k]
            if not b_off:
                continue
            papx_off = 2 * b_off
            cb = page[papx_off]
            if cb == 0:
                size = 2 * page[papx_off + 1]
                bodies.append(bytes(page[papx_off + 2 : papx_off + 2 + size]))
            else:
                size = 2 * cb - 1
                bodies.append(bytes(page[papx_off + 1 : papx_off + 1 + size]))
    return bodies


def test_tap_raw_layout_matches_spec():
    """sprmTDefTable byte layout pinned independently of the reader:
    opcode 0xD608, u16 cb counting the operand minus 1, itcMac,
    (itcMac+1) rgdxaCenter boundaries, then 20-byte TC80s whose first
    u16 carries the merge flags ([MS-DOC] §2.9.317)."""
    doc = write_doc([("table", [[("wide", 2, 1), "x"], ["a", "b", "c"]])])
    ttp_bodies = []
    for body in _ttp_papx_blobs(doc):
        # grpprl after istd: look for sprmPFTtp 0x2417
        if b"\x17\x24\x01" in body:
            ttp_bodies.append(body)
    assert ttp_bodies, "no TTP PAPX found"
    body = ttp_bodies[0]
    i = body.find(b"\x08\xd6")  # sprmTDefTable little-endian
    assert i > 0, "no sprmTDefTable in TTP grpprl"
    cb = struct.unpack_from("<H", body, i + 2)[0]
    itc = body[i + 4]
    assert itc == 3  # colspan-2 run expands to 2 physical cells + "x"
    # operand byte count = cb + 1 (cb counts the operand minus 1)
    payload_len = 1 + 2 * (itc + 1) + 20 * itc
    assert cb == payload_len + 1
    # rgdxaCenter ascending
    bounds = struct.unpack_from(f"<{itc + 1}h", body, i + 5)
    assert list(bounds) == sorted(bounds)
    # TC80 flags: first cell fFirstMerged, second fMerged, third none
    tc_base = i + 5 + 2 * (itc + 1)
    flags = [
        struct.unpack_from("<H", body, tc_base + 20 * k)[0]
        for k in range(itc)
    ]
    assert flags[0] & 0x0001 and not flags[0] & 0x0002
    assert flags[1] & 0x0002 and not flags[1] & 0x0001
    assert flags[2] == 0


def test_doc_grids_match_html_variants():
    """The Word-97 variant fixtures densify to grids byte-identical to
    the HTML variant tables — the property that lets doc_table_rules
    share the HTML lane's verdict literals."""
    from machine_readability_checker_spark.core.doc import extract_doc_tables
    from machine_readability_checker_spark.core.html import extract_html_tables
    from machine_readability_checker_spark.operators.webtables import (
        doc_variant_doc,
        variant_page,
    )

    for v in range(3):
        dg = extract_doc_tables(doc_variant_doc(v, "prose for page"))
        hg, _ = extract_html_tables(variant_page(v, "different prose"))
        assert dg == hg, f"variant {v} grids differ"


def test_merged_cells_drop_from_line_spans():
    doc = write_doc([
        ("table", [
            [("span3", 3, 1)],
            ["a", "b", "c"],
            [("tall", 1, 2), "1", "2"],
            ["3", "4"],
        ]),
    ])
    spans, err = extract_doc_spans(doc)
    assert err is None
    lines = [t for k, t, _ in spans if k == "line"]
    assert lines == ["span3", "a\tb\tc", "tall\t1\t2", "3\t4"]


def test_rowspan_colspan_combined_densify():
    from machine_readability_checker_spark.core.doc import extract_doc_tables

    doc = write_doc([
        ("table", [
            [("big", 2, 2), "r1"],
            ["r2"],
            ["x", "y", "z"],
        ]),
    ])
    (grid,) = extract_doc_tables(doc)
    assert grid == [["big", "", "r1"], ["", "", "r2"], ["x", "y", "z"]]


def test_tap_tables_span_multiple_fkp_pages():
    """Many rows with large TAP payloads force the greedy FKP packer
    past one 512-byte page; round-trip must be lossless."""
    from machine_readability_checker_spark.core.doc import extract_doc_tables

    rows = [[f"r{i}c0", f"r{i}c1", f"r{i}c2", f"r{i}c3"] for i in range(40)]
    doc = write_doc([("para", LONG), ("table", rows), ("para", LONG)])
    spans, err = extract_doc_spans(doc)
    assert err is None
    lines = [t for k, t, _ in spans if k == "line"]
    assert lines == ["\t".join(r) for r in rows]
    (grid,) = extract_doc_tables(doc)
    assert grid == rows


def test_truncated_tap_does_not_crash():
    """A TAP whose TC80 array is cut short (real fast-saved files do
    this) degrades to flag-0 cells, never an exception."""
    from machine_readability_checker_spark.core.doc import (
        ParaProps,
        _scan_grpprl,
    )

    # sprmTDefTable claiming 2 cells but carrying only the boundaries
    payload = bytes([2]) + struct.pack("<3h", 0, 100, 200)
    grpprl = struct.pack("<HH", 0xD608, len(payload) + 1) + payload
    props = ParaProps()
    _scan_grpprl(grpprl, props)
    assert props.tap == (0, 0)
