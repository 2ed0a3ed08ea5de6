"""XLSB (BIFF12) lane: spec-pinned record decoding, reader/writer
round trips, and span/rule parity against the xlsx lane on identical
logical workbooks."""

from __future__ import annotations

import struct

from machine_readability_checker_spark.core import xlsb as XB
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.grid import parse_document
from machine_readability_checker_spark.core.xlsx import write_xlsx


# ------------------------------------------- spec pins (writer-free)


def test_rk_number_decodings():
    # [MS-XLSB] 2.5.122: bit0 fX100, bit1 fInt, 30-bit payload
    assert XB._rk_value((5 << 2) | 2) == 5                 # int
    assert XB._rk_value(((-7) & 0x3FFFFFFF) << 2 | 2) == -7  # sign extend
    assert XB._rk_value((1234 << 2) | 2 | 1) == 12.34      # int / 100
    assert XB._rk_value((500 << 2) | 2 | 1) == 5           # /100 integral
    # float path: top 30 bits of the IEEE double for 1.5
    bits = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
    assert XB._rk_value((bits >> 32) & 0xFFFFFFFC) == 1.5


def test_record_framing_two_byte_ids_and_multibyte_lengths():
    # record id 617 needs the 2-byte varint form; a 200-byte payload
    # needs a 2-byte length
    payload = bytes(200)
    data = XB._rec(617, payload) + XB._rec(0, b"\x01\x02\x03\x04")
    recs = list(XB.iter_records(data))
    assert recs[0][0] == 617 and recs[0][1] == payload
    assert recs[1][0] == 0 and len(recs[1][1]) == 4
    # truncated tail ends iteration instead of raising
    assert [r for r, _ in XB.iter_records(data[:-3])] == [617]


def test_hand_built_sheet_records_decode_per_spec():
    """Reader vs hand-assembled records (independent of write_xlsb):
    row header with fDyZero, RK / real / bool / error / inline-string
    cells, merged range, hidden column."""
    body = bytearray()
    body += XB._rec(XB.BRT_BEGIN_SHEET, b"")
    body += XB._rec(
        XB.BRT_COL_INFO,
        struct.pack("<IIII", 2, 3, 2340, 0) + bytes([0x01, 0]),
    )
    body += XB._rec(XB.BRT_BEGIN_SHEET_DATA, b"")
    # row 1, hidden (fDyZero = bit 4 of byte 11)
    body += XB._rec(
        XB.BRT_ROW_HDR,
        struct.pack("<IIH", 1, 0, 300) + bytes([0, 0x10])
        + struct.pack("<I", 0),
    )
    pre = XB._cell_prefix(0, 0)
    body += XB._rec(XB.BRT_CELL_RK, pre + struct.pack("<I", (42 << 2) | 2))
    body += XB._rec(
        XB.BRT_CELL_REAL, XB._cell_prefix(1, 0) + struct.pack("<d", 2.5)
    )
    body += XB._rec(XB.BRT_CELL_BOOL, XB._cell_prefix(2, 0) + b"\x01")
    body += XB._rec(XB.BRT_CELL_ERROR, XB._cell_prefix(3, 0) + b"\x2a")
    body += XB._rec(
        XB.BRT_CELL_ST, XB._cell_prefix(4, 0) + XB._pack_str("inline")
    )
    body += XB._rec(XB.BRT_END_SHEET_DATA, b"")
    body += XB._rec(
        XB.BRT_MERGE_CELL, struct.pack("<IIII", 0, 1, 0, 0)
    )
    body += XB._rec(XB.BRT_END_SHEET, b"")

    sheet = XB.XlsxSheet(name="S")
    XB._parse_sheet_bin(bytes(body), [], ([], [], []), sheet)
    assert sheet.rows[1] == [42, 2.5, True, "#N/A", "inline"]
    assert sheet.hidden_rows == [1]
    assert sheet.hidden_cols == [2, 3]
    assert sheet.merged == [(0, 0, 1, 0)]


# --------------------------------------------------- round trips


def _spec():
    return [
        {
            "name": "データ",
            "rows": [
                ["id", "名前", "val", "flag"],
                [1, "item一", 1.5, True],
                [2, "item二", -7, False],
                [3, "item三", 2.25, True],
            ],
            "merged": [(1, 0, 2, 0)],
            "hidden_rows": [3],
            "hidden_cols": [2],
            "styled": [(0, 0, "bold"), (1, 1, "yellow_fill"), (2, 2, "tiny")],
        },
        {"name": "Sheet2", "rows": [["a", "b"], ["x", "y"]]},
    ]


def test_write_read_roundtrip_values_and_side_channel():
    wb = XB.read_xlsb(XB.write_xlsb(_spec()))
    assert wb.sheet_names() == ["データ", "Sheet2"]
    s = wb.sheets[0]
    assert s.rows[0] == ["id", "名前", "val", "flag"]
    assert s.rows[1] == [1, "item一", 1.5, True]
    assert s.rows[2] == [2, "item二", -7, False]
    assert s.merged == [(1, 0, 2, 0)]
    assert s.hidden_rows == [3]
    assert s.hidden_cols == [2]
    flags = {(r, c): f for r, c, f in s.format_flags}
    assert flags[(0, 0)] == "bold"
    assert flags[(1, 1)] == "fill"
    assert flags[(2, 2)] == "font_size:8"
    # shared + inline string paths both used by construction (>=3 strs)
    assert wb.sheets[1].rows == [["a", "b"], ["x", "y"]]


def test_drawing_part_detected():
    wb = XB.read_xlsb(XB.write_xlsb(_spec(), with_drawing=True))
    assert wb.drawing_parts == ["xl/drawings/drawing1.xml"]


def test_parse_document_routes_and_quarantines():
    doc = parse_document("xlsb", XB.write_xlsb(_spec()))
    assert doc.parse_error is None
    assert doc.sheet_names() == ["データ", "Sheet2"]
    bad = parse_document("xlsb", b"\x00\x01not a zip")
    assert bad.parse_error is not None and not bad.sheets


# -------------------------------------------- parity with the xlsx lane


def test_xlsb_extraction_matches_xlsx_on_identical_workbook():
    """The same logical workbook written by both writers must extract
    identical span sequences and identical rule verdicts (except the
    format-identity rule L1-01, whose message names the format)."""
    spec = [
        {
            "name": "表",
            "rows": [
                ["注: annotation row", None, None],
                ["id", "name", "val"],
                ["1", "a", "10"],
                ["2", "b", "20"],
                ["3", "c", "30"],
            ],
            "merged": [(2, 1, 3, 1)],
            "hidden_rows": [4],
            "styled": [(2, 0, "red_font")],
        }
    ]
    rx = extract_document("d1", "xlsx", write_xlsx(spec))
    rb = extract_document("d1", "xlsb", XB.write_xlsb(spec))
    sx = [(s["kind"], s["text"], s["media_ref"]) for s in rx["spans"]]
    sb = [(s["kind"], s["text"], s["media_ref"]) for s in rb["spans"]]
    assert sx == sb and len(sx) > 0
    vx = {r["rule_id"]: r["passed"] for r in rx["results"]}
    vb = {r["rule_id"]: r["passed"] for r in rb["results"]}
    assert vx == vb
    mx = {r["rule_id"]: r["message"] for r in rx["results"]}
    mb = {r["rule_id"]: r["message"] for r in rb["results"]}
    diff = {k for k in mx if mx[k] != mb[k]}
    assert diff <= {"L1-01"}


def test_xlsb_media_span_parity():
    spec = [{"name": "S", "rows": [["h"], ["v"]]}]
    rb = extract_document("d1", "xlsb", XB.write_xlsb(spec, with_drawing=True))
    kinds = [s["kind"] for s in rb["spans"]]
    assert "media" in kinds
