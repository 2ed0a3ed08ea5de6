"""BIFF8/CFB lane: round-trip of the stdlib .xls reader/writer."""

from __future__ import annotations

from machine_readability_checker_spark.core.cfb import (
    read_stream,
    write_single_stream,
)
from machine_readability_checker_spark.core.xls import read_xls, write_xls


def test_cfb_roundtrip():
    payload = bytes(range(256)) * 64
    blob = write_single_stream("Workbook", payload)
    assert read_stream(blob, "Workbook")[: len(payload)] == payload
    assert read_stream(blob, "Missing") is None
    assert read_stream(b"junk", "Workbook") is None


def test_xls_roundtrip_values_and_sidechannel():
    sheets = [
        {
            "name": "データ",
            "rows": [
                ["名前", "数量", None],
                ["あり", 5, 2.5],
                [True, "末尾", -3],
            ],
            "merged": [(1, 0, 2, 0)],
            "hidden_rows": [2],
            "hidden_cols": [1],
            "styled": [(1, 1, "bold"), (2, 2, "yellow_fill")],
        },
        {"name": "S2", "rows": [["only"]]},
    ]
    wb = read_xls(write_xls(sheets))
    assert wb.sheet_names() == ["データ", "S2"]
    s = wb.sheets[0]
    assert s.rows[0] == ["名前", "数量", None]
    assert s.rows[1] == ["あり", 5, 2.5]
    assert s.rows[2] == [True, "末尾", -3]
    assert s.merged == [(1, 0, 2, 0)]
    assert s.hidden_rows == [2] and s.hidden_cols == [1]
    flags = {(r, c): f for (r, c, f) in s.format_flags}
    assert flags[(1, 1)] == "bold"
    assert flags[(2, 2)] == "fill"
    assert wb.sheets[1].rows == [["only"]]


def test_xls_through_extraction_kernel():
    from machine_readability_checker_spark.core.extract import extract_document

    content = write_xls(
        [{"name": "Sheet1", "rows": [["h1", "h2"], ["a", 1], ["b", 2]],
          "merged": [(1, 0, 2, 0)]}]
    )
    r = extract_document("x1", "xls", content)
    assert r["parse_error"] is None
    kinds = [s["kind"] for s in r["spans"]]
    assert kinds == ["header", "header", "cell", "cell"]
    res = {x["rule_id"]: x for x in r["results"]}
    assert res["L1-12"]["passed"] is False
    assert "A2:A3" in res["L1-12"]["message"]
    # legacy format check is an early pass (reference quirk)
    assert res["L1-11"]["passed"] is True
    assert r["metrics"]["merged_cells"] == 1
