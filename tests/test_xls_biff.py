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


def test_cfb_fat_sizing_terminates_and_roundtrips():
    """Regression: the FAT-sizing loop used to recompute n_fat from
    scratch each iteration, clobbering the increment and hanging for
    ~12% of payload sizes (first at 254 sectors ≈ 130 KB).  Boundary
    sizes must terminate AND round-trip."""
    for n_sectors in (253, 254, 255, 381, 508):
        payload = (b"\xAB" * 512) * n_sectors
        blob = write_single_stream("Workbook", payload)
        back = read_stream(blob, "Workbook")
        assert back is not None and back[: len(payload)] == payload


def test_cfb_oversized_payload_rejected():
    """> 109 FAT sectors would need chained DIFAT sectors the fixture
    writer does not emit — must fail loudly, not truncate silently."""
    import pytest

    with pytest.raises(ValueError, match="DIFAT"):
        write_single_stream("Workbook", b"x" * (8 * 1024 * 1024))


def test_xls_flag_hidden_column_detected():
    """Real Excel hides a column by setting fHidden and KEEPING the
    stored width; width==0 alone misses it."""
    import struct as _s

    blob = write_xls([{"name": "S", "rows": [["a", "b"], [1, 2]],
                       "hidden_cols": [1]}])
    # the fixture writer emits width=0 AND the flag; patch the width to a
    # real value (2340 twips) so ONLY the flag marks the column hidden —
    # that is what real Excel writes
    emitted = _s.pack("<HHHHHH", 1, 1, 0, 16, 0x0001, 0)
    patched_rec = _s.pack("<HHHHHH", 1, 1, 2340, 16, 0x0001, 0)
    assert emitted in blob
    patched = blob.replace(emitted, patched_rec)
    wb = read_xls(patched)
    assert 1 in wb.sheets[0].hidden_cols


def test_rk_integral_matches_number_path():
    """RK-stored integral doubles must surface as int exactly like
    NUMBER-stored ones (same value, same span text)."""
    from machine_readability_checker_spark.core.xls import _rk_value

    # integer RK: 7 << 2 | 0x02
    assert _rk_value((7 << 2) | 0x02) == 7
    # float RK holding 2.0 (high 32 bits of IEEE double 2.0)
    import struct as _s

    high = _s.unpack("<I", _s.pack("<d", 2.0)[4:])[0] & 0xFFFFFFFC
    assert _rk_value(high) == 2 and isinstance(_rk_value(high), int)
    # non-integral float survives as float
    high15 = _s.unpack("<I", _s.pack("<d", 1.5)[4:])[0] & 0xFFFFFFFC
    assert _rk_value(high15) == 1.5
