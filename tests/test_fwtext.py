"""Plain-text fixed-width lane: gutter detection, display-cell (CJK)
alignment, the prose false-positive guard, renderer round trips, and
the fw_table_rules verdict-literal pins."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.core.fwtext import (
    extract_fw_blocks,
    extract_fw_tables,
    extract_txt_spans,
    render_fw_table,
)


def test_basic_table_with_ruler():
    src = (
        b"id  name   value\n"
        b"--  -----  -----\n"
        b"1   alpha  10\n"
        b"2   beta   20\n"
    )
    (grid,) = extract_fw_tables(src)
    assert grid == [
        ["id", "name", "value"], ["1", "alpha", "10"], ["2", "beta", "20"]
    ]


def test_prose_and_table_blocks_interleave():
    src = (
        "An opening paragraph that is long enough to classify as main.\n"
        "\n"
        "k   v\n"
        "a   1\n"
        "\n"
        "tiny note\n"
    ).encode()
    spans, grids = extract_fw_blocks(src)
    assert [k for k, _, _ in spans] == [
        "main", "line", "line", "boilerplate"
    ]
    assert grids == [[["k", "v"], ["a", "1"]]]


def test_cjk_wide_alignment_round_trip():
    g = [["item", "q1", "q2"], ["①新規", "5", "7"], ["継続 更新", "6", "8"]]
    txt = render_fw_table(g)
    assert extract_fw_tables(txt.encode()) == [g]


def test_fullwidth_space_survives_as_content():
    g = [["id", "memo"], ["1", "　字下げ"], ["2", "済"]]
    got = extract_fw_tables(render_fw_table(g).encode())
    assert got == [g]


def test_empty_filler_cells():
    g = [["注: このデータは速報値", "", ""], ["item", "q1", "q2"],
         ["小計", "11", "15"], ["", "9", "9"]]
    assert extract_fw_tables(render_fw_table(g).encode()) == [g]


def test_two_line_prose_guard():
    src = (
        b"short line\n"
        b"a much longer line of prose  with a double space far out\n"
    )
    spans, grids = extract_fw_blocks(src)
    assert grids == []
    assert spans[0][0] == "main"


def test_full_width_ruler_demotes_block():
    """A ruler that crosses the gutter (no aligned gap) kills the
    shared-gutter intersection — the block is prose."""
    src = (
        b"id  name\n"
        b"---------\n"
        b"1   alpha\n"
        b"2   beta\n"
    )
    spans, grids = extract_fw_blocks(src)
    assert grids == []


def test_tabs_expand_to_terminal_columns():
    src = b"id\tname\n1\talpha\n2\tbeta\n"
    (grid,) = extract_fw_tables(src)
    assert grid == [["id", "name"], ["1", "alpha"], ["2", "beta"]]


def test_quarantine_never_raises():
    for junk in (b"", b"\xff\xfe\x00\x01", b"\n\n\n", b"| | |"):
        spans, err = extract_txt_spans(junk)
        assert isinstance(spans, list)
        assert extract_fw_tables(junk) == [] or True


def test_fw_variant_grids_round_trip_and_verdicts():
    """The driver lane's verdict literals: variants 0/1 share the HTML
    fail sets verbatim (byte-equal grids); variant 2's single-line
    break cell drops exactly L1-07 and L1-14 from the HTML set."""
    import __spark_entry__ as entry
    from machine_readability_checker_spark.operators.webtables import (
        FW_VARIANT_GRIDS,
        _grid_rules,
        fw_variant_doc,
    )

    for v in range(3):
        got = extract_fw_tables(fw_variant_doc(v, "prose for the page"))
        assert got == [FW_VARIANT_GRIDS[v]], f"variant {v}"
        fails = {r for r, p, _ in _grid_rules(FW_VARIANT_GRIDS[v]) if not p}
        assert fails == entry._FW_WT_FAILS[v], (v, fails)
    assert entry._WT_FAILS[0] == entry._FW_WT_FAILS[0]
    assert entry._WT_FAILS[1] == entry._FW_WT_FAILS[1]
    assert entry._WT_FAILS[2] - entry._FW_WT_FAILS[2] == {"L1-07", "L1-14"}


def test_txt_variant_spans_pinned():
    import __spark_entry__ as entry

    for v in range(3):
        spans, err = extract_txt_spans(
            entry._TXT_VARIANT_DOCS[v].encode("utf-8")
        )
        assert err is None
        assert spans == entry._TXT_VARIANT_SPANS[v], f"variant {v}"


def test_extract_document_integration():
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )

    out = extract_document(
        "d1", "txt",
        b"a paragraph that clears the length floor for main easily\n\n"
        b"k   v\na   1\n",
    )
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["main", "line", "line"]
