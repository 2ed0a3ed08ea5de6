"""OpenDocument lane tests: ODS grid + side-channel reader, ODT layout
spans, xlsx-twin equivalence, Spark end-to-end.

The load-bearing property is format invariance: the same logical
workbook written as .ods and as .xlsx must produce identical spans,
identical rule results (modulo the L1-01 format-name message) and
identical metrics — the battery is defined over content + side-channel,
not over container bytes.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.grid import parse_document
from machine_readability_checker_spark.core.odf import (
    parse_ods,
    parse_odt,
    read_ods,
    write_ods,
    write_odt,
)
from machine_readability_checker_spark.core.xlsx import write_xlsx

_CONTENT_TMPL = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    "<office:document-content "
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" '
    'xmlns:fo="urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
    'xmlns:xlink="http://www.w3.org/1999/xlink">'
    "<office:body><office:spreadsheet>{body}</office:spreadsheet>"
    "</office:body></office:document-content>"
)


def _ods_from_xml(body: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", _CONTENT_TMPL.format(body=body))
    return buf.getvalue()


def test_ods_roundtrip_side_channel():
    sheets = [{
        "name": "Sheet1",
        "rows": [["col_a", "col_b", "col_c"],
                 ["alpha", 1, 2.5],
                 ["beta", 3, 7]],
        "merged": [(1, 1, 2, 1)],
        "hidden_rows": [2],
        "hidden_cols": [2],
        "styled": [(1, 0, "bold"), (2, 2, "yellow_fill"), (1, 2, "tiny")],
    }]
    wb = read_ods(write_ods(sheets, with_drawing=True))
    s = wb.sheets[0]
    assert s.name == "Sheet1"
    # covered cell under the merge keeps its value (xlsx parity)
    assert s.rows[:3] == [["col_a", "col_b", "col_c"],
                          ["alpha", 1, 2.5],
                          ["beta", 3, 7]]
    assert s.merged == [(1, 1, 2, 1)]
    assert s.hidden_rows == [2] and s.hidden_cols == [2]
    assert (1, 0, "bold") in s.format_flags
    assert (2, 2, "fill") in s.format_flags
    assert (1, 2, "font_size:8") in s.format_flags
    assert wb.drawing_parts  # embedded draw:image surfaced


def test_ods_repeats_covered_and_trailing_trim():
    """LibreOffice-style markup: repeated cells/rows, a repeat-to-max
    empty tail, covered cells, and typed values."""
    body = (
        '<table:table table:name="S">'
        "<table:table-column table:number-columns-repeated=\"3\"/>"
        "<table:table-row>"
        '<table:table-cell office:value-type="string">'
        "<text:p>x</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="2" '
        'office:value-type="float" office:value="5"/>'
        '<table:table-cell table:number-columns-repeated="16384"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="2">'
        '<table:table-cell office:value-type="float" office:value="1.5"/>'
        '<table:covered-table-cell office:value-type="float" '
        'office:value="9"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="4096"/>'
        "</table:table>"
    )
    wb = read_ods(_ods_from_xml(body))
    s = wb.sheets[0]
    assert s.rows == [["x", 5, 5], [1.5, 9, None], [1.5, 9, None]]


def test_ods_value_typing():
    body = (
        '<table:table table:name="S"><table:table-row>'
        '<table:table-cell office:value-type="float" office:value="12"/>'
        '<table:table-cell office:value-type="float" office:value="12.5"/>'
        '<table:table-cell office:value-type="boolean" '
        'office:boolean-value="true"/>'
        '<table:table-cell office:value-type="date" '
        'office:date-value="2024-04-01"/>'
        '<table:table-cell office:value-type="string">'
        "<text:p>line1</text:p><text:p>line2</text:p></table:table-cell>"
        '<table:table-cell office:value-type="percentage" '
        'office:value="0.25"/>'
        "</table:table-row></table:table>"
    )
    wb = read_ods(_ods_from_xml(body))
    assert wb.sheets[0].rows[0] == [
        12, 12.5, True, "2024-04-01", "line1\nline2", 0.25,
    ]
    assert isinstance(wb.sheets[0].rows[0][0], int)


def test_ods_hidden_dims_from_visibility():
    body = (
        '<table:table table:name="S">'
        "<table:table-column/>"
        '<table:table-column table:visibility="collapse"/>'
        "<table:table-row><table:table-cell office:value-type=\"float\" "
        'office:value="1"/><table:table-cell office:value-type="float" '
        'office:value="2"/></table:table-row>'
        '<table:table-row table:visibility="collapse">'
        '<table:table-cell office:value-type="float" office:value="3"/>'
        '<table:table-cell office:value-type="float" office:value="4"/>'
        "</table:table-row>"
        "</table:table>"
    )
    wb = read_ods(_ods_from_xml(body))
    assert wb.sheets[0].hidden_cols == [1]
    assert wb.sheets[0].hidden_rows == [1]


def test_ods_xlsx_twin_equivalence():
    """The same workbook through both containers: spans, metrics and
    every rule except the L1-01 format message must be identical."""
    sheets = [{
        "name": "Sheet1",
        "rows": [["col_a", "col_b", "col_c", "col_d"],
                 ["alpha", 1, 2.5, "x"],
                 ["beta　x", 3, 7, "y"],
                 ["gamma", 5, 9, "z①"]],
        "merged": [(1, 1, 2, 1)],
        "hidden_rows": [3],
        "hidden_cols": [3],
        "styled": [(1, 0, "bold"), (2, 2, "yellow_fill"), (3, 0, "red_font")],
    }]
    a = extract_document("d", "ods", write_ods(sheets),
                         header_start_row=1, header_end_row=1)
    b = extract_document("d", "xlsx", write_xlsx(sheets),
                         header_start_row=1, header_end_row=1)
    assert a["spans"] == b["spans"]
    ra = [(r["rule_id"], r["passed"], r["message"]) for r in a["results"]]
    rb = [(r["rule_id"], r["passed"], r["message"]) for r in b["results"]]
    diffs = [x[0] for x, y in zip(ra, rb) if x != y]
    assert diffs == ["L1-01"]
    # passed verdicts agree everywhere, including L1-01
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    ma = {k: v for k, v in a["metrics"].items() if k != "wall_ms"}
    mb = {k: v for k, v in b["metrics"].items() if k != "wall_ms"}
    assert ma == mb


def test_odt_spans():
    long_main = (
        "this paragraph easily clears the twenty-five character floor"
    )
    blob = write_odt(
        [("Title", "My Doc"),
         ("Heading2", "Part"),
         ("", ["machine reada", "bility split across spans but long enough"]),
         ("", "short")],
        images=["Pictures/x.png"],
        tables=[[["a", "b"], ["1", "2"]]],
    )
    doc = parse_odt(blob)
    assert doc.parse_error is None
    assert doc.layout_spans == [
        ("title", "My Doc", ""),
        ("heading", "Part", ""),
        # span runs concatenate with NO separator (Word/Writer split
        # words across runs routinely)
        ("main", "machine readability split across spans but long enough", ""),
        ("boilerplate", "short", ""),
        ("line", "a\tb", ""),
        ("line", "1\t2", ""),
        ("media", "", "Pictures/x.png"),
    ]
    del long_main


def test_odt_whitespace_entities():
    """text:tab → TAB, text:s c=N → N spaces, text:line-break → NL."""
    buf = io.BytesIO()
    content = _CONTENT_TMPL.replace(
        "<office:spreadsheet>{body}</office:spreadsheet>",
        "<office:text>"
        "<text:p>a<text:tab/>b<text:s text:c=\"3\"/>c<text:line-break/>"
        "this tail makes the paragraph clear the length floor</text:p>"
        "</office:text>",
    ).format()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", content)
    doc = parse_odt(buf.getvalue())
    assert doc.parse_error is None
    (kind, text, _), = doc.layout_spans
    assert kind == "main"
    assert text == (
        "a\tb   c\nthis tail makes the paragraph clear the length floor"
    )


def test_odf_quarantine_on_malformed():
    for fmt, parser in (("ods", parse_ods), ("odt", parse_odt)):
        doc = parser(b"not a zip at all")
        assert doc.parse_error is not None
        # and through the dispatch gate
        doc2 = parse_document(fmt, b"\x00\x01\x02")
        assert doc2.parse_error is not None


def test_ods_extension_gate_accepts():
    from machine_readability_checker_spark.core.grid import (
        ALLOWED_FORMATS,
        GRID_FORMATS,
    )

    assert {"ods", "odt"} <= ALLOWED_FORMATS
    assert "ods" in GRID_FORMATS and "odt" not in GRID_FORMATS


def test_odf_variant_tables_match_core():
    """The driver-lane oracle literals (__spark_entry__) must equal what
    the single-node core actually extracts — this pin is what makes the
    constructive DuckDB oracle non-circular."""
    import __spark_entry__ as entry

    for v in (0, 1, 2):
        fmt, blob, kw = entry._odf_variant_doc(v)
        out = extract_document("d", fmt, blob, **kw)
        assert out["parse_error"] is None
        got = [(s["kind"], s["text"], s["media_ref"]) for s in out["spans"]]
        assert got == entry._ODF_VARIANT_SPANS[v], f"variant {v}"
        if v in entry._ODF_VARIANT_RULES:
            rules = [(r["rule_id"], r["passed"]) for r in out["results"]]
            assert rules == entry._ODF_VARIANT_RULES[v], f"variant {v}"


@pytest.mark.usefixtures("spark")
def test_odf_spark_end_to_end(spark):
    """A mixed ods+odt corpus through the distributed extraction kernel:
    zero parse errors, grid spans for ods, layout spans for odt."""
    import pandas as pd

    from machine_readability_checker_spark.model import RAW_SCHEMA
    from machine_readability_checker_spark.operators.extract import extract
    from machine_readability_checker_spark.sources.fixtures import (
        fam_ods,
        fam_odt,
        gen_corpus,
    )

    corpus = gen_corpus(16, families=["ods_docs", "odt_docs"],
                        whale_every=None)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    extracted = extract(raw).cache()
    rows = extracted.collect()
    assert len(rows) == 16
    by_id = {r["doc_id"]: r for r in rows}
    kinds_by_fmt = {"ods": set(), "odt": set()}
    for doc_id, r in by_id.items():
        fmt = "ods" if "_ods" in doc_id else "odt"
        assert r["metrics"]["parse_errors"] == 0, doc_id
        for s in r["spans"]:
            kinds_by_fmt[fmt].add(s["kind"])
    assert {"header", "cell"} <= kinds_by_fmt["ods"]
    assert {"title", "heading", "main", "line", "media"} <= kinds_by_fmt["odt"]
    del pd, fam_ods, fam_odt
    extracted.unpersist()
