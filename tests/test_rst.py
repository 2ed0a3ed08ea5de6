"""reStructuredText lane: scanner + grid-table corner walk.

The grid pin is cross-LANE: the RST variant tables must densify to
grids byte-identical to the HTML variants' (the corner geometry
expresses the same col/row spans), which is what lets the driver's
rst_table_rules lane reuse the hand-derived HTML verdict literals.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.html import extract_html_tables
from machine_readability_checker_spark.core.rst import (
    extract_rst_spans,
    extract_rst_tables,
)

LONG = "This paragraph is long enough to classify as main content here."


def test_titles_and_headings():
    spans, err = extract_rst_spans(
        f"=====\nTitle\n=====\n\n{LONG}\n\nSection\n-------\n\n{LONG}\n"
        .encode()
    )
    assert err is None
    assert spans == [
        ("title", "Title", ""),
        ("main", LONG, ""),
        ("heading", "Section", ""),
        ("main", LONG, ""),
    ]


def test_inline_cleanup():
    spans, _ = extract_rst_spans(
        "Use **bold** words, ``literal`` text, a "
        "`named link <https://x.example>`_ and a plain ref_ here.\n"
        .encode()
    )
    assert spans == [
        ("main",
         "Use bold words, literal text, a named link and a plain ref "
         "here.", ""),
    ]


def test_directives_matrix():
    spans, _ = extract_rst_spans(
        ".. image:: a.png\n   :alt: the alt\n\n"
        ".. figure:: b.png\n\n   Cap text.\n\n"
        ".. code-block:: py\n\n   x = 1\n\n"
        ".. math::\n\n   a + b\n\n"
        ".. warning::\n   do not leak this\n\n"
        ".. _target: https://example.org\n\n"
        ".. just a comment\n   body\n".encode()
    )
    assert spans == [
        ("media", "the alt", "a.png"),
        ("media", "", "b.png"),
        ("caption", "Cap text.", "b.png"),
        ("code", "x = 1", ""),
        ("math", "a + b", ""),
    ]


def test_literal_block_and_lists():
    spans, _ = extract_rst_spans(
        "Example::\n\n   line one\n   line two\n\n"
        "- alpha item\n- beta item continues onto this very long line\n"
        .encode()
    )
    assert spans == [
        ("boilerplate", "Example:", ""),
        ("code", "line one\nline two", ""),
        ("boilerplate", "alpha item", ""),
        ("main", "beta item continues onto this very long line", ""),
    ]


def test_simple_table():
    grids = extract_rst_tables(
        "====  =====\ncol1  col2\n====  =====\nx     10\n====  =====\n"
        .encode()
    )
    assert grids == [[["col1", "col2"], ["x", "10"]]]


def test_grid_table_spans_and_multiline():
    grids = extract_rst_tables(
        "+--------------------+\n"
        "| wide header        |\n"
        "+------+------+------+\n"
        "| two  | 5    | 7    |\n"
        "| line |      |      |\n"
        "+------+------+------+\n"
        "| span | 11   | 15   |\n"
        "+      +------+------+\n"
        "|      | 9    | 9    |\n"
        "+------+------+------+\n".encode()
    )
    assert grids == [[
        ["wide header", "", ""],
        ["two\nline", "5", "7"],
        ["span", "11", "15"],
        ["", "9", "9"],
    ]]


def test_rst_grids_equal_html_grids():
    from machine_readability_checker_spark.operators.webtables import (
        RST_VARIANT_TABLES,
        VARIANT_TABLES,
        rst_variant_doc,
    )

    for v in (0, 1, 2):
        html_grids, _enc = extract_html_tables(
            VARIANT_TABLES[v].encode(), ""
        )
        assert extract_rst_tables(RST_VARIANT_TABLES[v].encode()) == (
            html_grids
        )
        assert extract_rst_tables(
            rst_variant_doc(v, "prose | with *markup* and + signs")
        ) == html_grids


def test_extract_document_integration():
    out = extract_document(
        "r", "rst", f"T\n===\n\n{LONG}\n".encode()
    )
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_rst_never_raises(text):
    spans, err = extract_rst_spans(text.encode("utf-8"))
    assert err is None or isinstance(err, str)
    extract_rst_tables(text.encode("utf-8"))
