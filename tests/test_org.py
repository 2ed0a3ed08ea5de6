"""Org-mode lane: scanner behavior, grid equality with the HTML
variants (the property that lets org_table_rules share the HTML
verdict literals), and the driver lane's pinned span sequences."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.core.org import (
    extract_org_blocks,
    extract_org_spans,
    extract_org_tables,
)


def test_title_keyword_and_headline_promotion():
    spans, _ = extract_org_blocks(b"#+TITLE: My Doc\n\n* Section One\n")
    assert spans == [("title", "My Doc", ""), ("heading", "Section One", "")]
    # without a #+TITLE the first headline promotes
    spans, _ = extract_org_blocks(b"* Lead\n\n* Next\n")
    assert spans == [("title", "Lead", ""), ("heading", "Next", "")]


def test_headline_todo_priority_tags_strip():
    spans, _ = extract_org_blocks(b"* TODO [#A] Fix the build :ci:urgent:\n")
    assert spans == [("title", "Fix the build", "")]
    spans, _ = extract_org_blocks(b"* DONE Ship it\n")
    assert spans == [("title", "Ship it", "")]


def test_inline_markup_unwraps():
    src = (
        b"Long enough paragraph with *bold* and /italic/ and =verb= and "
        b"~code~ and a [[https://e.com][label]] plus [[https://bare.com]].\n"
    )
    spans, _ = extract_org_blocks(src)
    assert spans == [(
        "main",
        "Long enough paragraph with bold and italic and verb and code "
        "and a label plus https://bare.com.",
        "",
    )]
    # snake_case and file/path slashes are NOT emphasis
    spans, _ = extract_org_blocks(
        b"A sentence mentioning snake_case_name and a/b ratios in prose.\n"
    )
    assert "snake_case_name" in spans[0][1]
    assert "a/b" in spans[0][1]


def test_blocks_and_fixed_width_and_math():
    src = (
        b"#+BEGIN_SRC py\nx = 1\n#+END_SRC\n\n"
        b"#+BEGIN_EXAMPLE\nliteral\n#+END_EXAMPLE\n\n"
        b": fixed one\n: fixed two\n\n"
        b"\\begin{align}\na &= b\n\\end{align}\n\n"
        b"#+BEGIN_COMMENT\nnever extracted\n#+END_COMMENT\n"
    )
    spans, _ = extract_org_blocks(src)
    assert spans == [
        ("code", "x = 1", ""),
        ("code", "literal", ""),
        ("code", "fixed one\nfixed two", ""),
        ("math", "a &= b", ""),
    ]


def test_captioned_image_and_drawer_drop():
    src = (
        b":PROPERTIES:\n:ID: x1\n:END:\n\n"
        b"#+CAPTION: Fig caption\n"
        b"[[file:img/a.png][alt text]]\n\n"
        b"[[file:img/b.png]]\n"
    )
    spans, _ = extract_org_blocks(src)
    assert spans == [
        ("media", "alt text", "img/a.png"),
        ("caption", "Fig caption", "img/a.png"),
        ("media", "", "img/b.png"),
    ]


def test_table_rule_rows_skip_and_forced_break():
    src = (
        "| h1 | h2 |\n"
        "|----+----|\n"
        "| a \\\\ b | 2 |\n"
        "| 　indent | x |\n"
    ).encode("utf-8")
    (grid,) = extract_org_tables(src)
    assert grid == [["h1", "h2"], ["a\nb", "2"], ["　indent", "x"]]
    spans, _ = extract_org_blocks(src)
    lines = [t for k, t, _ in spans if k == "line"]
    assert lines == ["h1\th2", "a\nb\t2", "　indent\tx"]


def test_ragged_rows_pad_to_width():
    (grid,) = extract_org_tables(b"| a | b | c |\n| x |\n")
    assert grid == [["a", "b", "c"], ["x", "", ""]]


def test_org_grids_match_html_variants():
    from machine_readability_checker_spark.core.html import (
        extract_html_tables,
    )
    from machine_readability_checker_spark.operators.webtables import (
        org_variant_doc,
        variant_page,
    )

    for v in range(3):
        og = extract_org_tables(org_variant_doc(v, "prose for page"))
        hg, _ = extract_html_tables(variant_page(v, "different prose"))
        assert og == hg, f"variant {v} grids differ"


def test_driver_variant_spans_pinned():
    """The oracle literals in __spark_entry__._ORG_VARIANT_SPANS are
    exactly what the scanner produces over the variant docs."""
    import __spark_entry__ as entry

    for v in range(3):
        spans, err = extract_org_spans(
            entry._ORG_VARIANT_DOCS[v].encode("utf-8")
        )
        assert err is None
        assert spans == entry._ORG_VARIANT_SPANS[v], f"variant {v}"


def test_quarantine_never_raises():
    for junk in (
        b"\xff\xfe garbage \x00\x01",
        b"| lone pipe",
        b"#+BEGIN_SRC\nunterminated",
        b"\\begin{eq}\nunterminated",
        b":DRAWER:\nno end",
        b"",
    ):
        spans, err = extract_org_spans(junk)
        assert isinstance(spans, list)
        tables = extract_org_tables(junk)
        assert isinstance(tables, list)


def test_extract_document_integration():
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )

    out = extract_document(
        "d1", "org",
        b"#+TITLE: T\n\nA paragraph long enough to clear the floor here.\n",
    )
    assert out["parse_error"] is None
    kinds = [s["kind"] for s in out["spans"]]
    assert kinds == ["title", "main"]
