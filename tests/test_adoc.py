"""AsciiDoc lane: scanner + psv tables with span specs.

Cross-lane grid pin: the adoc variant tables must densify to grids
byte-identical to the HTML variants' (cell specs + continuation lines
express the same spans), which is what lets the driver's
adoc_table_rules lane reuse the HTML verdict literals.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from machine_readability_checker_spark.core.adoc import (
    extract_adoc_spans,
    extract_adoc_tables,
)
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.html import extract_html_tables

LONG = "This paragraph is long enough to classify as main content here."


def test_titles_lists_inline():
    spans, err = extract_adoc_spans(
        f"= Doc\n\n{LONG}\n\n== Part\n\n"
        "* short one\n* a second item stretching well past the floor\n\n"
        "Uses *strong*, `mono` and link:https://x.example[the label] "
        "inline across this sentence to reach length.\n".encode()
    )
    assert err is None
    assert spans == [
        ("title", "Doc", ""),
        ("main", LONG, ""),
        ("heading", "Part", ""),
        ("boilerplate", "short one", ""),
        ("main", "a second item stretching well past the floor", ""),
        ("main",
         "Uses strong, mono and the label inline across this sentence "
         "to reach length.", ""),
    ]


def test_blocks_and_media():
    spans, _ = extract_adoc_spans(
        ".Cap\nimage::a.png[alt text]\n\n"
        "[source,py]\n----\nx = 1\n----\n\n"
        "....\nlit\n....\n\n"
        "[stem]\n++++\na+b\n++++\n\n"
        "////\nhidden block\n////\n\n// line comment\n:attr: v\n"
        .encode()
    )
    assert spans == [
        ("media", "alt text", "a.png"),
        ("caption", "Cap", "a.png"),
        ("code", "x = 1", ""),
        ("code", "lit", ""),
        ("math", "a+b", ""),
    ]


def test_table_cell_specs_and_continuation():
    grids = extract_adoc_tables(
        "|===\n2+|wide\n\n| a | b\n\n| two\nline | 3\n|===\n".encode()
    )
    assert grids == [[
        ["wide", ""], ["a", "b"], ["two\nline", "3"],
    ]]
    # style-letter-ending content is never eaten as a spec
    grids = extract_adoc_tables(
        "|===\n| a | h | beta h\n| 1 | 2 | 3\n|===\n".encode()
    )
    assert grids == [[["a", "h", "beta h"], ["1", "2", "3"]]]


def test_adoc_grids_equal_html_grids():
    from machine_readability_checker_spark.operators.webtables import (
        ADOC_VARIANT_TABLES,
        VARIANT_TABLES,
        adoc_variant_doc,
    )

    for v in (0, 1, 2):
        html_grids, _enc = extract_html_tables(
            VARIANT_TABLES[v].encode(), ""
        )
        assert extract_adoc_tables(
            ADOC_VARIANT_TABLES[v].encode()
        ) == html_grids
        assert extract_adoc_tables(
            adoc_variant_doc(v, "prose | with *markup*")
        ) == html_grids


def test_extract_document_integration():
    out = extract_document("a", "adoc", f"= T\n\n{LONG}\n".encode())
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_adoc_never_raises(text):
    spans, err = extract_adoc_spans(text.encode("utf-8"))
    assert err is None or isinstance(err, str)
    extract_adoc_tables(text.encode("utf-8"))
