"""EPUB container tests: spine-order extraction over the HTML lane,
non-linear skipping, chapter-equivalence with raw HTML, quarantine."""

from __future__ import annotations

import io
import zipfile

from machine_readability_checker_spark.core.epub import (
    parse_epub,
    write_epub,
)
from machine_readability_checker_spark.core.grid import parse_document
from machine_readability_checker_spark.core.html import extract_html_spans

LONG = "this paragraph easily clears the twenty-five character floor ok"

CH1 = f"<html><body><h1>One</h1><p>{LONG} one</p></body></html>".encode()
CH2 = (
    f'<html><body><h1>Two</h1><p>{LONG} two</p>'
    '<img src="img/x.png"></body></html>'
).encode()
COVER = b"<html><body><p>COVER ART ONLY</p></body></html>"


def test_epub_concatenates_chapters_in_spine_order():
    doc = parse_epub(write_epub([CH1, CH2]))
    assert doc.parse_error is None
    exp = list(extract_html_spans(CH1)[0]) + list(extract_html_spans(CH2)[0])
    assert doc.layout_spans == exp
    # order is chapter 1 then chapter 2
    texts = [t for _, t, _ in doc.layout_spans]
    assert texts.index("One") < texts.index("Two")


def test_epub_single_chapter_equals_html_lane():
    doc = parse_epub(write_epub([CH2]))
    assert doc.layout_spans == list(extract_html_spans(CH2)[0])
    assert any(k == "media" for k, _, _ in doc.layout_spans)


def test_epub_nonlinear_spine_items_skipped():
    doc = parse_epub(write_epub([CH1], non_linear=[COVER]))
    assert doc.parse_error is None
    assert all("COVER" not in t for _, t, _ in doc.layout_spans)


def test_epub_spine_order_overrides_zip_order():
    """Chapters stored in the zip in reverse order still extract in
    spine order (the OPF is authoritative, not the archive layout)."""
    blob = write_epub([CH1, CH2])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        entries = {n: zf.read(n) for n in zf.namelist()}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name in sorted(entries, reverse=True):
            z.writestr(name, entries[name])
    doc = parse_epub(buf.getvalue())
    texts = [t for _, t, _ in doc.layout_spans]
    assert texts.index("One") < texts.index("Two")


def test_epub_quarantine_on_malformed():
    for bad in (b"", b"PK\x03\x04 truncated", b"not a zip"):
        doc = parse_epub(bad)
        assert doc.parse_error is not None
    # zip without container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
    assert parse_epub(buf.getvalue()).parse_error is not None
    # dispatch gate
    assert parse_document("epub", b"junk").parse_error is not None


def test_epub_variant_tables_match_core():
    """Driver-lane oracle literals must equal the single-node core's
    extraction (non-circularity pin for the constructive oracle)."""
    import __spark_entry__ as entry
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )

    for v in (0, 1, 2):
        out = extract_document("d", "epub", entry._epub_variant_doc(v))
        assert out["parse_error"] is None
        got = [(s["kind"], s["text"], s["media_ref"]) for s in out["spans"]]
        assert got == entry._EPUB_VARIANT_SPANS[v], f"variant {v}"


def test_epub_spark_end_to_end(spark):
    from machine_readability_checker_spark.model import RAW_SCHEMA
    from machine_readability_checker_spark.operators.extract import extract
    from machine_readability_checker_spark.sources.fixtures import gen_corpus

    corpus = gen_corpus(8, families=["epub_docs"], whale_every=None)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    rows = extract(raw).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["metrics"]["parse_errors"] == 0
        kinds = [s["kind"] for s in r["spans"]]
        assert "heading" in kinds and "main" in kinds and "media" in kinds
        assert all("COVER" not in s["text"] for s in r["spans"])
