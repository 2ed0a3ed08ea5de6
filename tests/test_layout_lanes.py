"""HTML and PDF layout lanes: unit + property tests.

The layout analyzers must never crash on arbitrary input, must keep
reading order, and must classify the deterministic fixtures exactly.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from machine_readability_checker_spark.core.checks import (
    check_code_format_for_choices,
    check_codebook_exists,
)
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.html import extract_html_spans
from machine_readability_checker_spark.core.pdf import (
    analyze_layout,
    cluster_lines,
    extract_pdf_spans,
    parse_text_runs,
    write_pdf,
    TextRun,
)


# ---------------------------------------------------------------- pdf


def test_pdf_reading_order_and_kinds():
    items = [
        {"text": "Title", "x": 72, "y": 700, "size": 20},
        {"text": "para one", "x": 72, "y": 650, "size": 11},
        {"text": "colA", "x": 72, "y": 600, "size": 11},
        {"text": "colB", "x": 200, "y": 600, "size": 11},
        {"text": "a1", "x": 72, "y": 584, "size": 11},
        {"text": "b1", "x": 200, "y": 584, "size": 11},
        {"text": "footer", "x": 72, "y": 100, "size": 11},
        {"image": True},
    ]
    spans, err = extract_pdf_spans(write_pdf(items))
    assert err is None
    kinds = [k for k, _, _ in spans]
    texts = [t for _, t, _ in spans]
    assert kinds == ["heading", "line", "cell", "cell", "line", "media"]
    assert texts[0] == "Title"
    assert texts[2] == "colA\tcolB" and texts[3] == "a1\tb1"
    assert texts[4] == "footer"
    assert spans[-1][2].startswith("pdf/obj")


def test_pdf_escapes_roundtrip():
    items = [{"text": "a(b)c\\d", "x": 72, "y": 700, "size": 12}]
    spans, err = extract_pdf_spans(write_pdf(items))
    assert err is None
    assert spans[0][1] == "a(b)c\\d"


def test_pdf_tj_kerning_word_gaps():
    """Justified producers emit TJ arrays with negative milli-em offsets
    instead of space glyphs; a −250 gap must read as a space, a −15
    intra-word kern must not."""
    items = [
        {"text": "Justified Title Here", "x": 72, "y": 700, "size": 20},
        {"text": "prose with several justified words", "x": 72, "y": 650,
         "size": 11},
    ]
    base, err = extract_pdf_spans(write_pdf(items))
    assert err is None
    tj_items = [dict(it, tj=True) for it in items]
    for kw in (dict(), dict(compress=True)):
        spans, err = extract_pdf_spans(write_pdf(tj_items, **kw))
        assert err is None, (kw, err)
        assert spans == base, kw


def test_pdf_corrupt_flate_quarantines():
    """A /FlateDecode stream whose bytes aren't valid zlib must
    quarantine with a parse error, never crash the task."""
    fake = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 4 >>\n"
        b"stream\nBTxx\nendstream\nendobj\n"
    )
    spans, err = extract_pdf_spans(fake)
    assert spans == [] and "flate inflate failed" in err


def test_pdf_flate_variants_span_identical():
    """Flate-compressed content streams (the real-world layout) must
    extract span-identically to their uncompressed twin, across hex
    strings, PNG row predictors, and indirect /Length references."""
    items = [
        {"text": "Flate Title", "x": 72, "y": 720, "size": 20},
        {"text": "Prose body line under the title.", "x": 72, "y": 690, "size": 11},
        {"text": "k1", "x": 72, "y": 650, "size": 11},
        {"text": "v1", "x": 200, "y": 650, "size": 11},
        {"text": "k2", "x": 72, "y": 634, "size": 11},
        {"text": "v2", "x": 200, "y": 634, "size": 11},
        {"image": True},
    ]
    base, err = extract_pdf_spans(write_pdf(items))
    assert err is None and base
    for kw in (
        dict(compress=True),
        dict(compress=True, predictor_columns=16),
        dict(hex_strings=True),
        dict(compress=True, hex_strings=True),
        dict(compress=True, indirect_length=True),
        dict(
            compress=True,
            predictor_columns=8,
            hex_strings=True,
            indirect_length=True,
        ),
    ):
        spans, err = extract_pdf_spans(write_pdf(items, **kw))
        assert err is None, (kw, err)
        assert spans == base, kw


def test_pdf_encrypted_and_cid_quarantine():
    """Deliberate quarantines: /Encrypt documents and CID/Type0 fonts
    (2-byte glyph indices need the CMap — decoding would emit garbage),
    including a Type0 declaration hidden inside a Flate ObjStm."""
    import zlib as _z

    items = [{"text": "Visible body line of text.", "x": 72, "y": 700, "size": 11}]
    good = write_pdf(items, compress=True)

    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    spans, err = extract_pdf_spans(enc)
    assert spans == [] and "encrypted" in err

    t0 = good.replace(b"/Subtype /Type1", b"/Subtype /Type0")
    spans, err = extract_pdf_spans(t0)
    assert spans == [] and "Type0" in err

    inner = b"7 0 << /Type /Font /Subtype /Type0 /BaseFont /MS-Gothic >>"
    comp = _z.compress(inner)
    objstm = (
        b"8 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(comp)
    ) + comp + b"\nendstream\nendobj\n"
    hidden = good.replace(b"xref\n", objstm + b"xref\n", 1)
    spans, err = extract_pdf_spans(hidden)
    assert spans == [] and "Type0" in err

    # an unsupported filter on a NON-text stream (image data) is skipped,
    # not fatal — the page still extracts
    dct = (
        b"9 0 obj\n<< /Filter /DCTDecode /Length 3 >>\n"
        b"stream\n\x01\x02\x03\nendstream\nendobj\n"
    )
    spans, err = extract_pdf_spans(good.replace(b"xref\n", dct + b"xref\n", 1))
    assert err is None and spans == [
        ("line", "Visible body line of text.", "")
    ]


def test_pdf_length_lies_falls_back_to_scan():
    """A wrong direct /Length (truncating writers exist) must not break
    extraction: the parser falls back to an endstream scan."""
    items = [{"text": "Fallback scan body line here.", "x": 72, "y": 700, "size": 11}]
    blob = write_pdf(items)
    base, _ = extract_pdf_spans(blob)
    import re as _re

    lied = _re.sub(rb"/Length (\d+)", b"/Length 7", blob, count=1)
    spans, err = extract_pdf_spans(lied)
    assert err is None and spans == base


pdf_item = st.fixed_dictionaries(
    {
        "text": st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=12,
        ),
        "x": st.integers(0, 600),
        "y": st.integers(0, 780),
        "size": st.sampled_from([8, 11, 12, 14, 20]),
    }
)


@given(st.lists(pdf_item, min_size=0, max_size=25))
@settings(max_examples=60, deadline=None)
def test_pdf_layout_invariants(items):
    content = write_pdf(items)
    spans, err = extract_pdf_spans(content)
    if not items:
        assert spans == []
        return
    assert err is None
    # every non-empty text item lands in exactly one span, in y-descending
    # (reading) order of its line
    runs = parse_text_runs(
        content.split(b"stream\n")[1].split(b"\nendstream")[0].decode("latin-1")
    )
    lines = cluster_lines(runs)
    ys = [line[0].y for line in lines]
    assert ys == sorted(ys, reverse=True)
    # XY-cut may tear a baseline into per-column halves, so the span
    # count is bounded by [lines, runs] rather than equal to lines
    n_spans = len(analyze_layout(runs))
    assert len(lines) <= n_spans <= len(runs)
    joined_spans = " ".join(t for _, t, _ in spans)
    for it in items:
        assert it["text"] in joined_spans


# ---------------------------------------------------------------- html

html_chunk = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x3050),
    max_size=30,
)


@given(st.lists(html_chunk, max_size=10), st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_html_never_crashes(chunks, variant):
    parts = []
    for i, c in enumerate(chunks):
        tag = ["p", "div", "a href='x'", "nav"][(i + variant) % 4]
        parts.append(f"<{tag.split()[0]}>{c}</{tag.split()[0]}>")
    doc = f"<html><body>{''.join(parts)}</body></html>".encode("utf-8")
    spans, enc = extract_html_spans(doc)
    for kind, text, ref in spans:
        assert kind in {"title", "heading", "main", "boilerplate", "media"}
    # idempotent through the full kernel, offsets strictly increasing
    r = extract_document("h", "html", doc)
    offs = [s["offset"] for s in r["spans"]]
    assert offs == list(range(len(offs)))


# --------------------------------------------------------- L3 checks


def test_code_format_check_branches():
    import pandas as pd

    from machine_readability_checker_spark.core.grid import ParsedDoc
    from machine_readability_checker_spark.core.zones import ZoneContext

    doc = ParsedDoc(fmt="csv")
    ctx = ZoneContext(sheet_name="s", valid=True)
    mixed = pd.DataFrame({"c": ["1", "2", "ラベル"]})
    passed, msg = check_code_format_for_choices(doc, ctx, mixed)
    assert not passed and "c" in msg

    pure_codes = pd.DataFrame({"c": ["1", "2", "3"]})
    assert check_code_format_for_choices(doc, ctx, pure_codes)[0]

    pure_labels = pd.DataFrame({"c": ["はい", "いいえ"]})
    assert check_code_format_for_choices(doc, ctx, pure_labels)[0]

    many = pd.DataFrame({"c": [str(i) if i % 2 else f"l{i}" for i in range(30)]})
    assert check_code_format_for_choices(doc, ctx, many)[0]  # ≥10 distinct


def test_codebook_check_branches():
    from machine_readability_checker_spark.core.grid import ParsedDoc, SheetGrid

    doc = ParsedDoc(fmt="xlsx")
    doc.sheets = [SheetGrid("データ", [["a", "b"]])]
    assert not check_codebook_exists(doc, None, None)[0]

    doc.sheets.append(SheetGrid("コード表", [["x"]]))
    assert check_codebook_exists(doc, None, None)[0]

    doc2 = ParsedDoc(fmt="csv")
    doc2.sheets = [SheetGrid("CSV", [["補足"], ["1 = 男性"]])]
    assert check_codebook_exists(doc2, None, None)[0]


def test_docx_spans_styles_tables_media():
    """DOCX layout lane: Title/Heading styles map to title/heading,
    long paragraphs to main, short ones to boilerplate, tables to
    tab-joined line spans in reading order, embedded images to media
    spans carrying the relationship target."""
    from machine_readability_checker_spark.core.docx import (
        extract_docx_spans,
        write_docx,
    )

    long_para = (
        "this paragraph easily clears the twenty-five character floor"
    )
    blob = write_docx(
        [
            ("Title", "Annual Summary"),
            ("Heading2", "Methods"),
            ("", long_para),
            ("", "tiny"),
        ],
        images=["media/image9.png"],
        tables=[[["a", "b"], ["1", "2"]]],
    )
    spans, err = extract_docx_spans(blob)
    assert err is None
    assert spans == [
        ("title", "Annual Summary", ""),
        ("heading", "Methods", ""),
        ("main", long_para, ""),
        ("boilerplate", "tiny", ""),
        ("media", "", "media/image9.png"),
        ("line", "a\tb", ""),
        ("line", "1\t2", ""),
    ]


def test_docx_pptx_multirun_no_spurious_spaces():
    """Word/PowerPoint split single words across runs (rsid tracking,
    mid-word formatting); run texts must concatenate with NO separator
    (python-docx semantics) — a space-join invents mid-word spaces."""
    from machine_readability_checker_spark.core.docx import (
        extract_docx_spans,
        write_docx,
    )
    from machine_readability_checker_spark.core.pptx import (
        extract_pptx_spans,
        write_pptx,
    )

    body = ["machine reada", "bility is judged per span sequence"]
    blob = write_docx([("Title", ["Ti", "tle"]), ("", body)])
    spans, err = extract_docx_spans(blob)
    assert err is None
    assert spans == [
        ("title", "Title", ""),
        ("main", "machine readability is judged per span sequence", ""),
    ]

    # runs whose boundary falls ON whitespace must not collapse words
    blob2 = write_docx([("", ["alpha ", "beta and a long enough tail"])])
    spans2, _ = extract_docx_spans(blob2)
    assert spans2 == [("main", "alpha beta and a long enough tail", "")]

    pblob = write_pptx(
        [{"title": ["Sp", "lit title"], "bodies": [body]}]
    )
    pspans, perr = extract_pptx_spans(pblob)
    assert perr is None
    assert pspans == [
        ("title", "Split title", ""),
        ("main", "machine readability is judged per span sequence", ""),
    ]


def test_docx_quarantine_and_dispatch():
    """Malformed docx bytes quarantine (parse_errors=1, zero spans);
    good bytes flow through extract_document with ordered offsets."""
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.core.docx import write_docx

    bad = extract_document("d1", "docx", b"PK\x03\x04 not a real zip")
    assert bad["metrics"]["parse_errors"] == 1 and bad["spans"] == []

    # a zip that is valid but lacks word/document.xml also quarantines
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    bad2 = extract_document("d2", "docx", buf.getvalue())
    assert bad2["metrics"]["parse_errors"] == 1

    good = extract_document(
        "d3", "docx", write_docx([("Title", "T"), ("", "x" * 30)])
    )
    assert good["metrics"]["parse_errors"] == 0
    assert [s["kind"] for s in good["spans"]] == ["title", "main"]
    assert [s["offset"] for s in good["spans"]] == [0, 1]


def test_docx_distributed_matches_oracle(spark):
    """Distributed kernel output for docx docs equals the single-node
    oracle (the shared-core contract) across a small fixture batch."""
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.model import RAW_SCHEMA
    from machine_readability_checker_spark.operators.extract import extract
    from machine_readability_checker_spark.sources.fixtures import (
            FAMILIES,
            gen_corpus,
        )

    corpus = gen_corpus(2 * len(FAMILIES) + 1)
    docx_rows = corpus[corpus["fmt"] == "docx"]
    assert len(docx_rows) >= 2  # family present in the cycle
    df = spark.createDataFrame(docx_rows, schema=RAW_SCHEMA)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in extract(df).select("doc_id", "spans").collect()
    }
    for row in docx_rows.itertuples(index=False):
        exp = extract_document(row.doc_id, "docx", bytes(row.content))
        exp_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in exp["spans"]
        ]
        assert got[row.doc_id] == exp_spans


def test_pptx_spans_placeholders_tables_media():
    """PPTX layout lane: title/ctrTitle placeholders map to title,
    subTitle to heading, long body paragraphs to main, short ones to
    boilerplate, a:tbl rows to tab-joined line spans, pictures to media
    spans carrying the slide-rel target — slides in presentation order."""
    from machine_readability_checker_spark.core.pptx import (
        extract_pptx_spans,
        write_pptx,
    )

    long_body = (
        "this bullet easily clears the twenty-five character floor too"
    )
    blob = write_pptx(
        [
            {
                "title": "Quarterly Review",
                "subtitle": "FY26 Q2",
                "bodies": [long_body, "tiny"],
                "images": ["../media/image3.png"],
                "tables": [[["a", "b"], ["1", "2"]]],
            },
            {"title": "Backup"},
        ]
    )
    spans, err = extract_pptx_spans(blob)
    assert err is None
    assert spans == [
        ("title", "Quarterly Review", ""),
        ("heading", "FY26 Q2", ""),
        ("main", long_body, ""),
        ("boilerplate", "tiny", ""),
        ("media", "", "../media/image3.png"),
        ("line", "a\tb", ""),
        ("line", "1\t2", ""),
        ("title", "Backup", ""),
    ]


def test_pptx_quarantine_and_dispatch():
    """Malformed pptx bytes quarantine; good bytes flow through
    extract_document with ordered offsets and a media span."""
    import io
    import zipfile

    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.core.pptx import write_pptx

    bad = extract_document("p1", "pptx", b"PK\x03\x04 not a real zip")
    assert bad["metrics"]["parse_errors"] == 1 and bad["spans"] == []

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    bad2 = extract_document("p2", "pptx", buf.getvalue())
    assert bad2["metrics"]["parse_errors"] == 1

    good = extract_document(
        "p3",
        "pptx",
        write_pptx([{"title": "T", "bodies": ["y" * 30], "images": ["i.png"]}]),
    )
    assert good["metrics"]["parse_errors"] == 0
    kinds = [s["kind"] for s in good["spans"]]
    assert kinds == ["title", "main", "media"]
    assert [s["offset"] for s in good["spans"]] == [0, 1, 2]


def test_rtf_spans_tokenizer():
    """RTF lane: paragraphs length-classified, fonttbl/colortbl skipped,
    hex + unicode escapes decoded (\\uc fallback honored), \\pict
    surfaces as a media span, escaped braces/backslashes literal."""
    from machine_readability_checker_spark.core.rtf import (
        extract_rtf_spans,
        write_rtf,
    )

    long_para = (
        "this paragraph easily clears the twenty-five character floor"
    )
    blob = write_rtf(
        [long_para, "tiny", "curly {brace} and back\\slash", "naïve café"],
        with_picts=1,
        unicode_demo=True,
    )
    spans, err = extract_rtf_spans(blob)
    assert err is None
    assert spans == [
        ("main", long_para, ""),
        ("boilerplate", "tiny", ""),
        ("main", "curly {brace} and back\\slash", ""),
        ("boilerplate", "naïve café", ""),
        ("media", "", "pict1"),
    ]

    # hand-built: \'e9 hex escape, \tab, \emdash, ignorable {\*\...}
    raw = (
        b"{\\rtf1\\ansi caf\\'e9\\tab x \\emdash y"
        b"{\\*\\generator Fancy 1.0;}\\par }"
    )
    spans2, err2 = extract_rtf_spans(raw)
    assert err2 is None
    # per spec the single space after \emdash is a delimiter, not text
    assert spans2 == [("boilerplate", "café x —y", "")]


def test_rtf_uc_fallback_counts_hex_escape_as_one_entity():
    """Word writes ``\\uc1\\uN\\'hh`` for CJK: the \\'hh hex escape (4
    raw chars) is ONE skippable fallback entity, not one raw char — a
    raw-char skip leaks the escape tail ("'93") into the text."""
    from machine_readability_checker_spark.core.rtf import (
        extract_rtf_spans,
    )

    # \uc1: one fallback entity per \uN, here a cp932-ish \'hh each
    raw = b"{\\rtf1\\ansi\\uc1 \\u26085\\'93\\u26412\\'96\\par }"
    spans, err = extract_rtf_spans(raw)
    assert err is None
    assert spans == [("boilerplate", "日本", "")]

    # \uc2: two fallback entities (double-byte cp932 fallback \'93\'fa)
    raw2 = b"{\\rtf1\\ansi\\uc2 \\u26085\\'93\\'fa ok\\par }"
    spans2, err2 = extract_rtf_spans(raw2)
    assert err2 is None
    assert spans2 == [("boilerplate", "日 ok", "")]

    # mixed fallback: escaped-brace entity + one plain char under \uc2
    raw3 = b"{\\rtf1\\ansi\\uc2 \\u26085\\{x tail\\par }"
    spans3, err3 = extract_rtf_spans(raw3)
    assert err3 is None
    assert spans3 == [("boilerplate", "日 tail", "")]


def test_rtf_quarantine_and_dispatch():
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.core.rtf import write_rtf

    bad = extract_document("r1", "rtf", b"this is not rtf at all")
    assert bad["metrics"]["parse_errors"] == 1 and bad["spans"] == []
    unbalanced = extract_document("r2", "rtf", b"{\\rtf1 {\\b open")
    assert unbalanced["metrics"]["parse_errors"] == 1

    good = extract_document(
        "r3", "rtf", write_rtf(["x" * 30, "y"], with_picts=1)
    )
    assert good["metrics"]["parse_errors"] == 0
    assert [s["kind"] for s in good["spans"]] == ["main", "boilerplate", "media"]
    assert [s["offset"] for s in good["spans"]] == [0, 1, 2]


def test_gzip_transparent_ingest_and_bomb_guard(monkeypatch):
    """Gzipped members parse identically to plain bytes for any format,
    corrupt gzip quarantines, and a decompression bomb hits the size cap
    instead of inflating (guard shrunk for the test)."""
    import gzip

    from machine_readability_checker_spark.core import grid
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.core.rtf import write_rtf

    html = (
        b"<html><body><p>a paragraph easily long enough to be main "
        b"content here</p></body></html>"
    )
    plain = extract_document("g1", "html", html)
    gz = extract_document("g2", "html", gzip.compress(html, mtime=0))
    assert plain["metrics"]["parse_errors"] == 0
    assert [
        (s["kind"], s["text"]) for s in gz["spans"]
    ] == [(s["kind"], s["text"]) for s in plain["spans"]]

    rtf = write_rtf(["x" * 30])
    assert (
        extract_document("g3", "rtf", gzip.compress(rtf))["metrics"][
            "parse_errors"
        ]
        == 0
    )

    bad = extract_document("g4", "html", b"\x1f\x8b\x08corrupt-stream")
    assert bad["metrics"]["parse_errors"] == 1

    monkeypatch.setattr(grid, "MAX_GUNZIP_BYTES", 1024)
    bomb = gzip.compress(b"A" * 100_000)
    assert len(bomb) < 1024  # highly compressible: the bomb shape
    doc = grid.parse_document("csv", bomb)
    assert doc.parse_error and "bomb guard" in doc.parse_error
