"""hOCR lane (OCR output) + ocr_conf_stats quality signals."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.hocr import (
    extract_hocr_blocks,
    extract_hocr_spans,
    write_hocr,
)

LONG = "This paragraph is long enough to classify as main body content."


def _one_page(blocks, image="p.png"):
    return write_hocr([{"image": image, "blocks": blocks}])


def test_roles_and_title_promotion():
    spans, err = extract_hocr_spans(_one_page([
        ("heading", "Chapter One", (0, 0, 10, 10), [96, 97]),
        ("para", LONG, (0, 20, 10, 30), [95] * len(LONG.split())),
        ("photo", None, (0, 40, 50, 90), []),
        ("caption", "Figure 1", (0, 95, 50, 99), [90, 91]),
        ("para", "tiny", (0, 100, 5, 110), [40]),
    ]))
    assert err is None
    assert spans == [
        ("title", "Chapter One", ""),
        ("main", LONG, ""),
        ("media", "", "p.png#bbox(0,40,50,90)"),
        ("caption", "Figure 1", ""),
        ("boilerplate", "tiny", ""),
    ]


def test_media_ref_tracks_page_image():
    data = write_hocr([
        {"image": "a.png", "blocks": [
            ("photo", None, (1, 1, 2, 2), [])]},
        {"image": "b.png", "blocks": [
            ("photo", None, (3, 3, 4, 4), [])]},
    ])
    spans, _ = extract_hocr_spans(data)
    assert [s[2] for s in spans] == [
        "a.png#bbox(1,1,2,2)", "b.png#bbox(3,3,4,4)",
    ]


def test_word_confidences_collected():
    blocks, n_pages = extract_hocr_blocks(_one_page([
        ("para", "alpha beta gamma", (0, 0, 9, 9), [91, 82, 73]),
    ]))
    assert n_pages == 1
    assert blocks == [("para", "alpha beta gamma", "",
                       [91.0, 82.0, 73.0])]


def test_entities_unescape_and_escaped_fixture_words():
    spans, _ = extract_hocr_spans(_one_page([
        ("para", "Profit & loss <summary> beats last year handily.",
         (0, 0, 9, 9), [90] * 8),
    ]))
    assert spans == [
        ("main", "Profit & loss <summary> beats last year handily.", ""),
    ]


def test_orphan_line_and_bare_text():
    data = (
        "<html><body><div class='ocr_page' "
        "title='image \"c.png\"; bbox 0 0 9 9'>"
        "<span class='ocr_line' title='bbox 1 1 8 2'>bare words here"
        "</span></div></body></html>"
    ).encode()
    spans, err = extract_hocr_spans(data)
    assert err is None
    assert spans == [("boilerplate", "bare words here", "")]


def test_non_hocr_quarantines():
    spans, err = extract_hocr_spans(b"just some plain text, no hocr")
    assert spans == [] and err is not None
    out = extract_document("d", "hocr", b"<html><body>nope</body></html>")
    assert out["parse_error"] is not None


def test_extract_document_integration():
    out = extract_document("d", "hocr", _one_page([
        ("heading", "T", (0, 0, 1, 1), [99]),
        ("para", LONG, (0, 2, 9, 9), [95] * 5),
    ]))
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]


def test_ocr_conf_stats_operator(spark):
    from pyspark.sql import types as T

    from machine_readability_checker_spark.operators.ocrstats import (
        ocr_conf_stats,
    )

    rows = [
        ("d1", _one_page([("para", "a b c d", (0, 0, 9, 9),
                           [90, 80, 50, 40])])),
        ("d2", _one_page([("photo", None, (0, 0, 9, 9), [])])),
        ("d3", b"<html><body>not hocr</body></html>"),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    got = {r["doc_id"]: r for r in ocr_conf_stats(df, 60.0).collect()}
    assert got["d1"]["n_words"] == 4
    assert got["d1"]["mean_conf"] == pytest.approx(65.0)
    assert got["d1"]["frac_low"] == pytest.approx(0.5)
    assert got["d2"]["n_words"] == 0 and got["d2"]["mean_conf"] is None
    assert got["d3"]["n_words"] == 0
