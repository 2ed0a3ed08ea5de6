"""Jupyter notebook lane (core/ipynb.py).

The three driver-lane variant notebooks are pinned here byte-for-byte,
so the constructive `ipynb_extract` oracle and these tests can never
drift apart silently.
"""

from __future__ import annotations

import json

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.ipynb import extract_ipynb_spans


def _nb(cells):
    return json.dumps(
        {"nbformat": 4, "nbformat_minor": 5, "metadata": {}, "cells": cells}
    ).encode("utf-8")


def _entry_variants():
    import __spark_entry__ as E

    return E._IPYNB_VARIANT_DOCS, E._IPYNB_VARIANT_SPANS


def test_variant_docs_match_pinned_spans():
    docs, expected = _entry_variants()
    assert len(docs) == len(expected) == 3
    for v, (doc, want) in enumerate(zip(docs, expected)):
        spans, err = extract_ipynb_spans(doc.encode("utf-8"))
        assert err is None
        assert spans == want, (v, spans)


def test_markdown_cells_share_md_lane_semantics():
    """A markdown cell gets the md lane's treatment: leading heading of
    the DOCUMENT is the title; later markdown cells emit headings."""
    nb = _nb(
        [
            {"cell_type": "markdown", "metadata": {},
             "source": "# Top\n\npara **bold**"},
            {"cell_type": "markdown", "metadata": {},
             "source": ["## Later\n", "\n", "more\n"]},
        ]
    )
    spans, err = extract_ipynb_spans(nb)
    assert err is None
    assert spans == [
        ("title", "Top", ""),
        ("main", "para bold", ""),
        ("heading", "Later", ""),
        ("main", "more", ""),
    ]


def test_title_rule_is_per_document_not_per_cell():
    """If a code cell precedes the first markdown heading, that heading
    is no longer the document's first block → 'heading', not 'title'."""
    nb = _nb(
        [
            {"cell_type": "code", "metadata": {}, "execution_count": 1,
             "source": "setup()", "outputs": []},
            {"cell_type": "markdown", "metadata": {}, "source": "# After"},
        ]
    )
    spans, _ = extract_ipynb_spans(nb)
    assert spans == [("code", "setup()", ""), ("heading", "After", "")]


def test_code_cell_outputs_in_order():
    nb = _nb(
        [
            {
                "cell_type": "code",
                "metadata": {},
                "execution_count": 1,
                "source": ["a = 1\n", "print(a)\n", "a"],
                "outputs": [
                    {"output_type": "stream", "name": "stdout",
                     "text": ["1\n"]},
                    {"output_type": "execute_result", "execution_count": 1,
                     "metadata": {}, "data": {"text/plain": "1"}},
                ],
            }
        ]
    )
    spans, _ = extract_ipynb_spans(nb)
    assert spans == [
        ("code", "a = 1\nprint(a)\na", ""),
        ("output", "1", ""),
        ("output", "1", ""),
    ]


def test_image_output_beats_text_plain_and_gets_deterministic_ref():
    nb = _nb(
        [
            {
                "cell_type": "code",
                "metadata": {},
                "execution_count": 1,
                "source": "plot()",
                "outputs": [
                    {
                        "output_type": "display_data",
                        "metadata": {},
                        "data": {
                            "image/png": "iVBORw0KGgo=",
                            "text/plain": ["<Figure 640x480>"],
                        },
                    }
                ],
            }
        ]
    )
    spans, _ = extract_ipynb_spans(nb)
    assert spans == [
        ("code", "plot()", ""),
        ("media", "<Figure 640x480>", "output:cell0/out0.png"),
    ]


def test_error_output_strips_ansi_escapes():
    nb = _nb(
        [
            {
                "cell_type": "code",
                "metadata": {},
                "execution_count": 1,
                "source": "boom()",
                "outputs": [
                    {
                        "output_type": "error",
                        "ename": "ZeroDivisionError",
                        "evalue": "division by zero",
                        "traceback": [
                            "\x1b[0;31m---------\x1b[0m",
                            "\x1b[0;31mZeroDivisionError\x1b[0m: "
                            "division by zero",
                        ],
                    }
                ],
            }
        ]
    )
    spans, _ = extract_ipynb_spans(nb)
    assert spans == [
        ("code", "boom()", ""),
        (
            "output",
            "ZeroDivisionError: division by zero\n---------\n"
            "ZeroDivisionError: division by zero",
            "",
        ),
    ]


def test_raw_cells_and_empty_code_cells_skipped():
    nb = _nb(
        [
            {"cell_type": "raw", "metadata": {}, "source": "::passthrough::"},
            {"cell_type": "code", "metadata": {}, "execution_count": None,
             "source": "   \n", "outputs": []},
            {"cell_type": "markdown", "metadata": {}, "source": "kept"},
        ]
    )
    spans, _ = extract_ipynb_spans(nb)
    assert spans == [("main", "kept", "")]


def test_malformed_and_legacy_quarantine():
    spans, err = extract_ipynb_spans(b"{not json")
    assert spans == [] and err is not None
    spans, err = extract_ipynb_spans(
        json.dumps({"nbformat": 3, "worksheets": []}).encode()
    )
    assert spans == [] and "nbformat < 4" in err
    spans, err = extract_ipynb_spans(json.dumps({"cells": 5}).encode())
    assert spans == [] and err is not None


def test_extract_document_dispatch_and_metrics():
    nb = _nb([{"cell_type": "markdown", "metadata": {}, "source": "# T"}])
    out = extract_document("d1", "ipynb", nb)
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title"]
    assert out["metrics"]["spans_out"] == 1
    bad = extract_document("d2", "ipynb", b"\x00\xff")
    assert bad["parse_error"] is not None
    assert bad["metrics"]["parse_errors"] == 1


def test_fixture_family_roundtrip():
    import numpy as np

    from machine_readability_checker_spark.sources.fixtures import fam_ipynb

    d = fam_ipynb(np.random.RandomState(3), 11)
    assert d["fmt"] == "ipynb"
    out = extract_document("f", "ipynb", d["content"])
    assert out["parse_error"] is None
    kinds = [s["kind"] for s in out["spans"]]
    assert kinds == [
        "title", "main", "code", "output", "output", "code", "output",
        "code", "media",
    ]
    media = [s for s in out["spans"] if s["kind"] == "media"][0]
    assert media["media_ref"] == "output:cell3/out0.png"
