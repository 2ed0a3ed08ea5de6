"""Extraction-quality eval: labeled boilerplate/main corpus, block
P/R/F1 floors for both HTML block classifiers, and unit pins for the
jusText-style context rules (VERDICT r4 next-round item 5 — the
extraction twin of the ANN recall floors)."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.core.html import (
    classify_blocks,
    extract_html_spans,
)
from machine_readability_checker_spark.operators import extractqa as QA

N_DOCS = 300  # deterministic corpus -> deterministic metrics


@pytest.fixture(scope="module")
def corpus(spark):
    raw, labels = QA.labeled_corpus_spark(spark, N_DOCS)
    return raw.cache(), labels.cache()


def _metrics(spark, corpus, context: bool):
    raw, labels = corpus
    return QA.evaluate_extraction(
        QA.html_spans(raw, context=context), labels
    ).collect()[0]


def test_label_texts_all_match_extractor_blocks(spark, corpus):
    """Generator sanity: every labeled block is recoverable from the
    extractor's own segmentation (a label that never joins would make
    the metrics meaningless) — checked as FN+TP == n_content and the
    boilerplate side never left dangling by text mismatch."""
    raw, labels = corpus
    from pyspark.sql import functions as F

    pred = (
        QA.html_spans(raw)
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", F.col("s.text").alias("text"))
    )
    unmatched = labels.join(pred, ["doc_id", "text"], "left_anti").count()
    assert unmatched == 0


def test_base_classifier_floor(spark, corpus):
    """Fixed-threshold mode (the production default): the corpus's
    designed hard cases (ad/cookie prose without links -> FP; short
    replies and citation-dense paragraphs -> FN) bound it near 0.88 F1.
    The floor guards against regressions; the ceiling assertion
    documents WHY the context mode exists — if base ever beats 0.95
    here, the hard cases stopped being hard and the eval needs new
    ones."""
    m = _metrics(spark, corpus, context=False)
    assert m["n_labels"] > 3000
    assert m["f1"] >= 0.85
    assert m["precision"] >= 0.83 and m["recall"] >= 0.87
    assert m["f1"] < 0.95


def test_context_classifier_floor(spark, corpus):
    """jusText-style context mode: pattern cues kill the ad/cookie FPs,
    neighbor promotion recovers short replies and quote-dense prose.
    Floors: F1 >= 0.99, recall == 1.0 on this corpus."""
    m = _metrics(spark, corpus, context=True)
    assert m["recall"] == 1.0
    assert m["precision"] >= 0.99
    assert m["f1"] >= 0.99


def _kinds(html: str, context: bool):
    triples, _ = extract_html_spans(html.encode(), context=context)
    return [(k, t) for k, t, _ in triples if k in ("main", "boilerplate")]


def test_context_rules_units():
    """The individual context rules, pinned on minimal documents."""
    # short reply between prose paragraphs: promoted in context mode
    html = (
        "<body><p>The committee reviewed the proposal in detail today.</p>"
        "<p>Yes, exactly.</p>"
        "<p>Researchers observed a steady decline in error rates.</p></body>"
    )
    assert ("boilerplate", "Yes, exactly.") in _kinds(html, False)
    assert ("main", "Yes, exactly.") in _kinds(html, True)

    # short LINKY block (social row) is never promoted
    html2 = (
        "<body><p>The committee reviewed the proposal in detail today.</p>"
        '<p><a href="/s">Share</a> <a href="/t">Tweet</a></p>'
        "<p>Researchers observed a steady decline in error rates.</p></body>"
    )
    assert ("boilerplate", "Share Tweet") in _kinds(html2, True)

    # citation-dense paragraph (0.33 < density <= 0.55) next to prose
    # link density 26/56 = 0.46: past the strict 0.33 ceiling but
    # inside the near-good band (<= 0.55)
    html3 = (
        "<body><p>The committee reviewed the proposal in detail today.</p>"
        '<p>The study cites <a href="/a">the primary source</a> and '
        '<a href="/b">the data</a> for it.</p></body>'
    )
    dense = next(t for k, t in _kinds(html3, False) if "cites" in t)
    assert ("boilerplate", dense) in _kinds(html3, False)
    assert ("main", dense) in _kinds(html3, True)

    # pattern cues: sponsored / cookie-consent / copyright lines are
    # boilerplate in context mode even when long and link-free
    for line in [
        "Sponsored: upgrade your workflow with TurboSuite Pro today.",
        "We use cookies to improve your experience. Accept to continue.",
        "© 2026 Example Corp. All rights reserved worldwide, as noted.",
    ]:
        html4 = f"<body><p>{line}</p></body>"
        assert _kinds(html4, False) == [("main", line)]
        assert _kinds(html4, True) == [("boilerplate", line)]

    # prose that merely MENTIONS cookies (no consent verb) stays main
    html5 = (
        "<body><p>The bakery uses cookies as the base for its best "
        "selling dessert range.</p></body>"
    )
    # cookie phrase WITHOUT a consent verb -> must stay main
    assert _kinds(html5, True) == [
        ("main", "The bakery uses cookies as the base for its best "
                 "selling dessert range.")
    ]


def test_default_mode_unchanged():
    """context=False is byte-identical to the historical classifier —
    the contract every oracle lane and fixture pin relies on."""
    from machine_readability_checker_spark.core.html import (
        HtmlBlock,
        MIN_CONTENT_CHARS,
    )

    blocks = [
        HtmlBlock("text", "x" * MIN_CONTENT_CHARS, "", 0, False),
        HtmlBlock("text", "short", "", 0, False),
        HtmlBlock("text", "y" * 50, "", 40, False),   # linky
        HtmlBlock("text", "z" * 50, "", 0, True),     # boiler subtree
    ]
    got = [k for k, _, _ in classify_blocks(blocks)]
    assert got == ["main", "boilerplate", "boilerplate", "boilerplate"]


# ------------------------------------------------- PDF layout QA


@pytest.fixture(scope="module")
def pdf_corpus(spark):
    raw, labels = QA.labeled_pdf_corpus_spark(spark, 200)
    return raw.cache(), labels.cache()


def test_pdf_layout_floors(spark, pdf_corpus):
    """Sequence-level PDF layout metrics on the 200-page labeled
    corpus.  The two round-5 layout fixes (overhang-column balance +
    width discriminators in order_columns) lift line accuracy from the
    measured 0.60 to ≥0.98; the residual gap is EXACTLY the designed
    one-row-table hard case (below MIN_TABLE_ROWS), so doc_exact and
    cell_recall are floored below 1.0 on purpose."""
    from machine_readability_checker_spark.operators.extract import extract

    raw, labels = pdf_corpus
    m = QA.evaluate_pdf_layout(
        extract(raw).select("doc_id", "spans"), labels
    ).collect()[0]
    assert m["n_labels"] > 1500
    assert m["line_accuracy"] >= 0.98
    assert 0.85 <= m["doc_exact_rate"] < 1.0
    assert m["heading_recall"] == 1.0
    assert 0.9 <= m["cell_recall"] < 1.0
    # positional and order-free matches agree -> no pure order errors
    assert m["pos_match"] == m["kind_text_match"]


def test_pdf_overhang_column_regression():
    """The geometry that used to tear: a 3-column x-aligned table whose
    last column overhangs the prose margin inside a single-column
    page.  Before the COLUMN_BALANCE/width discriminators the third
    column split off as a fake page column and read out of order."""
    from machine_readability_checker_spark.core.pdf import (
        extract_pdf_spans,
        write_pdf,
    )

    items = [{"text": "Quarterly Report 7", "x": 50, "y": 760, "size": 18}]
    y = 730
    prose = []
    for k in range(3):
        t = f"Prose line number {k} with several words in it."
        prose.append(t)
        items.append({"text": t, "x": 50, "y": y, "size": 10})
        y -= 14
    for r in range(5):  # 5 rows: defeats balance alone, needs width
        for c, cx in enumerate((50, 200, 350)):
            items.append(
                {"text": f"cell{r}{c}", "x": cx, "y": 640 - r * 14,
                 "size": 10}
            )
    items.append(
        {"text": "Closing remark paragraph after the table.",
         "x": 50, "y": 540, "size": 10}
    )
    spans, err = extract_pdf_spans(write_pdf(items))
    assert err is None
    got = [(k, t) for k, t, _ in spans]
    want = (
        [("heading", "Quarterly Report 7")]
        + [("line", t) for t in prose]
        + [("cell", f"cell{r}0\tcell{r}1\tcell{r}2") for r in range(5)]
        + [("line", "Closing remark paragraph after the table.")]
    )
    assert got == want


def test_pdf_two_column_generator_exact():
    """The generator's two-column variant reads title -> left column ->
    right column, exactly."""
    from machine_readability_checker_spark.core.pdf import (
        extract_pdf_spans,
        write_pdf,
    )

    doc_id, items, want = QA.gen_labeled_pdf(2)
    spans, err = extract_pdf_spans(write_pdf(items, compress=True))
    assert err is None
    assert [(k, t) for k, t, _ in spans if k != "media"] == want
