"""Extraction-quality evaluation: a LABELED boilerplate/main corpus and
block-level precision/recall/F1 for the HTML main-content classifier.

Everywhere else the engine pins span-parity with itself (or the
reference's rules); nothing measured whether the Boilerpipe-style block
classifier (`core/html.py:classify_blocks` — text length + link density
+ structural subtrees) actually separates content from boilerplate
against GROUND TRUTH.  This module is the extraction twin of the ANN
recall floors (`tests/test_plan_quality.py::test_ann_family_recall
_floors`): a deterministic generator assembles pages from components
whose content/boilerplate label is known BY CONSTRUCTION — navigation
menus, footers, cookie banners, ad interstitials, social rows,
sidebars, breadcrumbs on the boilerplate side; prose paragraphs,
SHORT replies, quote-dense paragraphs on the content side — and the
evaluator scores the classifier's `main` verdicts per block.

The hard cases are included on purpose, so the scores are honest, not
ceremonial: ad sentences and cookie banners are long, link-free DIV
text (the classifier's blind spot → precision hits); sub-25-char
replies and link-dense prose fall below the length / above the
link-density thresholds (→ recall hits).  The measured operating point
of the fixed (25 chars, 0.33 link density) thresholds on this corpus
is pinned as a floor in tests/test_extractqa.py and reported in
BENCH/BASELINE.md.

Scale shape: generation is the fixtures' mapInPandas pattern (no
driver corpus), evaluation is one broadcast-free equi-join on
(doc_id, text) plus a single aggregate — runs at corpus scale as a
continuous extraction-QA job.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

CONTENT = "content"
BOILER = "boilerplate"

_NAV_WORDS = [
    "Home", "About", "Products", "Blog", "Contact", "Careers", "Support",
    "Pricing", "Docs", "Community", "Download", "Login",
]
_PROSE = [
    "The committee reviewed the proposal in detail before voting",
    "Researchers observed a steady decline in error rates over time",
    "The harbor town depends on the morning ferry for supplies",
    "Engineers traced the regression to a cache invalidation bug",
    "The novel opens with a long description of the valley",
    "Local farmers adopted drip irrigation to cope with the drought",
    "The orchestra rehearsed the final movement twice that evening",
    "Analysts expect the trend to continue through next quarter",
]
_SHORT_REPLIES = ["Yes, exactly.", "It failed.", "Agreed.", "Not yet.", "See below."]
_AD_LINES = [
    "Sponsored: upgrade your workflow with TurboSuite Pro today",
    "Advertisement: the new UltraPhone 9 is available in stores now",
    "Promoted: save twenty percent on annual plans this month only",
]
_COOKIE = (
    "We use cookies to improve your experience and analyze site "
    "traffic. By continuing you accept our cookie policy. Accept Decline"
)


def gen_labeled_page(
    i: int,
) -> Tuple[str, bytes, List[Tuple[str, str]]]:
    """→ (doc_id, html bytes, [(block_text, CONTENT|BOILER), ...]).

    Every labeled block's text is unique within the page (index
    suffixes), single-block by construction (one <p> per component),
    and matches the extractor's whitespace-collapsed output, so the
    evaluator joins labels to predicted spans on exact (doc_id, text).
    Titles/headings are unlabeled (they are their own span kinds, not
    part of the binary main/boilerplate decision)."""
    rng = random.Random(1_000_003 * i + 17)
    doc_id = f"qa{i:05d}"
    frags: List[str] = []
    labels: List[Tuple[str, str]] = []

    def links(words: List[str], tag: int) -> str:
        return " ".join(
            f'<a href="/x{tag}{k}">{w} {tag}{k}</a>'
            for k, w in enumerate(words)
        )

    def link_text(words: List[str], tag: int) -> str:
        return " ".join(f"{w} {tag}{k}" for k, w in enumerate(words))

    # structural nav (classifier: forced boilerplate — easy)
    nav_words = rng.sample(_NAV_WORDS, 5)
    frags.append(f"<nav><p>{links(nav_words, 1)}</p></nav>")
    labels.append((link_text(nav_words, 1), BOILER))

    # div-based menu: no structural hint, high link density (easy-ish)
    if rng.random() < 0.8:
        menu_words = rng.sample(_NAV_WORDS, 4)
        frags.append(f"<div><p>{links(menu_words, 2)}</p></div>")
        labels.append((link_text(menu_words, 2), BOILER))

    # breadcrumbs: short + linky
    crumb = rng.sample(_NAV_WORDS, 2)
    frags.append(f"<div><p>{links(crumb, 3)} &gt; page {i}</p></div>")
    labels.append((link_text(crumb, 3) + f" > page {i}", BOILER))

    frags.append(f"<h1>Article {i}</h1>")

    # main prose (easy content)
    n_paras = 3 + rng.randrange(3)
    for j in range(n_paras):
        s1, s2 = rng.sample(_PROSE, 2)
        frags.append(f"<p>{s1} ({i}-{j}). {s2}.</p>")
        labels.append((f"{s1} ({i}-{j}). {s2}.", CONTENT))

    # short reply (hard content: below MIN_CONTENT_CHARS)
    if rng.random() < 0.5:
        r = rng.choice(_SHORT_REPLIES)
        frags.append(f"<p>{r} [{i}]</p>")
        labels.append((f"{r} [{i}]", CONTENT))

    # quote-dense prose (hard content: above MAX_LINK_DENSITY)
    if rng.random() < 0.35:
        s = rng.choice(_PROSE)
        cites = links(["source", "report", "study", "data"], 4)
        frags.append(f"<p>{s} ({i}-q), per {cites}.</p>")
        labels.append(
            (f"{s} ({i}-q), per {link_text(['source','report','study','data'], 4)}.",
             CONTENT),
        )

    # ad interstitial (hard boilerplate: long, link-free)
    if rng.random() < 0.4:
        ad = rng.choice(_AD_LINES)
        frags.append(f"<div><p>{ad} (slot {i}).</p></div>")
        labels.append((f"{ad} (slot {i}).", BOILER))

    # cookie banner (hard boilerplate)
    if rng.random() < 0.3:
        frags.append(f"<div><p>{_COOKIE} [{i}]</p></div>")
        labels.append((f"{_COOKIE} [{i}]", BOILER))

    # sidebar related links (structural aside — easy)
    side = rng.sample(_PROSE, 2)
    side_links = " ".join(
        f'<a href="/r{k}">{s.split()[1]} {5}{k}</a>'
        for k, s in enumerate(side)
    )
    side_text = " ".join(
        f"{s.split()[1]} {5}{k}" for k, s in enumerate(side)
    )
    frags.append(f"<aside><p>Related: {side_links}</p></aside>")
    labels.append((f"Related: {side_text}", BOILER))

    # social row (short + linky)
    frags.append(
        f'<div><p><a href="/s">Share {i}</a> <a href="/t">Tweet {i}</a></p></div>'
    )
    labels.append((f"Share {i} Tweet {i}", BOILER))

    # footer (structural — easy)
    frags.append(
        f"<footer><p>© 2026 Example Corp {i}. All rights reserved. "
        f'<a href="/p">Privacy</a> <a href="/t">Terms</a></p></footer>'
    )
    labels.append(
        (f"© 2026 Example Corp {i}. All rights reserved. Privacy Terms",
         BOILER),
    )

    html = (
        "<!DOCTYPE html><html><head><title>QA page "
        + str(i)
        + "</title></head><body>"
        + "".join(frags)
        + "</body></html>"
    )
    return doc_id, html.encode("utf-8"), labels


def labeled_corpus_spark(
    spark: SparkSession, n_docs: int, partitions: int = 8
) -> Tuple[DataFrame, DataFrame]:
    """→ (docs_raw in RAW_SCHEMA, labels (doc_id, text, label)) —
    distributed generation, the fixtures' mapInPandas pattern."""
    from ..model import RAW_SCHEMA
    from ..sources.fixtures import _doc

    def raw_kernel(batches):
        for batch in batches:
            rows = []
            for i in batch["id"]:
                doc_id, content, _ = gen_labeled_page(int(i))
                row = _doc(doc_id, "html", content)
                row.setdefault("sheet_idx", 0)
                rows.append(row)
            yield pd.DataFrame(rows)

    def label_kernel(batches):
        for batch in batches:
            out: Dict[str, List[Any]] = {"doc_id": [], "text": [], "label": []}
            for i in batch["id"]:
                doc_id, _, labels = gen_labeled_page(int(i))
                for text, label in labels:
                    out["doc_id"].append(doc_id)
                    out["text"].append(text)
                    out["label"].append(label)
            yield pd.DataFrame(out)

    rng = spark.range(0, n_docs, numPartitions=partitions)
    raw = rng.mapInPandas(raw_kernel, schema=RAW_SCHEMA)
    labels = rng.mapInPandas(
        label_kernel, schema="doc_id string, text string, label string"
    )
    return raw, labels


def html_spans(
    raw: DataFrame, context: bool = False
) -> DataFrame:
    """(doc_id, content) → (doc_id, spans) through the HTML lane with a
    selectable block classifier — the QA harness runs BOTH the fixed-
    threshold default and the jusText-style context mode over the same
    corpus.  Arrow kernel, one narrow map."""
    from ..core.html import extract_html_spans

    def kernel(batches):
        for batch in batches:
            out: Dict[str, List[Any]] = {"doc_id": [], "spans": []}
            for doc_id, content in zip(batch["doc_id"], batch["content"]):
                triples, _ = extract_html_spans(
                    bytes(content), context=context
                )
                out["doc_id"].append(doc_id)
                out["spans"].append(
                    [
                        {"kind": k, "text": t, "media_ref": m}
                        for k, t, m in triples
                    ]
                )
            yield pd.DataFrame(out)

    return raw.select("doc_id", "content").mapInPandas(
        kernel,
        schema=(
            "doc_id string, spans array<struct<"
            "kind:string,text:string,media_ref:string>>"
        ),
    )


# ------------------------------------------------- PDF layout QA


def gen_labeled_pdf(i: int):
    """→ (doc_id, pdf bytes, ordered [(kind, text), ...] ground truth).

    Layout variants keyed on the index, with the full expected
    (kind, text) SEQUENCE as truth — reading order, table detection
    and heading detection are all scored at once:

    - single-column report: heading, prose, an x-aligned table whose
      LAST column overhangs the prose margin (the geometry that used
      to tear into a fake second column — regression-guarded here),
      closing prose;
    - two-column page: spanning title band, balanced prose columns
      read left-then-right;
    - designed hard case (every 7th doc): a ONE-row "table" — below
      MIN_TABLE_ROWS by definition, labeled as cells anyway, so the
      metric honestly records the detector's row floor instead of
      pretending single-row tables are found."""
    rng = random.Random(7_000_003 * i + 5)
    doc_id = f"pdfqa{i:05d}"
    items: List[Dict[str, Any]] = []
    want: List[Tuple[str, str]] = []
    prose = [
        "The committee reviewed the proposal in detail",
        "Observed error rates declined steadily all year",
        "The harbor town depends on the morning ferry",
        "Engineers traced the fault to cache invalidation",
        "Local farmers adopted drip irrigation methods",
    ]
    if i % 3 == 2:
        # --- two-column page with a spanning title
        title = f"Two column brief {i}"
        items.append({"text": title, "x": 60, "y": 770, "size": 18})
        want.append(("heading", title))
        n = 4 + rng.randrange(3)
        left = [f"{rng.choice(prose)} L{i}-{k}." for k in range(n)]
        right = [f"{rng.choice(prose)} R{i}-{k}." for k in range(n)]
        # right column at x=380: the longest prose+suffix line is ~55
        # glyphs = ~275pt wide, so the inter-column valley stays ≥ 55pt
        y = 730
        for k in range(n):
            items.append({"text": left[k], "x": 50, "y": y, "size": 10})
            items.append({"text": right[k], "x": 380, "y": y, "size": 10})
            y -= 14
        want.extend(("line", t) for t in left)
        want.extend(("line", t) for t in right)
        return doc_id, items, want

    # --- single-column report
    title = f"Quarterly report {i}"
    items.append({"text": title, "x": 50, "y": 770, "size": 16})
    want.append(("heading", title))
    y = 740
    n1 = 2 + rng.randrange(3)
    for k in range(n1):
        t = f"{rng.choice(prose)} ({i}-{k})."
        items.append({"text": t, "x": 50, "y": y, "size": 10})
        want.append(("line", t))
        y -= 14
    y -= 10
    if i % 7 == 3:
        # hard case: one-row table (below the detector's row floor)
        row = [f"k{i}", f"v{i}", f"x{i}"]
        for c, cx in enumerate((50, 200, 350)):
            items.append({"text": row[c], "x": cx, "y": y, "size": 10})
        want.append(("cell", "\t".join(row)))
        y -= 14
    else:
        rows = 3 + rng.randrange(3)
        for r in range(rows):
            row = [f"c{i}.{r}.{c}" for c in range(3)]
            for c, cx in enumerate((50, 200, 350)):  # col 3 overhangs
                items.append({"text": row[c], "x": cx, "y": y, "size": 10})
            want.append(("cell", "\t".join(row)))
            y -= 14
    y -= 10
    t = f"Closing remark paragraph for document {i}."
    items.append({"text": t, "x": 50, "y": y, "size": 10})
    want.append(("line", t))
    return doc_id, items, want


def labeled_pdf_corpus_spark(
    spark: SparkSession, n_docs: int, partitions: int = 8
) -> Tuple[DataFrame, DataFrame]:
    """→ (docs_raw in RAW_SCHEMA fmt=pdf, labels (doc_id, pos, kind,
    text)) — positions index the expected NON-media span sequence."""
    from ..core.pdf import write_pdf
    from ..model import RAW_SCHEMA
    from ..sources.fixtures import _doc

    def raw_kernel(batches):
        for batch in batches:
            rows = []
            for i in batch["id"]:
                doc_id, items, _ = gen_labeled_pdf(int(i))
                row = _doc(doc_id, "pdf", write_pdf(items, compress=True))
                row.setdefault("sheet_idx", 0)
                rows.append(row)
            yield pd.DataFrame(rows)

    def label_kernel(batches):
        for batch in batches:
            out: Dict[str, List[Any]] = {
                "doc_id": [], "pos": [], "kind": [], "text": []
            }
            for i in batch["id"]:
                doc_id, _, want = gen_labeled_pdf(int(i))
                for p, (k, t) in enumerate(want):
                    out["doc_id"].append(doc_id)
                    out["pos"].append(p)
                    out["kind"].append(k)
                    out["text"].append(t)
            yield pd.DataFrame(out)

    rng = spark.range(0, n_docs, numPartitions=partitions)
    raw = rng.mapInPandas(raw_kernel, schema=RAW_SCHEMA)
    labels = rng.mapInPandas(
        label_kernel,
        schema="doc_id string, pos int, kind string, text string",
    )
    return raw, labels


def evaluate_pdf_layout(
    spans: DataFrame, labels: DataFrame
) -> DataFrame:
    """Sequence-level PDF layout metrics → one row (n_labels,
    pos_match, kind_text_match, line_accuracy, doc_exact_rate,
    cell_recall, heading_recall).

    ``pos_match`` compares POSITIONALLY (reading order + kind + text
    all right at that index — the strictest composite);
    ``kind_text_match`` joins order-free on (doc_id, kind, text) so an
    order error and a classification error are distinguishable.  One
    window + two joins + one aggregate."""
    from pyspark.sql import Window

    pred = (
        spans.select("doc_id", F.posexplode("spans").alias("_p", "s"))
        .filter(F.col("s.kind") != "media")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_p")
            ) - 1,
        )
        .select(
            "doc_id", "pos",
            F.col("s.kind").alias("pkind"),
            F.col("s.text").alias("ptext"),
        )
    )
    j = labels.join(pred, ["doc_id", "pos"], "left")
    pos_ok = (
        (F.col("pkind") == F.col("kind"))
        & (F.col("ptext") == F.col("text"))
    )
    per_doc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(pos_ok.cast("long"), F.lit(0))).alias("ok"),
    )
    free = labels.join(
        spans.select(
            "doc_id", F.explode("spans").alias("s")
        ).select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
        ).distinct(),
        ["doc_id", "kind", "text"],
        "left_semi",
    )
    kinds = free.groupBy().pivot(
        "kind", ["cell", "heading", "line"]
    ).count()
    totals = labels.groupBy().pivot(
        "kind", ["cell", "heading", "line"]
    ).count()
    agg = per_doc.agg(
        F.sum("n").alias("n_labels"),
        F.sum("ok").alias("pos_match"),
        F.sum((F.col("ok") == F.col("n")).cast("long")).alias("docs_exact"),
        F.count(F.lit(1)).alias("docs"),
    )
    k = kinds.collect()[0].asDict()
    t = totals.collect()[0].asDict()
    a = agg.collect()[0].asDict()
    free_total = free.count()
    out = {
        "n_labels": a["n_labels"],
        "pos_match": a["pos_match"],
        "kind_text_match": free_total,
        "line_accuracy": a["pos_match"] / a["n_labels"],
        "doc_exact_rate": a["docs_exact"] / a["docs"],
        "cell_recall": (k.get("cell") or 0) / max(1, t.get("cell") or 0),
        "heading_recall": (
            (k.get("heading") or 0) / max(1, t.get("heading") or 0)
        ),
    }
    return spans.sparkSession.createDataFrame(
        [tuple(out.values())],
        "n_labels long, pos_match long, kind_text_match long, "
        "line_accuracy double, doc_exact_rate double, "
        "cell_recall double, heading_recall double",
    )


def evaluate_extraction(
    spans: DataFrame, labels: DataFrame
) -> DataFrame:
    """Block-level main-content metrics → one row
    (n_labels, tp, fp, fn, precision, recall, f1).

    A label joins its predicted span on exact (doc_id, text); content
    predicted `main` is a TP, boilerplate predicted `main` a FP,
    content predicted anything else (or segmented away) a FN — the
    standard Boilerpipe/CleanEval block accounting.  One equi-join +
    one aggregate, all JVM-side."""
    pred = spans.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
    ).filter(F.col("kind").isin("main", "boilerplate"))
    j = labels.join(pred, ["doc_id", "text"], "left")
    tp = F.sum(
        ((F.col("label") == CONTENT) & (F.col("kind") == "main")).cast("long")
    )
    fp = F.sum(
        ((F.col("label") == BOILER) & (F.col("kind") == "main")).cast("long")
    )
    fn = F.sum(
        (
            (F.col("label") == CONTENT)
            & ((F.col("kind") != "main") | F.col("kind").isNull())
        ).cast("long")
    )
    out = j.agg(
        F.count(F.lit(1)).alias("n_labels"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
    )
    p = F.col("tp") / (F.col("tp") + F.col("fp"))
    r = F.col("tp") / (F.col("tp") + F.col("fn"))
    return out.select(
        "n_labels", "tp", "fp", "fn",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / (p + r)).alias("f1"),
    )
