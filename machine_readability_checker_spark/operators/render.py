"""Span-array → training-text rendering (the extraction→tokenizer
bridge).

Extraction emits ordered ``(kind, text, media_ref, offset)`` span
arrays; every downstream consumer (cleaning funnel, dedup, LM
training, tokenizer corpus export) wants one string per document.
That projection is pure array work — ``filter`` → ``transform`` →
``array_join`` over the already-ordered array — so it must stay a
NARROW JVM expression: zero exchange, zero Python, document order
preserved BY CONSTRUCTION.

The explode→groupBy→collect_list spelling this replaces in
``jobs/clean.py`` was wrong twice at 100 TB: ``collect_list`` after a
shuffle has NO ordering guarantee (Spark documents collect_list as
non-deterministic — span order only survived by small-scale accident),
and the groupBy re-shuffled the entire corpus to reassemble documents
that were never apart.

Two styles:

- ``plain``: kept-span texts joined with a single space — the
  cleaning-funnel input (back-compatible with the previous clean.py
  text definition, minus its ordering hazard);
- ``markdown``: layout-aware serialization for corpus export — title
  → ``# ``, heading → ``## ``, code fenced, caption italicized, table
  ``line`` rows kept on their own lines, media spans as
  ``![alt](ref)`` placeholders; blocks joined with blank lines.  A
  markdown-ish rendering is the de-facto shape of LLM pre-training
  text (readability-preserving, cheap to tokenize).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# funnel default: the content kinds (grid data cells, prose main
# blocks, table rows) — headers/annotations/boilerplate are structure,
# not training text
CONTENT_KINDS = ("cell", "main", "line")

MARKDOWN_KINDS = (
    "title", "heading", "main", "line", "cell", "code", "math",
    "caption", "media", "output",
)


def main_text(
    spans_col: str = "spans", kinds: Sequence[str] = CONTENT_KINDS
) -> Column:
    """Ordered concatenation of the kept spans' texts (single space),
    as one narrow expression over the span array."""
    kept = F.filter(
        F.col(spans_col),
        lambda s: s["kind"].isin(*kinds) & s["text"].isNotNull(),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), " ")


def lines_text(
    spans_col: str = "spans", kinds: Sequence[str] = CONTENT_KINDS
) -> Column:
    """Ordered kept-span texts, one block per LINE (newline-joined) —
    the WET-like shape line-granular operators (site/corpus line dedup)
    need: a template block repeated across pages stays a comparable
    unit instead of fusing into its page's prose."""
    kept = F.filter(
        F.col(spans_col),
        lambda s: s["kind"].isin(*kinds) & s["text"].isNotNull(),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), "\n")


def _md_block(s: Column) -> Column:
    return (
        F.when(s["kind"] == "title", F.concat(F.lit("# "), s["text"]))
        .when(s["kind"] == "heading", F.concat(F.lit("## "), s["text"]))
        .when(
            s["kind"] == "code",
            F.concat(F.lit("```\n"), s["text"], F.lit("\n```")),
        )
        .when(s["kind"] == "math",
              F.concat(F.lit("$$"), s["text"], F.lit("$$")))
        .when(s["kind"] == "caption",
              F.concat(F.lit("*"), s["text"], F.lit("*")))
        .when(
            s["kind"] == "media",
            F.concat(
                F.lit("!["),
                F.coalesce(s["text"], F.lit("")),
                F.lit("]("),
                F.coalesce(s["media_ref"], F.lit("")),
                F.lit(")"),
            ),
        )
        .otherwise(s["text"])
    )


def markdown_text(
    spans_col: str = "spans", kinds: Sequence[str] = MARKDOWN_KINDS
) -> Column:
    """Layout-aware markdown rendering of the span array.  Blocks join
    with blank lines, EXCEPT consecutive table ``line`` rows, which
    join with a single newline — their adjacency IS the table.  One
    ``aggregate`` fold (the lambda references only its arguments, so
    the SCALE.md HOF re-evaluation trap does not apply)."""
    kept = F.filter(
        F.col(spans_col),
        lambda s: s["kind"].isin(*kinds)
        & (s["text"].isNotNull() | (s["kind"] == "media")),
    )
    folded = F.aggregate(
        kept,
        F.struct(
            F.lit("").alias("txt"), F.lit("").alias("last_kind")
        ),
        lambda acc, s: F.struct(
            F.concat(
                acc["txt"],
                F.when(acc["txt"] == "", F.lit(""))
                .when(
                    (s["kind"] == "line")
                    & (acc["last_kind"] == "line"),
                    F.lit("\n"),
                )
                .otherwise(F.lit("\n\n")),
                _md_block(s),
            ).alias("txt"),
            s["kind"].alias("last_kind"),
        ),
    )
    return folded["txt"]


def render_training_text(
    df: DataFrame,
    spans_col: str = "spans",
    out_col: str = "text",
    style: str = "plain",
    kinds: Sequence[str] = None,  # type: ignore[assignment]
) -> DataFrame:
    """Attach the rendered per-document text.  Narrow — the plan must
    show no Exchange and no Python (pinned in test_plan_quality)."""
    if style == "plain":
        col = main_text(spans_col, kinds or CONTENT_KINDS)
    elif style == "lines":
        col = lines_text(spans_col, kinds or CONTENT_KINDS)
    elif style == "markdown":
        col = markdown_text(spans_col, kinds or MARKDOWN_KINDS)
    else:
        raise ValueError(f"unknown render style: {style}")
    return df.withColumn(out_col, col)
