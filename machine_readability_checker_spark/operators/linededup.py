"""Corpus-wide duplicate-line removal (the CCNet / RefinedWeb "line
dedup" cleaning stage).

Boilerplate on the web repeats VERBATIM across pages ("subscribe to
our newsletter", cookie banners, nav footers); CCNet's preprocessing
removes any line whose corpus-wide occurrence count crosses a
threshold, and RefinedWeb keeps a variant of the same idea.  This is
line-granular, corpus-global state — distinct from the per-document
``textstats`` repetition battery and from the n-gram span stripper in
``dedup`` (those are document-local / shingle-based).

Scale design: the duplicated-line set is the ONLY thing that moves.

1. ``line_table``: one narrow ``posexplode`` of ``split(text, '\\n')``
   — no Python, no shuffle.
2. ``dup_lines``: one hash aggregate keyed on the line (map-side
   partial combine, so a line repeated a billion times arrives at the
   reducer as one partial per map partition — the hot-boilerplate skew
   is defused by the combiner, not by salting).
3. ``strip_dup_lines``: LEFT ANTI join of the line table against the
   dup set.  The dup set is tiny relative to the corpus (only lines
   that repeat), so AQE broadcasts it in practice; the corpus side is
   never re-keyed.  Reassembly is one aggregate back to the document:
   ``collect_list(struct(pos, line))`` → ``array_sort`` →
   ``array_join`` — all JVM, and the per-document state is bounded by
   document size exactly like the extraction kernel's rows.

Reference parity note: no analog in the reference (single-table
audits); this is the training-pipeline extension family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents → (id, pos, line) — one narrow generator, preserving
    line order for loss-free reassembly."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def dup_lines(
    df: DataFrame,
    min_count: int = 2,
    min_line_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide duplicated lines: (line, n_occurrences, n_docs) for
    every line of at least ``min_line_len`` characters appearing at
    least ``min_count`` times.  ONE aggregate shuffle."""
    lt = line_table(df, text_col, id_col)
    return (
        lt.filter(F.length("line") >= min_line_len)
        .groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def strip_dup_lines(
    df: DataFrame,
    min_count: int = 2,
    min_line_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove EVERY copy of any line that repeats ``min_count``+ times
    corpus-wide (CCNet semantics: boilerplate dies everywhere, there is
    no "keep one copy" — that's document dedup's job).

    Returns one row per input document: (id, text, n_lines, n_kept)
    where ``text`` is the document rebuilt from its surviving lines in
    original order (empty string when nothing survives).  Lines shorter
    than ``min_line_len`` are exempt (too short to be meaningful
    boilerplate evidence — CCNet uses a minimum length for the same
    reason)."""
    lt = line_table(df, text_col, id_col)
    dups = dup_lines(df, min_count, min_line_len, text_col, id_col).select(
        "line"
    )
    kept = lt.join(dups, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_text"),
    )
    totals = df.select(
        F.col(id_col),
        (F.size(F.split(F.col(text_col), "\n"))).alias("n_lines"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


def site_line_table(
    df: DataFrame,
    site_col: str = "domain",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents → (site, id, pos, line) — the site-scoped twin of
    ``line_table`` (one narrow generator, order preserved)."""
    return df.select(
        F.col(site_col).alias("site"),
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def site_boilerplate_lines(
    df: DataFrame,
    site_col: str = "domain",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_frac: float = 0.5,
    min_pages: int = 2,
    min_line_len: int = 1,
) -> DataFrame:
    """Intra-site boilerplate discovery: a line is site boilerplate when
    it appears on at least ``min_frac`` of the site's pages (and on at
    least ``min_pages`` pages absolutely, so two-page sites need the
    line everywhere).  This is the nav/footer/cookie-banner signal a
    site template stamps onto every page — DISTINCT from corpus-global
    line dedup (``dup_lines``): a phrase legitimate on one site dies
    only there, and a one-off quote repeated across unrelated sites
    survives everywhere (jusText/Onion-style site-template semantics).

    Returns (site, line, n_pages, site_pages, frac).

    Scale shape: per-site page counts are one tiny aggregate (sites ≪
    pages → broadcastable); the (site, line) page counts are ONE hash
    aggregate with map-side partials (a banner on a million pages of
    one site arrives as one partial per map partition); the fraction
    join keys the line aggregate against the site aggregate — the
    corpus itself is touched exactly once."""
    lt = site_line_table(df, site_col, text_col, id_col)
    site_pages = df.groupBy(F.col(site_col).alias("site")).agg(
        F.countDistinct(id_col).alias("site_pages")
    )
    per_line = (
        lt.filter(F.length("line") >= min_line_len)
        .groupBy("site", "line")
        .agg(F.countDistinct(id_col).alias("n_pages"))
    )
    return (
        per_line.join(F.broadcast(site_pages), "site")
        .withColumn(
            "frac", F.col("n_pages") / F.col("site_pages")
        )
        .filter(
            (F.col("n_pages") >= min_pages)
            & (F.col("frac") >= F.lit(min_frac))
        )
    )


def strip_site_boilerplate(
    df: DataFrame,
    site_col: str = "domain",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_frac: float = 0.5,
    min_pages: int = 2,
    min_line_len: int = 1,
) -> DataFrame:
    """Remove every copy of each site-boilerplate line (see
    ``site_boilerplate_lines``) from that site's pages only.

    Returns one row per input document: (id, site, text, n_lines,
    n_kept) with ``text`` rebuilt from surviving lines in original
    order.  The anti join's right side holds only boilerplate lines
    (template-sized, AQE-broadcast in practice) and is keyed on
    (site, line) so identical text on another site is untouched."""
    lt = site_line_table(df, site_col, text_col, id_col)
    bp = site_boilerplate_lines(
        df, site_col, text_col, id_col, min_frac, min_pages, min_line_len
    ).select("site", "line")
    kept = lt.join(bp, ["site", "line"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.first("site").alias("site"),
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_text"),
    )
    totals = df.select(
        F.col(id_col),
        F.col(site_col).alias("_site_in"),
        (F.size(F.split(F.col(text_col), "\n"))).alias("n_lines"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.col("_site_in").alias("site"),
        F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )
