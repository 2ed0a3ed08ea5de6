"""Reference cell predicates as native Spark Column expressions.

Each builder mirrors a scalar operator from SURVEY.md §2.3 but compiles to
JVM-side Catalyst expressions (rlike / isin / trim / cast), so applied over
exploded span text or any string column they run vectorized inside
whole-stage codegen with predicate pushdown intact — the scale path for
rule scans over 10^12 documents.  The Python twins in ``core/cells.py``
serve the in-kernel (per-document) lane; THESE serve the corpus-level lane.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..core.cells import (
    MISSING_VALUE_EXPRESSIONS,
    MULTI_VALUE_PATTERN,
    PLATFORM_CHARS_PATTERN,
)

# free-text markers, flattened from the reference's verbose regex;
# (?U) so \s matches the full-width space U+3000 between a Japanese
# marker and its colon, as Python's Unicode \s does
FREE_TEXT_RLIKE = (
    r"(?U)^\s*(?:(?:その他|そのほか)\s*[:：\-–/]|(?:その他|そのほか)\s*[\(（].+?[\)）]"
    r"|(?:コメント|自由記述|詳細|備考|補足|感想|意見|メモ|特記事項|注釈|自己PR"
    r"|フリーテキスト|フリー回答)\s*[:：])"
)

# (?U) = Java UNICODE_CHARACTER_CLASS so \W/\d agree with Python's
# Unicode-aware classes (e.g. '①テスト' is word-ish in both engines)
UNCLEAR_HEADER_RLIKE = r"(?U)^(?:\s*|.|\d+|[\W_]+|[A-Za-z]\d?)$"


def ustrip(col: Column) -> Column:
    r"""Unicode-aware strip: Python's ``str.strip()`` removes all Unicode
    whitespace (U+3000, NBSP, tabs), while Spark's ``trim`` removes only
    ASCII spaces — a silent parity break on Japanese full-width padding.
    ``(?U)`` makes Java's ``\s`` match the Unicode White_Space set."""
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


def has_platform_chars(col: Column) -> Column:
    """Platform-dependent character detector (F4)."""
    return col.rlike(PLATFORM_CHARS_PATTERN)


def is_clean_numeric(col: Column) -> Column:
    """Clean-numeric test (F5): only [0-9.-] characters AND parses as a
    double.  ``try_cast`` (not ``cast``) — ANSI mode throws on malformed
    numerics, and a rule scan must classify bad cells, not die on them.

    Python's ``float()`` accepts any Unicode decimal digit, so the kernel
    twin admits full-width ``１２３`` — here ``(?U)`` makes Java's ``\\d``
    Unicode-aware and ``translate`` maps the full-width digits (the
    reference's Japanese domain) to ASCII before the cast.  Digits from
    other Nd blocks (e.g. Arabic-Indic) still diverge: Python parses
    them, the JVM cast never will — out of the reference's domain."""
    s = ustrip(col)
    ascii_s = F.translate(s, "０１２３４５６７８９", "0123456789")
    return s.rlike(r"(?U)^[\d.\-]+$") & ascii_s.try_cast("double").isNotNull()


def is_free_text_marker(col: Column) -> Column:
    """Free-text marker prefix (F6)."""
    return col.rlike(FREE_TEXT_RLIKE)


def is_missing_expression(col: Column) -> Column:
    """Missing-value vocabulary membership (F7): strip().lower() ∈ the
    36-entry set (broadcast as a literal IN list)."""
    return F.lower(ustrip(col)).isin(
        [x.strip().lower() for x in MISSING_VALUE_EXPRESSIONS]
    )


def has_multiple_values(col: Column) -> Column:
    """Multi-datum cell pattern (F8): newline/comma/semicolon/slash."""
    return col.rlike(MULTI_VALUE_PATTERN)


def has_fullwidth_space(col: Column) -> Column:
    """Layout-whitespace detector (F9): U+3000 substring."""
    return col.contains("　")


def has_embedded_newline(col: Column) -> Column:
    """Embedded newline (F10)."""
    return col.rlike(r"[\n\r]")


def is_unclear_header(col: Column) -> Column:
    """Unclear header name (F12): empty / one char / digits-only /
    symbols-only / short latin code, or the pandas 'Unnamed' sentinel."""
    s = ustrip(col)
    return s.rlike(UNCLEAR_HEADER_RLIKE) | col.contains("Unnamed")


def is_header_like_text(col: Column, threshold: float = 0.5) -> Column:
    """Row-level header-likeness (P4 heuristic) over a tab-joined cell-row
    span: fraction of fields that are numeric-like < threshold."""
    fields = F.split(col, "\t")
    nonempty = F.filter(fields, lambda x: ustrip(x) != "")
    # (?U): the kernel twin uses Python str.isdigit(), which accepts any
    # Unicode decimal digit (full-width included)
    numericish = F.filter(
        nonempty,
        lambda x: F.regexp_replace(F.regexp_replace(x, r"\.", ""), "-", "").rlike(
            r"(?U)^\d+$"
        ),
    )
    return (
        F.size(nonempty) > 0
    ) & (F.size(numericish) / F.size(nonempty) < F.lit(threshold))
