"""Span-sequence diff — the north rule's correctness criterion
(per-document span-sequence equality: kind, text, media_ref, order) as
a corpus-scale operator.

Use cases: A/B-ing two engine versions over the same corpus before a
rollout, auditing a re-extraction after a parser fix, validating a
migration between storage layouts.  At 10^12 documents this must be a
single co-partitioned join — and it is: one full-outer join on doc_id,
then pure JVM array expressions (struct-array equality, a
sequence/filter scan for the first mismatching offset).  No Python, no
explode — the span arrays never leave their row.

Statuses: ``equal`` | ``diff`` (first_diff_offset = first position
whose struct differs, or the common length when one sequence is a
prefix of the other) | ``only_left`` | ``only_right``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _first_diff(a: Column, b: Column) -> Column:
    """Smallest index where the two struct arrays disagree; common
    length if one is a strict prefix; NULL when fully equal."""
    common = F.least(F.size(a), F.size(b))
    # guard: Spark's sequence(0, stop) DESCENDS when stop < 0, so an
    # empty side must bypass the scan entirely
    neq_idx = F.when(
        common > 0,
        F.array_min(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), common - 1),
                    lambda i: F.when(
                        F.element_at(a, i + 1) != F.element_at(b, i + 1), i
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ),
    )
    return F.coalesce(
        neq_idx, F.when(F.size(a) != F.size(b), common)
    )


def span_diff(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """→ (doc_id, status, first_diff_offset, n_left, n_right) — one
    row per document present on either side."""
    a = left.select(F.col(id_col).alias("doc_id"),
                    F.col(spans_col).alias("_a"))
    b = right.select(F.col(id_col).alias("doc_id"),
                     F.col(spans_col).alias("_b"))
    j = a.join(b, "doc_id", "full_outer")
    sa, sb = F.col("_a"), F.col("_b")
    status = (
        F.when(sa.isNull(), F.lit("only_right"))
        .when(sb.isNull(), F.lit("only_left"))
        .when(sa == sb, F.lit("equal"))
        .otherwise(F.lit("diff"))
    )
    first = F.when(
        sa.isNotNull() & sb.isNotNull() & (sa != sb), _first_diff(sa, sb)
    )
    return j.select(
        "doc_id",
        status.alias("status"),
        first.cast("int").alias("first_diff_offset"),
        F.when(sa.isNotNull(), F.size(sa)).cast("int").alias("n_left"),
        F.when(sb.isNotNull(), F.size(sb)).cast("int").alias("n_right"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-version diff at the TEXT level (the release-notes
    counterpart of ``span_diff``: what changed between two cleaned
    corpus builds): one full-outer join on the id, comparing md5 of
    the text so the payloads themselves never shuffle twice.  Status
    per id: ``same`` | ``changed`` | ``added`` (new only) |
    ``removed`` (old only)."""
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_ho"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_hn"),
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("_id").alias(id_col), status.alias("status"))


def corpus_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) rollup of ``corpus_diff`` — the four numbers a
    corpus release note leads with."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


def span_diff_summary(diff: DataFrame) -> DataFrame:
    """→ (status, n_docs) — the one-line rollout verdict."""
    return diff.groupBy("status").agg(F.count("*").alias("n_docs")).orderBy(
        "status"
    )
