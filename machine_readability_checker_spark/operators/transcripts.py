"""Transcript operators over timed caption spans.

The subtitle lane (``core/subtitles.py``) emits ``caption`` spans whose
``media_ref`` carries cue timing as ``t={start_ms}-{end_ms}``.  These
operators turn that per-cue stream into training-ready text at corpus
scale:

- ``caption_cues``: explode the spans table to one row per cue with
  the timing parsed back out of the media_ref — pure JVM
  (``regexp_extract`` + casts), no Python.
- ``transcript_windows``: bucket cues into fixed time windows (the
  standard video-text-pair chunking: one text chunk per N seconds of
  media) and concatenate each window's cue texts in cue order.  Shape:
  one hash aggregate on (doc_id, window) — ``collect_list(struct)`` +
  ``array_sort`` + ``array_join`` keeps ordering INSIDE the aggregate,
  so there is no window function and no second shuffle; at 100 TB the
  only exchange is the groupBy, windows never exceed cue-count × cue
  text in state, and the aggregate is map-side combinable.

No reference analog; training-data pipeline mandate
(SURVEY.md §6 multimodal family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def caption_cues(spans_df: DataFrame) -> DataFrame:
    """documents_spans → one row per caption cue:
    (doc_id, cue_idx, start_ms, end_ms, text)."""
    s = spans_df.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "caption")
    ref = F.col("s.media_ref")
    return s.select(
        "doc_id",
        F.col("s.offset").cast("int").alias("cue_idx"),
        F.regexp_extract(ref, r"^t=(\d+)-(\d+)$", 1)
        .cast("long")
        .alias("start_ms"),
        F.regexp_extract(ref, r"^t=(\d+)-(\d+)$", 2)
        .cast("long")
        .alias("end_ms"),
        F.col("s.text").alias("text"),
    )


def transcript_windows(
    spans_df: DataFrame, window_ms: int = 30_000
) -> DataFrame:
    """Fixed-window transcript chunks:
    (doc_id, window_id, t_start_ms, t_end_ms, n_cues, text) — one row
    per (doc, window) holding that window's cues joined with newlines
    in cue order.  A cue belongs to the window containing its START
    time (the convention subtitle chunkers use; a cue never splits)."""
    cues = caption_cues(spans_df)
    win = (F.col("start_ms") / F.lit(int(window_ms))).cast("long")
    grouped = (
        cues.withColumn("window_id", win)
        .groupBy("doc_id", "window_id")
        .agg(
            F.min("start_ms").alias("t_start_ms"),
            F.max("end_ms").alias("t_end_ms"),
            F.count("*").cast("int").alias("n_cues"),
            F.array_sort(
                F.collect_list(F.struct("cue_idx", "text"))
            ).alias("_cues"),
        )
    )
    return grouped.select(
        "doc_id",
        "window_id",
        "t_start_ms",
        "t_end_ms",
        "n_cues",
        F.array_join(
            F.transform("_cues", lambda c: c["text"]), "\n"
        ).alias("text"),
    )
