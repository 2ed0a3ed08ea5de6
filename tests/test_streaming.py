"""Streaming lane: file-source extraction with checkpointed exactly-once
append; incremental pickup of late-arriving files."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from machine_readability_checker_spark.model import RAW_SCHEMA
from machine_readability_checker_spark.sources.fixtures import gen_corpus
from machine_readability_checker_spark.streaming.stream_extract import (
    stream_extract,
)


def _write_batch(spark, corpus: pd.DataFrame, path: str):
    spark.createDataFrame(corpus, schema=RAW_SCHEMA).coalesce(2).write.mode(
        "append"
    ).parquet(path)


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    corpus = gen_corpus(40)
    _write_batch(spark, corpus.iloc[:25], in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 25

    # late-arriving files: only the delta is processed on the next trigger
    _write_batch(spark, corpus.iloc[25:], in_dir)
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 40
    # no duplicates: every doc_id exactly once (exactly-once file sink)
    assert (
        got2.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )
    # spans identical to the single-node oracle for a sample doc
    from machine_readability_checker_spark.core.extract import extract_document

    sample = got2.filter(F.col("doc_id").contains("mhdr")).collect()[0]
    src = corpus[corpus.doc_id == sample["doc_id"]].iloc[0]
    expected = extract_document(
        src.doc_id, src.fmt, bytes(src.content),
        src.header_start_row, src.header_end_row,
        src.data_start_row, src.data_end_row,
    )["spans"]
    got_spans = [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in sample["spans"]
    ]
    assert got_spans == [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected
    ]
