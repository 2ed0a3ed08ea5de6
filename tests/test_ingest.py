"""Ingest lane: extension-gate quarantine and sheet enumeration."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_readability_checker_spark.model import RAW_SCHEMA
from machine_readability_checker_spark.sources.fixtures import gen_corpus
from machine_readability_checker_spark.sources.ingest import (
    enumerate_sheets,
    extension_gate,
)


def test_extension_gate(spark):
    corpus = gen_corpus(20)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    bad = spark.createDataFrame(
        [("baddoc1", "docx", bytearray(b"x"), 1, 0, 0, 0, 0, 0)],
        schema=RAW_SCHEMA
    )
    supported, rejected = extension_gate(raw.unionByName(bad))
    assert supported.count() == 20
    rej = rejected.collect()
    assert len(rej) == 1
    assert rej[0]["quarantine_reason"] == "unsupported format: docx"


def test_enumerate_sheets(spark):
    corpus = gen_corpus(30)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    sheets = enumerate_sheets(raw.filter(F.col("fmt").isin("csv", "xlsx")))
    rows = sheets.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every csv doc → exactly one pseudo-sheet named CSV
    csv_docs = [d for d in corpus.itertuples() if d.fmt == "csv"]
    for d in csv_docs:
        names = [r["sheet_name"] for r in by_doc[d.doc_id]]
        assert names == ["CSV"]
    # the codebook workbook reports both sheets in order
    cb = [d for d in corpus.itertuples() if "cbook" in d.doc_id]
    assert cb, "corpus should include a codebook workbook"
    names = [r["sheet_name"] for r in sorted(by_doc[cb[0].doc_id], key=lambda r: r["sheet_idx"])]
    assert names == ["データ", "コード表"]
    assert all(r["n_rows"] > 0 for r in rows)
