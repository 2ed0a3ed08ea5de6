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
    # docx became a supported lane in r3 — exe is the unsupported probe
    bad = spark.createDataFrame(
        [("baddoc1", "exe", bytearray(b"x"), 1, 0, 0, 0, 0, 0)],
        schema=RAW_SCHEMA
    )
    supported, rejected = extension_gate(raw.unionByName(bad))
    assert supported.count() == 20
    rej = rejected.collect()
    assert len(rej) == 1
    assert rej[0]["quarantine_reason"] == "unsupported format: exe"


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


def _ingest_args(corpus, index, **kw):
    import argparse

    d = dict(
        corpus=corpus, index=index, new=None, gen=0, threshold=0.5,
        cores=8, n_buckets=8,
    )
    d.update(kw)
    return argparse.Namespace(**d)


def test_ingest_waves_and_empty_index_dir(spark, tmp_path):
    """Three ingest waves through jobs.ingest.run — the spark-submit
    job's whole logic minus session lifecycle:

    1. cold start: corpus+index created, intra-batch near-dups removed;
    2. warm wave: a batch re-sending wave-1 boilerplate is rejected by
       index probes alone;
    3. ADVICE-r2 drift regression: wipe the INDEX to an empty dir (the
       crash-leftover case) — the bootstrap must rebuild it from the
       standing corpus (data-gated, not isdir-gated) so re-sent corpus
       docs are still rejected, and the corpus is back-filled into the
       index."""
    import jobs.ingest as J
    from pyspark.sql import functions as F

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")

    def batch_df(tag, n, boiler_every):
        return spark.range(n).select(
            F.concat(F.lit(f"{tag}-"), F.col("id").cast("string")).alias(
                "doc_id"
            ),
            F.when(
                F.pmod("id", F.lit(boiler_every)) == 0,
                F.concat(
                    F.lit(
                        "shared boilerplate text that repeats across "
                        "batches with common tokens "
                    ),
                    F.pmod("id", F.lit(3)).cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit(f"fresh {tag} doc "),
                    F.col("id").cast("string"),
                    F.lit(" tokens "),
                    F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))),
                )
            )
            .alias("text"),
        )

    b1 = str(tmp_path / "b1.parquet")
    batch_df("w1", 60, 4).write.parquet(b1)
    s1 = J.run(spark, _ingest_args(corpus, index, new=b1))
    assert s1["batch_docs"] == 60
    assert s1["corpus_dup_rejected"] == 0  # cold start: no probe
    # 15 boilerplate docs share 3 texts (exact -> 3 keepers), and the
    # 3 variants differ only in a trailing digit so MinHash clusters
    # them into ONE keeper: 14 removed
    assert s1["intra_batch_removed"] == 14
    assert s1["accepted"] == 46
    n_corpus_1 = spark.read.parquet(corpus).count()
    assert n_corpus_1 == 46

    # wave 2: same boilerplate family -> rejected by CORPUS probes
    b2 = str(tmp_path / "b2.parquet")
    batch_df("w2", 30, 3).write.parquet(b2)
    s2 = J.run(spark, _ingest_args(corpus, index, new=b2))
    assert s2["corpus_dup_rejected"] >= 10  # all 10 boilerplate re-sends
    assert s2["accepted"] == 30 - s2["corpus_dup_rejected"] - s2[
        "intra_batch_removed"
    ]
    n_corpus_2 = spark.read.parquet(corpus).count()
    assert n_corpus_2 == n_corpus_1 + s2["accepted"]

    # wave 3: crash-leftover EMPTY index dir + standing corpus
    import os
    import shutil

    shutil.rmtree(index)
    os.makedirs(index)
    b3 = str(tmp_path / "b3.parquet")
    batch_df("w3", 30, 3).write.parquet(b3)
    s3 = J.run(spark, _ingest_args(corpus, index, new=b3))
    assert s3["corpus_dup_rejected"] >= 10, (
        "empty index dir skipped the bootstrap: corpus near-dups "
        "accepted (ADVICE-r2 drift bug)"
    )
    # index now covers the whole corpus again (back-filled + appended)
    idx_docs = (
        spark.read.parquet(index).select("doc_id").distinct().count()
    )
    assert idx_docs == spark.read.parquet(corpus).count()
