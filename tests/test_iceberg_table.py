"""Iceberg-layout snapshot shim: snapshot roll-up over committed split
manifests, atomic current-pointer flip."""

from __future__ import annotations

from pyspark.sql import DataFrame

from machine_readability_checker_spark.model import RAW_SCHEMA
from machine_readability_checker_spark.operators.extract import extract
from machine_readability_checker_spark.operators.repartition import split_id
from machine_readability_checker_spark.plans.manifest import run_resumable
from machine_readability_checker_spark.sources.fixtures import gen_corpus
from machine_readability_checker_spark.sources.iceberg_table import (
    IcebergLayoutTable,
)


def test_snapshot_commit_and_read(spark, tmp_path):
    corpus = gen_corpus(24)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    table = IcebergLayoutTable(str(tmp_path / "t"))

    def transform(df: DataFrame) -> DataFrame:
        return extract(df).withColumn("split", split_id("doc_id", 4))

    run_resumable(raw, table.store, transform, n_splits=4, wave_size=4)
    snap = table.commit_snapshot(schema_json='{"doc_id":"string"}')
    assert snap["version"] == 1
    assert snap["total_docs"] == 24
    assert sorted(snap["splits"]) == [0, 1, 2, 3]

    cur = table.current_snapshot()
    assert cur is not None and cur["version"] == 1
    assert table.read(spark).count() == 24

    snap2 = table.commit_snapshot()
    assert snap2["version"] == 2
    assert table.current_snapshot()["version"] == 2
