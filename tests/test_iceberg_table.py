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


def test_time_travel_and_incremental_read(spark, tmp_path):
    """v1 sees only the splits committed before it; the v1→v2 changelog
    is exactly the rows appended after v1 — and both reads prune on the
    split partition column."""
    import pytest

    corpus = gen_corpus(32)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    table = IcebergLayoutTable(str(tmp_path / "tt"))

    def transform(df: DataFrame) -> DataFrame:
        return extract(df).withColumn("split", split_id("doc_id", 8))

    # phase 1: kill the job after its first wave (4 of 8 splits
    # committed), snapshot v1 — the mid-ingest table state
    class _Stop(Exception):
        pass

    def stop_after_first(wave):
        raise _Stop

    with pytest.raises(_Stop):
        run_resumable(
            raw, table.store, transform,
            n_splits=8, wave_size=4, on_wave_done=stop_after_first,
        )
    v1 = table.commit_snapshot()["version"]
    n_v1 = table.read(spark, version=v1).count()
    assert 0 < n_v1 < 32
    assert len(table.snapshot(v1)["splits"]) == 4

    # phase 2: resume to completion, snapshot v2
    run_resumable(raw, table.store, transform, n_splits=8, wave_size=4)
    v2 = table.commit_snapshot()["version"]

    assert table.read(spark, version=v1).count() == n_v1  # time travel
    total = table.read(spark, version=v2).count()
    assert total == 32
    delta = table.read_incremental(spark, v1, v2)
    assert delta.count() == total - n_v1
    v1_splits = set(table.snapshot(v1)["splits"])
    got_splits = {r["split"] for r in delta.select("split").distinct().collect()}
    assert got_splits.isdisjoint(v1_splits)
