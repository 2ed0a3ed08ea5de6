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


def test_schema_and_partition_spec_evolution(spark, tmp_path):
    """Iceberg evolution analogs (VERDICT r2 #7), round-tripped across
    time travel:

    - ADD COLUMN: wave B writes a `quality` column wave A never had;
      current reads surface it (NULL on pre-evolution rows, mergeSchema),
      while `read(version=v1)` projects it away — VERSION AS OF uses the
      snapshot's OWN schema.
    - REPLACE PARTITION FIELD bucket(4,...) -> bucket(8,...): wave B
      lands under spec 2's namespaced split ids, disjoint from wave A's
      append-once splits; unset metadata carries forward on later
      commits like Iceberg metadata lineage."""
    import json

    from pyspark.sql import functions as F

    from machine_readability_checker_spark.sources.iceberg_table import (
        SPEC_STRIDE,
        split_expr,
    )

    corpus = gen_corpus(48)
    table = IcebergLayoutTable(str(tmp_path / "evo"))
    spec1 = {"spec_id": 0, "num_buckets": 4, "column": "doc_id"}
    spec2 = {"spec_id": 1, "num_buckets": 8, "column": "doc_id"}

    # wave A: original schema, spec 1 (bucket(4, doc_id))
    raw_a = spark.createDataFrame(corpus.iloc[:24], schema=RAW_SCHEMA)

    def transform_a(df):
        return extract(df).withColumn("split", split_expr(spec1))

    run_resumable(
        raw_a, table.store, transform_a, wave_size=4,
        split_expr_col=split_expr(spec1), split_universe=range(4),
    )
    schema_v1 = json.dumps(
        {"doc_id": "string", "spans": "array", "results": "array",
         "metrics": "struct", "partition_id": "int"}
    )
    v1 = table.commit_snapshot(schema_json=schema_v1, partition_spec=spec1)[
        "version"
    ]

    # wave B: evolved schema (+quality) under spec 2 (bucket(8, doc_id))
    raw_b = spark.createDataFrame(corpus.iloc[24:], schema=RAW_SCHEMA)

    def transform_b(df):
        return (
            extract(df)
            .withColumn(
                "quality", F.length(F.col("doc_id")).cast("double") / 10.0
            )
            .withColumn("split", split_expr(spec2))
        )

    spec2_universe = [SPEC_STRIDE + b for b in range(8)]
    stats = run_resumable(
        raw_b, table.store, transform_b, wave_size=4,
        split_expr_col=split_expr(spec2), split_universe=spec2_universe,
    )
    assert stats["splits_total"] == 8 and stats["splits_skipped"] == 0
    schema_v2 = json.dumps(
        {"doc_id": "string", "spans": "array", "results": "array",
         "metrics": "struct", "partition_id": "int", "quality": "double"}
    )
    v2 = table.commit_snapshot(schema_json=schema_v2, partition_spec=spec2)[
        "version"
    ]

    # current read: both waves, evolved column NULL on pre-evolution rows
    cur = table.read(spark)
    assert cur.count() == 48
    assert "quality" in cur.columns
    nulls = cur.filter(F.col("quality").isNull()).count()
    assert nulls == 24
    # time travel to v1: old split set AND old schema (no quality col)
    old = table.read(spark, version=v1)
    assert old.count() == 24
    assert "quality" not in old.columns
    # v2 read sees everything with the evolved schema
    new = table.read(spark, version=v2)
    assert new.count() == 48 and "quality" in new.columns
    # changelog = exactly wave B, entirely in spec 2's split namespace
    delta = table.read_incremental(spark, v1, v2)
    splits = {r["split"] for r in delta.select("split").distinct().collect()}
    assert delta.count() == 24
    assert all(s >= SPEC_STRIDE for s in splits)
    assert set(table.snapshot(v1)["splits"]).isdisjoint(splits)
    # metadata lineage: a plain commit carries schema+spec forward
    v3 = table.commit_snapshot()
    assert v3["schema"] == schema_v2
    assert v3["partition_spec"] == spec2
    assert table.snapshot(v1)["partition_spec"] == spec1


def test_compaction_and_snapshot_expiry(spark, tmp_path):
    """Maintenance procedures: compaction shrinks a fragmented split to
    one file with byte-identical rows (time travel intact), half-done
    swaps recover idempotently, snapshot expiry drops old metadata but
    never the current pointer's target."""
    import os
    import shutil

    from machine_readability_checker_spark.sources.iceberg_table import (
        TableMaintenance,
    )

    corpus = gen_corpus(24)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA).repartition(8)
    table = IcebergLayoutTable(str(tmp_path / "t"))

    def transform(df: DataFrame) -> DataFrame:
        # high shuffle-partition fan-in → many small files per split dir
        return extract(df).withColumn("split", split_id("doc_id", 2))

    run_resumable(raw, table.store, transform, n_splits=2, wave_size=2)
    v1 = table.commit_snapshot(schema_json='{"doc_id":"string"}')["version"]

    data_dir = table.store.data_dir
    split0 = os.path.join(data_dir, "split=0")
    n_files_before = len(
        [f for f in os.listdir(split0) if f.endswith(".parquet")]
    )
    assert n_files_before > 1  # fragmented by construction

    before_rows = sorted(
        (r["doc_id"], len(r["spans"]))
        for r in table.read(spark).select("doc_id", "spans").collect()
    )

    maint = TableMaintenance(table)
    stats = maint.compact(spark, max_files_per_split=1)
    assert set(stats) == {0, 1}
    assert all(s["files_after"] == 1 for s in stats.values())

    after_rows = sorted(
        (r["doc_id"], len(r["spans"]))
        for r in table.read(spark).select("doc_id", "spans").collect()
    )
    assert after_rows == before_rows
    # split-based time travel unaffected by the file rewrite
    assert table.read(spark, version=v1).count() == 24

    # crash recovery: simulate a swap that stopped after the first
    # rename (live dir missing, .old present) → restore
    os.rename(split0, split0 + ".old")
    restored = maint.recover_compaction()
    assert restored == [0] and os.path.isdir(split0)
    # completed swap with a leftover .old → dropped, not restored
    shutil.copytree(split0, split0 + ".old")
    assert maint.recover_compaction() == []
    assert not os.path.isdir(split0 + ".old")
    assert table.read(spark).count() == 24

    # snapshot expiry
    v2 = table.commit_snapshot()["version"]
    v3 = table.commit_snapshot()["version"]
    expired = TableMaintenance(table).expire_snapshots(keep_last=2)
    assert expired == [v1]
    assert table.current_snapshot()["version"] == v3
    assert table.read(spark, version=v2).count() == 24
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        table.snapshot(v1)


def test_remove_orphans_sweeps_only_stale_temps(spark, tmp_path):
    """The delete_orphan_files analog removes crash leftovers older
    than the grace period and NOTHING else: committed snapshots,
    manifests, data directories, young temps, and .old half-swap
    evidence all survive."""
    import os
    import time as _time

    from machine_readability_checker_spark.sources.iceberg_table import (
        TableMaintenance,
    )

    corpus = gen_corpus(12)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    root = str(tmp_path / "orph")
    table = IcebergLayoutTable(root)

    def transform(df: DataFrame) -> DataFrame:
        return extract(df).withColumn("split", split_id("doc_id", 2))

    run_resumable(raw, table.store, transform, n_splits=2, wave_size=2)
    table.commit_snapshot()
    n_before = table.read(spark).count()

    now = _time.time()
    old = now - 10 * 24 * 3600
    # plant the orphan classes: stale snapshot/manifest temps, a Spark
    # staging dir (top-level + inside a split), a stale compact temp —
    # plus a YOUNG manifest temp and half-swap .old evidence
    snap_dir = table.snapshot_dir
    man_dir = table.store.manifest_dir
    data_dir = table.store.data_dir
    plants = {
        "snap_tmp": os.path.join(snap_dir, ".snap.abc123"),
        "cur_tmp": os.path.join(snap_dir, ".cur.def456"),
        "man_tmp": os.path.join(man_dir, ".split-0.xyz"),
    }
    for p in plants.values():
        with open(p, "w") as f:
            f.write("{}")
        os.utime(p, (old, old))
    tmp_dirs = [
        os.path.join(data_dir, "_temporary"),
        os.path.join(data_dir, "split=0", "_temporary"),
        os.path.join(data_dir, "split=9.compact.tmp"),
    ]
    for d in tmp_dirs:
        os.makedirs(d)
        os.utime(d, (old, old))
    young = os.path.join(man_dir, ".split-1.fresh")
    with open(young, "w") as f:
        f.write("{}")
    old_dir = os.path.join(data_dir, "split=1.old")
    os.makedirs(old_dir)
    os.utime(old_dir, (old, old))

    maint = TableMaintenance(table)
    # dry run deletes nothing
    dry = maint.remove_orphans(now=now, dry_run=True)
    assert len(dry["removed"]) == 6
    assert all(os.path.exists(p) for p in plants.values())

    swept = maint.remove_orphans(now=now)
    assert sorted(swept["removed"]) == sorted(dry["removed"])
    assert swept["kept_young"] == [
        os.path.relpath(young, root)
    ]
    for p in list(plants.values()) + tmp_dirs:
        assert not os.path.exists(p)
    # young temp and .old evidence survive; committed state intact
    assert os.path.exists(young)
    assert os.path.exists(old_dir)
    assert table.read(spark).count() == n_before
    assert table.current_snapshot()["version"] == 1
    # idempotent: a second sweep finds nothing stale
    again = maint.remove_orphans(now=now)
    assert again["removed"] == []


def test_sorted_compaction_orders_rows_and_survives_audit(spark, tmp_path):
    """compact(sort_by=...) rewrites each split ordered by the key
    (Iceberg's rewrite_data_files sort strategy): rows come back
    sorted per split, counts verify, time travel survives, and an
    already-single-file split still rewrites when a sort is requested
    (layout change, not just file-count change)."""
    import os

    from machine_readability_checker_spark.sources.iceberg_table import (
        TableMaintenance,
    )

    corpus = gen_corpus(24)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA).repartition(8)
    table = IcebergLayoutTable(str(tmp_path / "t"))

    def transform(df: DataFrame) -> DataFrame:
        return extract(df).withColumn("split", split_id("doc_id", 2))

    run_resumable(raw, table.store, transform, n_splits=2, wave_size=2)
    v1 = table.commit_snapshot(schema_json='{"doc_id":"string"}')["version"]
    n_total = table.read(spark).count()

    maint = TableMaintenance(table)
    stats = maint.compact(spark, sort_by=["doc_id"])
    assert all(s["files_after"] == 1 for s in stats.values())
    table.commit_snapshot()

    for split in (0, 1):
        ids = [
            r.doc_id
            for r in spark.read.parquet(
                os.path.join(table.store.data_dir, f"split={split}")
            ).collect()
        ]
        assert ids == sorted(ids)  # the sorted-rewrite contract
    assert table.read(spark).count() == n_total
    assert table.read(spark, version=v1).count() == n_total

    # already one file per split: a sort request still rewrites
    stats2 = maint.compact(spark, sort_by=["doc_id"])
    assert set(stats2) == {0, 1}
