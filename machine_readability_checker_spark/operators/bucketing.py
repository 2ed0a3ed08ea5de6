"""Catalog-bucketed tables: co-located joins without a shuffle.

The biggest repeated cost in a corpus pipeline is joining the same
key over and over — spans ⋈ metadata, docs ⋈ quality scores, index ⋈
corpus — and every such join shuffles BOTH sides on the key unless the
storage layout already agrees with the join distribution.  Spark's
catalog bucketing (``bucketBy(n, key).saveAsTable``) persists exactly
that agreement: each table is hash-partitioned into ``n`` bucket files
at WRITE time, and any equi-join between two tables bucketed on the
same key with the same ``n`` is planned with ZERO shuffle exchanges —
the 100 TB join becomes a per-bucket merge.

``write_bucketed_table`` also repartitions by the key first so each
bucket lands as ONE file; with ``sortBy`` that makes the per-bucket
sort order a storage property too, eliminating the join's sort stages
once ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` is set
(off by default since 3.0 precisely because MULTI-file buckets cannot
guarantee scan order — the one-file-per-bucket write is what makes the
opt-in sound here).  Both properties are pinned by plan tests, not
assumed.

This is the managed-catalog complement of the directory-layout
bucketing the engine already uses (Iceberg bucket(N, doc_id) splits,
the banded MinHash index partitions): those serve partition PRUNING,
this serves join DISTRIBUTION.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and by
    default sorted) by ``key``: one file per bucket (pre-repartitioned
    by the key so file count == bucket count), so both the hash
    distribution AND the sort order become storage properties the
    planner can consume."""
    out = df.repartition(n_buckets, F.col(key))
    writer = (
        out.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec rides the catalog metadata, so
    downstream joins on the bucket key skip their exchanges."""
    return spark.table(table)
