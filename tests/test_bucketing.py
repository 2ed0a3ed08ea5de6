"""Catalog bucketing: the co-located-join contract — two tables
bucketed on the same key join with ZERO shuffle exchanges, and the
single-file-per-bucket sort eliminates the merge-join sorts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import bucketing as B


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "mrc_bucket_test"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'"
    )
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_shuffle_and_no_sort(spark, bucket_db):
    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    scores = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 / 97.0).alias("score"),
    )
    B.write_bucketed_table(docs, f"{bucket_db}.docs_b", n_buckets=8)
    B.write_bucketed_table(scores, f"{bucket_db}.scores_b", n_buckets=8)

    left = B.read_bucketed_table(spark, f"{bucket_db}.docs_b")
    right = B.read_bucketed_table(spark, f"{bucket_db}.scores_b")
    joined = left.hint("merge").join(right, "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the whole point: both sides read pre-distributed — no exchange
    assert "Exchange" not in plan
    assert joined.count() == 5000
    row = joined.filter(F.col("doc_id") == 42).first()
    assert row["text"] == "text 42"

    # sort elimination additionally needs the scan-output-ordering
    # opt-in (off by default since 3.0 because MULTI-file buckets
    # can't guarantee order — which is exactly why the writer pins one
    # file per bucket); with it, the merge join's sorts vanish too
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(conf, "false")
    try:
        spark.conf.set(conf, "true")
        plan2 = (
            left.hint("merge").join(right, "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan2
        assert "Sort " not in plan2.replace("SortMergeJoin", "SMJ")
    finally:
        spark.conf.set(conf, old)

    # contrast: the same join over plain (unbucketed) frames shuffles
    plain = (
        docs.hint("merge").join(scores, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plain


def test_bucketed_aggregation_skips_exchange(spark, bucket_db):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("v")
    )
    B.write_bucketed_table(docs, f"{bucket_db}.agg_b", n_buckets=4)
    t = B.read_bucketed_table(spark, f"{bucket_db}.agg_b")
    plan = (
        t.groupBy("doc_id").agg(F.sum("v"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # groupBy on the bucket key reuses the storage distribution
    assert "Exchange" not in plan
