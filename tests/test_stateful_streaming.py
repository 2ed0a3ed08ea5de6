"""Stateful streaming: applyInPandasWithState sessionizer must agree with
the batch lag-window sessionization on the same events."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from machine_readability_checker_spark.streaming.stateful import (
    sessionize_stream,
)
from machine_readability_checker_spark.streaming.stream_extract import (
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path / "in")
    events.coalesce(2).write.parquet(in_dir)

    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from machine_readability_checker_spark.streaming.stateful import (
        compact_sessions,
    )

    got = compact_sessions(spark.read.parquet(str(tmp_path / "out")))
    # one trailing open session per user + any closed ones
    per_user = (
        got.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )

    # batch twin: lag-window sessionization
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    batch = (
        events.withColumn(
            "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )
    got_map = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in per_user.collect()}
    exp_map = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert got_map == exp_map


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path / "win_in")
    # time-ordered files + one file per trigger → the watermark advances
    # between microbatches so append mode can close (and emit) windows
    lo, hi = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    mid = lo + (hi - lo) / 2
    events.filter(F.col("ts") <= mid).coalesce(1).write.mode("append").parquet(in_dir)
    events.filter(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("parquet")
        .option("path", str(tmp_path / "win_out"))
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "win_out"))
    batch = windowed_event_counts(events)
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch result exactly
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert g, "stream should emit closed windows"
    for k, v in g.items():
        assert b[k] == v
