"""Interleaved text+media segment assembly (operators/interleave.py).

The MMC4/OBELICS export shape: ordered typed segments where runs of
consecutive kept text spans collapse into one text segment and every
media span is its own segment.  No counterpart in the reference repo
(single-process, text-only output)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from machine_readability_checker_spark.model import SPAN_STRUCT
from machine_readability_checker_spark.operators.interleave import (
    interleaved_segments,
    media_refs,
    write_interleaved_shards,
)

SPANS_T = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)


def _mk(spans):
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(spans)
    ]


def _df(spark, spans, doc="d1"):
    return spark.createDataFrame([(doc, _mk(spans))], SPANS_T)


def _segs(df):
    return [
        (s["type"], s["text"], s["media_ref"])
        for s in df.first()["segments"]
    ]


def test_text_runs_merge_and_media_splits(spark):
    spans = [
        ("title", "T", ""),
        ("main", "alpha", ""),
        ("media", "a cat", "x.png"),
        ("main", "beta", ""),
        ("main", "gamma", ""),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [
        ("text", "T\n\nalpha", None),
        ("media", "a cat", "x.png"),
        ("text", "beta\n\ngamma", None),
    ]


def test_leading_trailing_and_consecutive_media(spark):
    spans = [
        ("media", "", "a.png"),
        ("media", "", "b.png"),
        ("main", "mid", ""),
        ("media", "", "c.png"),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [
        ("media", "", "a.png"),
        ("media", "", "b.png"),
        ("text", "mid", None),
        ("media", "", "c.png"),
    ]


def test_non_text_kinds_and_empty_texts_dropped(spark):
    spans = [
        ("boilerplate", "nav nav", ""),
        ("main", "", ""),  # empty text span drops
        ("main", "kept", ""),
        ("footer", "(c) corp", ""),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [("text", "kept", None)]


def test_no_media_one_segment_and_media_only(spark):
    out = interleaved_segments(
        _df(spark, [("main", "a", ""), ("line", "b", "")])
    )
    assert _segs(out) == [("text", "a\n\nb", None)]
    out = interleaved_segments(_df(spark, [("media", "", "x.png")]))
    assert _segs(out) == [("media", "", "x.png")]


def test_empty_span_array_yields_empty_segments(spark):
    out = interleaved_segments(_df(spark, []))
    assert out.first()["segments"] == []


def test_media_refs_ordered(spark):
    spans = [
        ("media", "", "z.png"),
        ("main", "t", ""),
        ("media", "", "a.png"),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert out.select(
        media_refs().alias("r")
    ).first()["r"] == ["z.png", "a.png"]


def test_segment_assembly_is_zero_exchange(spark):
    df = interleaved_segments(_df(spark, [("main", "a", "")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the fold stays JVM-side: no Python evaluation nodes
    assert "Python" not in plan


def test_shard_writer_byte_deterministic(spark, tmp_path):
    rows = [
        (
            f"doc{i:03d}",
            _mk(
                [("main", f"text {i}", ""), ("media", "", f"m{i}.png")]
                * (1 + i % 3)
            ),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, SPANS_T)
    seg = interleaved_segments(df).select("doc_id", "segments")

    def run(p):
        man = write_interleaved_shards(seg, str(p), n_shards=4).collect()
        files = sorted(glob.glob(os.path.join(str(p), "*.jsonl.gz")))
        return man, [open(f, "rb").read() for f in files]

    man1, b1 = run(tmp_path / "a")
    man2, b2 = run(tmp_path / "b")
    assert b1 == b2 and len(b1) == 4
    assert sum(m["n_docs"] for m in man1) == 40
    assert {m["shard"] for m in man1} == {0, 1, 2, 3}
    key = lambda m: (m["shard"], m["n_docs"], m["n_bytes"])  # noqa: E731
    assert sorted(map(key, man1)) == sorted(map(key, man2))
    # lines parse back to the segment shape, docs are disjoint
    seen = set()
    for blob in b1:
        for line in gzip.decompress(blob).splitlines():
            d = json.loads(line)
            seen.add(d["doc_id"])
            for s in d["segments"]:
                assert s["type"] in ("text", "media")
                if s["type"] == "media":
                    assert s["media_ref"].endswith(".png")
    assert len(seen) == 40
