"""Span-sequence diff operator tests."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.operators.spandiff import (
    span_diff,
    span_diff_summary,
)

SCHEMA = (
    "doc_id string, spans array<struct"
    "<kind:string,text:string,media_ref:string,offset:int>>"
)


def _s(kind, text, off, media=""):
    return {"kind": kind, "text": text, "media_ref": media, "offset": off}


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("same", [_s("header", "a", 0), _s("cell", "x\t1", 1)]),
            ("mut", [_s("header", "a", 0), _s("cell", "x\t1", 1)]),
            ("prefix", [_s("header", "a", 0), _s("cell", "x\t1", 1)]),
            ("lonly", [_s("main", "t", 0)]),
            ("empty_both", []),
            ("empty_one", []),
        ],
        SCHEMA,
    )
    right = spark.createDataFrame(
        [
            ("same", [_s("header", "a", 0), _s("cell", "x\t1", 1)]),
            ("mut", [_s("header", "a", 0), _s("cell", "x\t2", 1)]),
            ("prefix", [_s("header", "a", 0)]),
            ("ronly", [_s("main", "t", 0)]),
            ("empty_both", []),
            ("empty_one", [_s("media", "", 0, "img.png")]),
        ],
        SCHEMA,
    )
    return left, right


def test_statuses_and_offsets(frames):
    left, right = frames
    rows = {r["doc_id"]: r for r in span_diff(left, right).collect()}
    assert rows["same"]["status"] == "equal"
    assert rows["same"]["first_diff_offset"] is None
    assert rows["mut"]["status"] == "diff"
    assert rows["mut"]["first_diff_offset"] == 1
    assert rows["prefix"]["status"] == "diff"
    assert rows["prefix"]["first_diff_offset"] == 1  # common length
    assert rows["lonly"]["status"] == "only_left"
    assert rows["lonly"]["n_right"] is None
    assert rows["ronly"]["status"] == "only_right"
    assert rows["empty_both"]["status"] == "equal"
    assert rows["empty_one"]["status"] == "diff"
    assert rows["empty_one"]["first_diff_offset"] == 0


def test_summary(frames):
    left, right = frames
    got = {r["status"]: r["n_docs"]
           for r in span_diff_summary(span_diff(left, right)).collect()}
    assert got == {"equal": 2, "diff": 3, "only_left": 1, "only_right": 1}


def test_diff_is_jvm_only(frames):
    """No BatchEvalPython / ArrowEval in the plan — the span arrays are
    compared entirely JVM-side (the 10^12-doc contract: one join, no
    explode, no Python)."""
    left, right = frames
    plan = (
        span_diff(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "Generate" not in plan  # no explode


def test_corpus_diff_statuses(spark):
    """Text-level corpus diff: all four statuses from a hand-built
    pair of builds, summary reconciles."""
    from machine_readability_checker_spark.operators.spandiff import (
        corpus_diff,
        corpus_diff_summary,
    )

    old = spark.createDataFrame(
        [("a", "one"), ("b", "two"), ("c", "three")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("a", "one"), ("b", "two CHANGED"), ("d", "four")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        "a": "same", "b": "changed", "c": "removed", "d": "added"
    }
    summary = {
        r.status: r.n_docs
        for r in corpus_diff_summary(corpus_diff(old, new)).collect()
    }
    assert summary == {"same": 1, "changed": 1, "removed": 1, "added": 1}
