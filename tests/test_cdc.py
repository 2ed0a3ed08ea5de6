"""Content-defined chunking: determinism, size bounds, and THE
property — insertion resilience (a shifted tail re-aligns)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import cdc as C


def _blob(n: int, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    return rng.randbytes(n)


def test_boundaries_cover_and_respect_bounds():
    data = _blob(200_000)
    spans = C.cdc_boundaries(data, avg_size=4096, min_size=1024,
                             max_size=16384)
    # exact cover, in order
    assert spans[0][0] == 0
    assert sum(ln for _, ln in spans) == len(data)
    for (o1, l1), (o2, _l2) in zip(spans, spans[1:]):
        assert o1 + l1 == o2
    # every chunk except the final one respects [min, max]
    for _, ln in spans[:-1]:
        assert 1024 <= ln <= 16384
    # average lands in the right decade (expected ~min+avg)
    mean = sum(ln for _, ln in spans) / len(spans)
    assert 2000 < mean < 12000
    # deterministic
    assert spans == C.cdc_boundaries(data, 4096, 1024, 16384)
    with pytest.raises(ValueError):
        C.cdc_boundaries(data, avg_size=5000)


def test_insertion_resilience_tail_realigns():
    """The reason CDC exists: insert 10 bytes near the front — a
    fixed-block scheme loses every downstream block, CDC loses only
    the chunks at the edit site."""
    data = _blob(300_000)
    edited = data[:5000] + b"INSERTED!!" + data[5000:]

    def digests(b: bytes):
        return {
            hashlib.sha256(b[o:o + ln]).hexdigest()
            for o, ln in C.cdc_boundaries(b, 4096, 1024, 16384)
        }

    d0, d1 = digests(data), digests(edited)
    shared = len(d0 & d1) / len(d0)
    assert shared > 0.9  # tail re-aligned; only the edit region churns

    # contrast: fixed 4096-byte blocks share (almost) nothing
    def fixed(b: bytes):
        return {
            hashlib.sha256(b[i:i + 4096]).hexdigest()
            for i in range(0, len(b), 4096)
        }

    fshared = len(fixed(data) & fixed(edited)) / len(fixed(data))
    assert fshared < 0.05


def test_chunk_blobs_and_dedup_stats(spark):
    base = _blob(60_000)
    rows = [
        ("a", bytearray(base)),
        ("b", bytearray(base[:3000] + b"xx" + base[3000:])),  # near-dup
        ("c", bytearray(_blob(30_000, seed=99))),             # unrelated
        ("d", None),
        ("e", bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    chunks = C.chunk_blobs(df)
    got = chunks.collect()
    assert {r.doc_id for r in got} == {"a", "b", "c"}  # null/empty skip
    # per-doc reassembly: offsets/lengths tile the blob
    for doc, blob in (("a", base), ("c", bytes(rows[2][1]))):
        spans = sorted(
            ((r.offset, r.length) for r in got if r.doc_id == doc)
        )
        assert spans[0][0] == 0
        assert sum(ln for _, ln in spans) == len(blob)
    stats = C.chunk_dedup_stats(chunks).first()
    assert stats.total_chunks == len(got)
    assert stats.distinct_chunks < stats.total_chunks  # a/b share
    assert stats.dedup_ratio > 0.3  # most of b's bytes already stored
    # kernel is Arrow-batched, not per-row Python UDF
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
