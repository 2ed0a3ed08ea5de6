"""CLIP-style pair scoring: stand-in towers, JVM cosine, gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import pairscore as PS


def test_hashed_text_vectors_unit_norm_and_determinism(spark):
    rows = [(0, "the cat sat"), (1, "the cat sat"), (2, "dog"), (3, "")]
    df = spark.createDataFrame(rows, "pair_id long, caption string")
    out = {
        r.pair_id: r.text_vec
        for r in PS.hashed_text_vectors(df, dim=16).collect()
    }
    # identical captions embed identically, regardless of partitioning
    assert out[0] == out[1]
    for pid in (0, 2):
        assert math.isclose(
            sum(x * x for x in out[pid]), 1.0, rel_tol=1e-9
        )
    # one token → exactly one ±1 bucket
    nz = [x for x in out[2] if x != 0.0]
    assert len(nz) == 1 and abs(nz[0]) == 1.0
    # empty caption → zero vector (NULL score downstream, gated out)
    assert all(x == 0.0 for x in out[3])
    repart = {
        r.pair_id: r.text_vec
        for r in PS.hashed_text_vectors(df.repartition(5), dim=16).collect()
    }
    assert repart == out


def test_hashed_text_vectors_order_invariant_counts(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "a a b"), (2, "a b")],
        "pair_id long, caption string",
    )
    out = {
        r.pair_id: r.text_vec
        for r in PS.hashed_text_vectors(df, dim=8).collect()
    }
    # bag-of-tokens: order never matters, multiplicity does
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_stub_media_vectors_deterministic(spark):
    rows = [
        (0, bytearray(b"payload-A")),
        (1, bytearray(b"payload-A")),
        (2, bytearray(b"payload-B")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "pair_id long, content binary")
    out = {
        r.pair_id: r.media_vec
        for r in PS.stub_media_vectors(df, dim=32).collect()
    }
    assert out[0] == out[1]
    assert out[0] != out[2]
    for pid in (0, 2, 3):
        assert math.isclose(
            sum(x * x for x in out[pid]), 1.0, rel_tol=1e-9
        )


def test_score_and_gate_semantics(spark):
    rows = [
        (0, [1.0, 0.0], [1.0, 0.0]),   # perfect match → 1.0
        (1, [1.0, 0.0], [0.0, 1.0]),   # orthogonal → 0.0
        (2, [1.0, 0.0], [-1.0, 0.0]),  # opposite → -1.0
        (3, [1.0, 1.0], [1.0, 0.0]),   # cos 45° ≈ 0.7071
        (4, [0.0, 0.0], [1.0, 0.0]),   # zero tower → NULL → gated out
    ]
    df = spark.createDataFrame(
        rows,
        "pair_id long, text_vec array<double>, media_vec array<double>",
    )
    scored = PS.score_pairs(df)
    got = {r.pair_id: r.pair_score for r in scored.collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(-1.0)
    assert got[3] == pytest.approx(math.sqrt(0.5))
    assert got[4] is None
    kept = sorted(
        r.pair_id for r in PS.filter_pairs(scored, 0.5).collect()
    )
    assert kept == [0, 3]


def test_attach_vectors_both_join_paths(spark):
    pairs = spark.createDataFrame(
        [(0, 10, 20), (1, 11, 21)],
        "pair_id long, text_id long, media_id long",
    )
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]),
         (20, [1.0, 0.0]), (21, [0.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    a = PS.attach_vectors(pairs, emb, "text_id", "vec_id",
                          out_col="text_vec")
    b = PS.attach_vectors(a, emb, "media_id", "vec_id",
                          out_col="media_vec", broadcast=False)
    got = {
        r.pair_id: r.pair_score
        for r in PS.score_pairs(b).collect()
    }
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(-1.0)


def test_end_to_end_standin_towers_gate(spark):
    """The job-surface composition: mined pairs → stand-in towers →
    score → gate.  Identical (caption, bytes) pairs share one score;
    the gate keeps a deterministic subset."""
    rows = [
        (0, "red logo banner", bytearray(b"img-0")),
        (1, "red logo banner", bytearray(b"img-0")),
        (2, "unrelated caption text", bytearray(b"img-1")),
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id long, caption string, content binary"
    )
    scored = PS.score_pairs(
        PS.stub_media_vectors(PS.hashed_text_vectors(pairs))
    )
    got = {r.pair_id: r.pair_score for r in scored.collect()}
    assert got[0] == pytest.approx(got[1])
    assert all(v is not None and -1.0 <= v <= 1.0 for v in got.values())
    thr = got[0]
    kept = sorted(
        r.pair_id for r in PS.filter_pairs(scored, thr).collect()
    )
    assert set(kept) >= {0, 1}
