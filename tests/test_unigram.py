"""Unigram-LM tokenizer (SentencePiece-style): E-step expectations
pinned against brute-force segmentation enumeration, Viterbi encode,
end-to-end training."""

from __future__ import annotations

import math

import pytest

from machine_readability_checker_spark.operators import unigram as U


def _brute_expectations(word, freq, logp):
    """Independent oracle: enumerate ALL 2^(n-1) segmentations, weight
    by probability, count pieces — no lattice math shared with the
    implementation."""
    n = len(word)
    segs = []
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if all(p in logp for p in pieces):
            segs.append((pieces, math.exp(sum(logp[p] for p in pieces))))
    z = sum(p for _, p in segs)
    out = {}
    for pieces, p in segs:
        for piece in pieces:
            out[piece] = out.get(piece, 0.0) + freq * p / z
    return out


MODEL = {
    "a": math.log(0.2), "b": math.log(0.1), "ab": math.log(0.25),
    "ba": math.log(0.15), "aba": math.log(0.2), "bb": math.log(0.1),
}


@pytest.mark.parametrize("word,freq", [("abab", 3), ("ababa", 2), ("bb", 5)])
def test_estep_matches_brute_force(word, freq):
    got = {}
    for p, e in U._expectations(word, freq, MODEL, max_len=8):
        got[p] = got.get(p, 0.0) + e  # one entry per lattice span
    want = _brute_expectations(word, freq, MODEL)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9), p


def test_estep_distributed_equals_local(spark):
    rows = [("abab", 3), ("ababa", 2), ("bb", 5), ("ab", 7)]
    words = spark.createDataFrame(rows, "word string, freq long")
    dist = {
        r["piece"]: r["expected"]
        for r in U.expected_counts(words, MODEL, 8).collect()
    }
    want = {}
    for w, f in rows:
        for p, e in _brute_expectations(w, f, MODEL).items():
            want[p] = want.get(p, 0.0) + e
    assert set(dist) == set(want)
    for p in want:
        assert dist[p] == pytest.approx(want[p], rel=1e-9), p


VITERBI_MODEL = dict(
    {c: -8.0 for c in "abcdefghijklmnopqrstuvwxyz"},
    **{"un": -2.0, "related": -3.0, "data": -4.0},
)


def test_viterbi_segmentation():
    assert U.viterbi_segment("unrelated", VITERBI_MODEL) == ["un", "related"]
    assert U.viterbi_segment("datadata", VITERBI_MODEL) == ["data", "data"]
    assert U.viterbi_segment("xyz", VITERBI_MODEL) == ["x", "y", "z"]  # OOV
    assert U.viterbi_segment("", VITERBI_MODEL) == []


def test_encode_kernel(spark):
    df = spark.createDataFrame(
        [(0, "unrelated data"), (1, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["pieces"]
        for r in U.unigram_encode(df, VITERBI_MODEL).collect()
    }
    assert out[0] == ["un", "related", "data"]
    assert out[1] == []


def test_train_end_to_end(spark):
    corpus = spark.createDataFrame(
        [(i, "spark engine spark engine spark rows") for i in range(30)]
        + [(100 + i, "miscellaneous words appear here too") for i in range(3)],
        "doc_id long, text string",
    )
    model = U.unigram_train(
        corpus, vocab_size=40, em_iters=3, max_piece_len=6
    )
    # every single character of the corpus survives training
    chars = {c for c in "sparkenginerowsmiscellaneouswordsappearheretoo"}
    assert chars <= {p for p in model if len(p) == 1}
    assert len(model) <= 40 + len([p for p in model if len(p) == 1])
    # probabilities normalize
    assert sum(math.exp(lp) for lp in model.values()) == pytest.approx(1.0)
    # the dominant word is a single piece under the learned model
    assert U.viterbi_segment("spark", model, 6) == ["spark"]
