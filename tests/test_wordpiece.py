"""WordPiece: distributed trainer vs a sequential reference, merge
label semantics, greedy longest-match encoding, artifact round-trip."""

from __future__ import annotations

from typing import Dict, List, Tuple

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import wordpiece as WP


def _seq_train(
    freqs: Dict[str, int], n_merges: int, min_pair_count: int = 2
) -> List[Tuple[str, str]]:
    """Independent sequential WordPiece trainer: same objective
    (count(ab)/(count(a)count(b))), same tie rule (lexicographically
    smallest "a b"), same stop rule."""
    words = {
        w: ([w[0]] + ["##" + c for c in w[1:]], f) for w, f in freqs.items()
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict = {}
        sc: dict = {}
        for syms, f in words.values():
            for s in syms:
                sc[s] = sc.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        pc = {k: v for k, v in pc.items() if v >= min_pair_count}
        if not pc:
            break
        best = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (sc[kv[0][0]] * sc[kv[0][1]])),
                f"{kv[0][0]} {kv[0][1]}",
            ),
        )[0]
        a, b = best
        merges.append((a, b))
        lab = WP.merge_label(a, b)
        for w, (syms, f) in words.items():
            out: List[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = lab
                else:
                    out.append(s)
            words[w] = (out, f)
    return merges


_CORPUS = (
    ["hugging hugging hugging face face"] * 3
    + ["hug hug hugs bug bugs"] * 2
    + ["learn learners learning"] * 2
    + ["un unaffable unaffected"]
)


def _docs(spark):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(_CORPUS)], "doc_id string, text string"
    )


def test_wordpiece_train_matches_sequential(spark):
    freqs: dict = {}
    for line in _CORPUS:
        for w in line.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _seq_train(freqs, 30)
    got = WP.wordpiece_train(_docs(spark), n_merges=30)
    assert got == want
    assert len(got) > 10  # the fixture genuinely trains


def test_merge_label_continuation_rules():
    assert WP.merge_label("a", "##b") == "ab"
    assert WP.merge_label("##b", "##c") == "##bc"
    assert WP.merge_label("ab", "##cd") == "abcd"


def test_scored_pairs_objective(spark):
    # one doc: "ab ab cd" → pairs (a,##b)×2, (c,##d)×1;
    # counts: a=2, ##b=2, c=1, ##d=1 → scores 2/4=0.5 and 1/1=1.0:
    # WordPiece prefers the RARE exclusive pair, unlike BPE
    docs = spark.createDataFrame(
        [("0", "ab ab cd")], "doc_id string, text string"
    )
    words = (
        WP.word_freqs(docs)
        .withColumn("syms", WP._init_syms(F.col("word")))
        .select("syms", "freq")
    )
    rows = {r["pair"]: (r["count"], r.score)
            for r in WP.scored_pairs(words).collect()}
    assert rows["a ##b"] == (2, pytest.approx(0.5))
    assert rows["c ##d"] == (1, pytest.approx(1.0))


def test_encode_word_greedy_longest_match():
    vocab = WP.wordpiece_vocab(
        [("a", "##b"), ("ab", "##c")], ["a", "##b", "##c", "x"]
    )
    assert WP.encode_word("abc", vocab) == ["abc"]
    assert WP.encode_word("ab", vocab) == ["ab"]
    assert WP.encode_word("axb", vocab) == ["[UNK]"]  # ##x not in vocab
    assert WP.encode_word("", vocab) == []
    assert WP.encode_word("a" * 200, vocab) == ["[UNK]"]  # length guard
    # greedy prefers the LONGEST prefix even when shorter paths exist
    assert WP.encode_word("abb", vocab) == ["ab", "##b"]


def test_wordpiece_encode_spark_matches_reference(spark):
    merges = WP.wordpiece_train(_docs(spark), n_merges=20)
    alphabet = sorted(
        {
            s
            for line in _CORPUS
            for w in line.split()
            for s in [w[0]] + ["##" + c for c in w[1:]]
        }
    )
    vocab = WP.wordpiece_vocab(merges, alphabet)
    got = {
        r.doc_id: r.subwords
        for r in WP.wordpiece_encode(_docs(spark), vocab).collect()
    }
    for i, line in enumerate(_CORPUS):
        want: List[str] = []
        for w in line.split():
            want.extend(WP.encode_word(w, vocab))
        assert got[str(i)] == want
        assert "[UNK]" not in got[str(i)]  # alphabet covers training text


def test_artifact_roundtrip(tmp_path):
    vocab = WP.wordpiece_vocab(
        [("h", "##u"), ("hu", "##g")], ["h", "##u", "##g", "f"]
    )
    WP.write_wordpiece_artifacts(str(tmp_path), vocab)
    back = WP.read_wordpiece_artifacts(str(tmp_path))
    assert back == vocab
    assert back["[UNK]"] == 0
