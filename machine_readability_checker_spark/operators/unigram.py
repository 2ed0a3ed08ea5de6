"""Distributed unigram-LM tokenizer (SentencePiece-style, Kudo 2018).

The second production tokenizer family next to BPE (``operators/
bpe.py``), trained the way Spark is good at: the corpus collapses to
the DISTINCT-WORD frequency table in one shuffle, and every EM
iteration is one Arrow-batched pass over that table — the
forward-backward lattice per word computes expected piece counts under
the current piece probabilities (broadcast as a plain dict), one hash
aggregate sums them, and the driver renormalizes.  The driver
round-trip is VOCAB-sized (thousands of rows), corpus-independent —
the corpus itself is touched exactly once.

Simplifications vs the SentencePiece binary (documented, deliberate):
whitespace pre-tokenization (shared with BPE), seed vocabulary = the
most frequent substrings rather than the ESA suffix-array enumeration,
and pruning keeps the highest-expected-count pieces per round instead
of the exact likelihood-loss ranking.  The EM math itself (Kudo 2018
§3.2: forward-backward expectations, renormalize, prune toward the
target size) is the published algorithm, and the tests pin the
distributed E-step exactly equal to a sequential reference
implementation.

``unigram_encode`` is Viterbi segmentation under the learned log
probabilities — an Arrow-batched kernel with the model as a broadcast
closure, mirroring ``bpe_encode``.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List

from pyspark.sql import DataFrame, functions as F, types as T

from .bpe import word_freqs

#: score assigned to an out-of-vocabulary single character during
#: Viterbi (SentencePiece's unk surrogate) — bad enough to never beat
#: a real piece, finite so segmentation always succeeds.
UNK_LOGP = -30.0


# ----------------------------------------------------------- seeding


def seed_pieces(
    words: DataFrame, max_piece_len: int = 8, n_seed: int = 4000
) -> DataFrame:
    """(word, freq) → (piece, count) seed vocabulary: every substring
    of length ≤ ``max_piece_len``, weighted by word frequency; all
    single characters survive unconditionally, plus the ``n_seed``
    heaviest multi-character pieces.  Pure JVM: one nested-transform
    explode + one aggregate + a top-k."""
    n = F.length(F.col("word"))
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    i,
                    F.least(n, i + F.lit(int(max_piece_len)) - 1),
                ),
                lambda j: F.substring(
                    F.col("word"), i.cast("int"), (j - i + 1).cast("int")
                ),
            ),
        )
    )
    counts = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("count"), "piece")
        .limit(int(n_seed))
    )
    return chars.unionByName(multi)


# ----------------------------------------------------- E-step lattice


def _expectations(word: str, freq: int, logp: Dict[str, float],
                  max_len: int) -> List:
    """Forward-backward expected piece counts for one word (Kudo 2018
    §3.2).  Returns [(piece, expected_count), ...]."""
    n = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    spans = []  # (j, i, piece, lp)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            spans.append((j, i, word[j:i], lp))
            v = alpha[j] + lp
            if alpha[j] != NEG:
                alpha[i] = (
                    v
                    if alpha[i] == NEG
                    else max(alpha[i], v)
                    + math.log1p(math.exp(-abs(alpha[i] - v)))
                )
    if alpha[n] == NEG:
        return []  # unsegmentable under current vocab (all-unk word)
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        for i in range(j + 1, min(n, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is None or beta[i] == NEG:
                continue
            v = beta[i] + lp
            beta[j] = (
                v
                if beta[j] == NEG
                else max(beta[j], v)
                + math.log1p(math.exp(-abs(beta[j] - v)))
            )
    z = alpha[n]
    out = []
    for j, i, piece, lp in spans:
        if alpha[j] == NEG or beta[i] == NEG:
            continue
        out.append((piece, freq * math.exp(alpha[j] + lp + beta[i] - z)))
    return out


def expected_counts(
    words: DataFrame, logp: Dict[str, float], max_piece_len: int = 8
) -> DataFrame:
    """One EM E-step over the distinct-word table: Arrow-batched
    lattice kernel (model as broadcast closure) → (piece,
    expected) via one hash aggregate with map-side partials."""
    model = dict(logp)
    max_len = int(max_piece_len)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pieces: List[str] = []
            expect: List[float] = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece, e in _expectations(
                    str(word), int(freq), model, max_len
                ):
                    pieces.append(piece)
                    expect.append(e)
            yield pd.DataFrame({"piece": pieces, "expected": expect})

    schema = T.StructType(
        [
            T.StructField("piece", T.StringType(), False),
            T.StructField("expected", T.DoubleType(), False),
        ]
    )
    return (
        words.select("word", "freq")
        .mapInPandas(kernel, schema=schema)
        .groupBy("piece")
        .agg(F.sum("expected").alias("expected"))
    )


# ------------------------------------------------------------ training


def unigram_train(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    em_iters: int = 4,
    max_piece_len: int = 8,
    seed_mult: int = 4,
    prune_frac: float = 0.75,
) -> Dict[str, float]:
    """Learn a unigram-LM piece vocabulary → {piece: logp}.

    Plan shape per EM iteration: broadcast dict → one Arrow pass over
    the distinct-word table → one aggregate → vocab-sized collect.
    Between iterations the vocabulary shrinks by keeping the
    ``prune_frac`` highest-expected multi-char pieces (single chars
    are never pruned, so every word stays segmentable) until the
    target size is reached."""
    words = word_freqs(df, text_col).persist()
    seed = seed_pieces(
        words, max_piece_len, n_seed=seed_mult * vocab_size
    ).collect()
    counts = {r["piece"]: float(r["count"]) for r in seed}
    logp = _normalize(counts)
    for _ in range(em_iters):
        got = expected_counts(words, logp, max_piece_len).collect()
        expected = {r["piece"]: float(r["expected"]) for r in got}
        # pieces with zero expectation drop out of the support
        expected = {p: e for p, e in expected.items() if e > 0}
        for ch in {p for p in logp if len(p) == 1}:
            expected.setdefault(ch, 1e-9)  # chars always survive
        target = max(
            vocab_size,
            int(len([p for p in expected if len(p) > 1]) * prune_frac)
            + len([p for p in expected if len(p) == 1]),
        )
        expected = _prune(expected, target)
        logp = _normalize(expected)
    logp = _normalize(_prune(dict(
        (p, math.exp(lp)) for p, lp in logp.items()
    ), vocab_size))
    words.unpersist()
    return logp


def _prune(counts: Dict[str, float], target: int) -> Dict[str, float]:
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(multi[: max(0, target - len(chars))])
    keep.update(chars)
    return keep


def _normalize(counts: Dict[str, float]) -> Dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}


# ------------------------------------------------------------ encoding


def viterbi_segment(
    word: str, logp: Dict[str, float], max_piece_len: int = 8
) -> List[str]:
    """Best segmentation under the model; OOV characters fall back to
    single-char pieces at ``UNK_LOGP`` so segmentation never fails."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None:
                if i - j > 1:
                    continue
                lp = UNK_LOGP
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    model: Dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """→ (id_col, pieces array<string>): Viterbi segmentation of every
    whitespace token, concatenated in document order.  Arrow-batched
    kernel, model as broadcast closure — narrow map, mirrors
    ``bpe_encode``."""
    logp = dict(model)
    max_len = int(max_piece_len)
    id_field = [
        f for f in df.schema.fields if f.name == id_col
    ][0]

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, pieces = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: List[str] = []
                for w in str(text or "").split():
                    toks.extend(viterbi_segment(w, logp, max_len))
                ids.append(did)
                pieces.append(toks)
            yield pd.DataFrame({id_col: ids, "pieces": pieces})

    schema = T.StructType(
        [
            id_field,
            T.StructField(
                "pieces", T.ArrayType(T.StringType()), False
            ),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def write_unigram_artifacts(path: str, model: Dict[str, float]) -> None:
    """Persist the piece vocabulary in the SentencePiece export shape:
    a TSV of ``piece<TAB>logp`` lines ordered by descending score (ties
    by piece), atomically written as ``unigram.vocab``.  Feeding the
    read-back dict to ``unigram_encode`` reproduces segmentations
    exactly (Viterbi depends only on the piece→logp map)."""
    import os
    import tempfile

    os.makedirs(path, exist_ok=True)
    rows = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
    fd, tmp = tempfile.mkstemp(dir=path)
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        for piece, lp in rows:
            f.write(f"{piece}\t{lp!r}\n")
    os.replace(tmp, os.path.join(path, "unigram.vocab"))


def read_unigram_artifacts(path: str) -> Dict[str, float]:
    import os

    model: Dict[str, float] = {}
    with open(
        os.path.join(path, "unigram.vocab"), encoding="utf-8"
    ) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            piece, _, lp = line.rpartition("\t")
            model[piece] = float(lp)
    return model
