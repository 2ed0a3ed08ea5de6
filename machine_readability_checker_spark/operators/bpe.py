"""Distributed BPE tokenizer training (Sennrich-style byte-pair merges).

The classic training-data-pipeline step Spark is actually good at: the
corpus collapses to a DISTINCT-WORD frequency table in one shuffle
(billions of docs → millions of words), and every merge iteration is
one hash aggregate over that table — count adjacent symbol pairs
weighted by word frequency, take the most frequent pair, fold it into
the symbol arrays JVM-side.  No Python on executors during training;
the driver sees exactly one (pair, count) row per iteration.

Simplifications vs production tokenizers (documented, deliberate):
plain whitespace pre-tokenization (``textstats.tokens``) and no
end-of-word marker — the merge algebra is identical, so the
distributed-vs-sequential equivalence the tests pin carries over.

``bpe_encode`` applies the learned merge list with an Arrow-batched
``mapInPandas`` kernel (merges are a broadcast-closure list; applying
K ordered merges per token is loop-heavy — the measured Pandas-UDF
case, not a per-row Python UDF).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import tokens


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the one corpus-wide shuffle of training."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(col: Column) -> Column:
    # split on the empty pattern yields single characters in Spark
    return F.filter(F.split(col, ""), lambda x: x != "")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency — one hash
    aggregate with map-side partials (the per-iteration job)."""
    n = F.size(F.col("syms"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("syms"), i), F.element_at(F.col("syms"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("count"))
    )


def _merge_fold(a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into one symbol —
    a single JVM aggregate fold; a freshly merged symbol never re-merges
    within the same pass (its label differs), matching sequential BPE."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` ordered merges.  Each iteration runs ONE
    aggregate job over the distinct-word table and ships one row to the
    driver; the symbol column is localCheckpoint'd every
    ``checkpoint_every`` merges so the fold-expression chain (and its
    codegen) stays bounded.  Ties break lexicographically for
    determinism.  Stops early when no pair occurs twice."""
    words = word_freqs(df, text_col).withColumn(
        "syms", _chars(F.col("word"))
    ).select("syms", "freq")
    merges: List[Tuple[str, str]] = []
    for it in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["count"] < 2:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        words = words.withColumn("syms", _merge_fold(a, b))
        if (it + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return merges


def bpe_pair_counts(
    df: DataFrame, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """First-iteration pair statistics (the SQL-expressible slice of
    training, used by the driver lane): adjacent CHARACTER pairs of the
    corpus's words, frequency-weighted, top ``top_k``."""
    words = word_freqs(df, text_col).withColumn("syms", _chars(F.col("word")))
    return (
        _pair_counts(words)
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(top_k)
    )


def apply_merges(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Sequential reference encoder (also the kernel body): apply the
    ordered merge list to one word, greedy left-to-right per merge."""
    syms = list(word)
    for a, b in merges:
        out: List[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with the learned merges: Arrow-batched
    ``mapInPandas`` (K ordered merges per token is loop-heavy Python —
    the vectorized-batch case), returning (id, subwords array, n_subwords).
    The merge list rides the task closure (KBs — broadcast by
    construction)."""
    import pandas as pd

    schema = f"{id_col} string, subwords array<string>, n_subwords int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def encode(text: str) -> List[str]:
            out: List[str] = []
            for w in text.split():
                hit = cache.get(w)
                if hit is None:
                    hit = apply_merges(w, merges)
                    if len(cache) < 100_000:
                        cache[w] = hit
                out.extend(hit)
            return out

        for batch in batches:
            subs = [encode(t or "") for t in batch[text_col]]
            yield pd.DataFrame(
                {
                    id_col: [str(x) for x in batch[id_col]],
                    "subwords": subs,
                    "n_subwords": [len(s) for s in subs],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def bpe_vocab(
    merges: List[Tuple[str, str]], alphabet: List[str]
) -> dict:
    """Token → id in the standard BPE layout: the (sorted) base
    alphabet first, then each merged symbol in merge order (duplicates
    keep their first id).  With ``alphabet`` = every character seen in
    training, this vocabulary covers every token ``apply_merges`` can
    emit."""
    vocab: dict = {}
    for ch in sorted(set(alphabet)):
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def write_bpe_artifacts(
    path: str, merges: List[Tuple[str, str]], alphabet: List[str]
) -> dict:
    """Persist the tokenizer in the conventional interchange shape:
    ``merges.txt`` (``#version`` header, one space-separated pair per
    line, in merge order — the format the common tokenizer libraries
    read) and ``vocab.json`` (token → id).  Both writes are atomic
    (temp + rename).  Returns the vocab."""
    import json
    import os
    import tempfile

    os.makedirs(path, exist_ok=True)
    vocab = bpe_vocab(merges, alphabet)

    def _atomic(name: str, data: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=path)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, name))

    _atomic(
        "merges.txt",
        "#version: 0.2\n"
        + "".join(f"{a} {b}\n" for a, b in merges),
    )
    _atomic(
        "vocab.json",
        json.dumps(vocab, ensure_ascii=False, sort_keys=False),
    )
    return vocab


def read_bpe_artifacts(path: str) -> Tuple[List[Tuple[str, str]], dict]:
    """Load ``merges.txt`` + ``vocab.json`` back; the merge list feeds
    ``bpe_encode``/``apply_merges`` unchanged."""
    import json
    import os

    merges: List[Tuple[str, str]] = []
    with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, sep, b = line.partition(" ")
            if sep:
                merges.append((a, b))
    with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    return merges, vocab
