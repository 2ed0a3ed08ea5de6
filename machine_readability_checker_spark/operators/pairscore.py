"""CLIP-style (caption, media) pair scoring and filtering.

LAION / DataComp pipelines gate mined (image, caption) candidates on
the cosine similarity of their embeddings under a JOINT text–image
model (CLIP): a pair whose caption does not describe its image scores
low and is dropped before training.  This module is that machinery,
Spark-first:

- embedding attachment is a plain join (``attach_vectors``) —
  broadcast when one side is small, shuffle-hash on the ref key
  otherwise; the pair table itself is touched once;
- the score is the shared JVM ``zip_with``/``aggregate`` cosine kernel
  (``operators.similarity.cosine_sim``) — zero Python per pair;
- the gate (``filter_pairs``) is a narrow filter.

At 100 TB the plan is: one pass over the pairs, two hash joins against
model-output embedding tables, no per-row Python, no driver traffic.

NO CLIP weights ship in (or can run in) this container, so the default
embedders are DETERMINISTIC STAND-INS exposing the real interface:

- ``hashed_text_vectors`` — hashing-trick bag-of-tokens (Weinberger et
  al. 2009 feature hashing; the fastText input layer).  A real,
  scale-correct text vectorizer — but NOT a semantic joint space.
- ``stub_media_vectors`` — a seeded digest expansion of the media
  bytes.  Explicitly NOT a vision tower; it exists so the job surface
  (jobs/media.py --min-pair-score) runs end to end with the exact
  production plumbing.

Swap either for a real model's output (a ``(ref, vector)`` table, or
an embedder callable with the same signature) and nothing downstream
changes.  Reference parity note: no analog in the reference repo
(single-table audits); this is the training-pipeline extension family.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .similarity import cosine_sim


def attach_vectors(
    pairs: DataFrame,
    emb: DataFrame,
    key_col: str,
    emb_key_col: str,
    vec_col: str = "embedding",
    out_col: str = "vec",
    broadcast: bool = True,
) -> DataFrame:
    """Join an embedding table's vector onto the pair table.

    ``broadcast=True`` is right when the embedding table is dimension
    ×-rows small relative to the pairs (query batches, per-shard model
    caches); at full corpus scale leave it False and let the join
    shuffle on the ref key — the pairs side is hashed once and AQE
    picks the strategy."""
    e = emb.select(
        F.col(emb_key_col).alias(key_col),
        F.col(vec_col).cast("array<double>").alias(out_col),
    )
    if broadcast:
        e = F.broadcast(e)
    return pairs.join(e, key_col)


def pair_score(text_vec: Column, media_vec: Column) -> Column:
    """Cosine of the two towers' vectors — the CLIP-score analog.
    NULL (dropped by any threshold) for zero/empty vectors."""
    return cosine_sim(text_vec, media_vec)


def score_pairs(
    pairs: DataFrame,
    text_vec_col: str = "text_vec",
    media_vec_col: str = "media_vec",
    out_col: str = "pair_score",
) -> DataFrame:
    """Attach the pair score as one narrow JVM expression."""
    return pairs.withColumn(
        out_col, pair_score(F.col(text_vec_col), F.col(media_vec_col))
    )


def filter_pairs(
    scored: DataFrame,
    min_score: float,
    score_col: str = "pair_score",
) -> DataFrame:
    """Keep pairs at or above the threshold (NULL scores drop — a
    zero-vector tower output is an unusable pair, not a keeper)."""
    return scored.filter(F.col(score_col) >= F.lit(float(min_score)))


# --------------------------------------------------- stand-in embedders


def _hash_bucket(token: str, dim: int) -> tuple:
    """(bucket, sign) for one token — md5-based so the embedding is
    identical across processes, platforms and Python hash seeds."""
    import hashlib

    h = hashlib.md5(token.encode("utf-8")).digest()
    bucket = int.from_bytes(h[:8], "big") % dim
    sign = 1.0 if h[8] & 1 else -1.0
    return bucket, sign


def hashed_text_vectors(
    df: DataFrame,
    text_col: str = "caption",
    dim: int = 64,
    out_col: str = "text_vec",
) -> DataFrame:
    """Feature-hashing bag-of-tokens text vectors (Weinberger et al.
    2009): each whitespace token adds ±1 to its md5 bucket; the result
    is L2-normalized.  One Arrow-batched kernel, O(tokens) per row —
    the deterministic stand-in for a text tower (see module note)."""

    def kernel(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = []
            for text in s:
                vec = [0.0] * dim
                for tok in (text or "").split():
                    b, sign = _hash_bucket(tok, dim)
                    vec[b] += sign
                n = math.sqrt(sum(x * x for x in vec))
                out.append([x / n for x in vec] if n > 0 else vec)
            yield pd.Series(out)

    k = F.pandas_udf(kernel, "array<double>")
    return df.withColumn(out_col, k(F.col(text_col)))


def stub_media_vectors(
    df: DataFrame,
    bytes_col: str = "content",
    dim: int = 64,
    out_col: str = "media_vec",
) -> DataFrame:
    """STUB media tower: expands the sha256 of the media bytes into a
    deterministic unit vector (digest bytes → centered floats).  This
    is NOT a semantic embedding — identical bytes map to identical
    vectors and nothing else is promised.  It exists so the pair-score
    job surface exercises the full production plumbing (attach → score
    → gate → export) without model weights; swap in a real vision
    tower's output table via ``attach_vectors`` for production."""

    def kernel(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import hashlib

        for s in batches:
            out = []
            for blob in s:
                raw = bytes(blob) if blob is not None else b""
                buf = b""
                seed = hashlib.sha256(raw).digest()
                while len(buf) < dim:
                    buf += seed
                    seed = hashlib.sha256(seed).digest()
                vec = [(b - 127.5) / 127.5 for b in buf[:dim]]
                n = math.sqrt(sum(x * x for x in vec))
                out.append([x / n for x in vec] if n > 0 else vec)
            yield pd.Series(out)

    k = F.pandas_udf(kernel, "array<double>")
    return df.withColumn(out_col, k(F.col(bytes_col)))
