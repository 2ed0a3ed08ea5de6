"""Hybrid-retrieval rank fusion (Reciprocal Rank Fusion).

Production retrieval over a training corpus is hybrid: a lexical
ranker (BM25 postings, ``operators.bm25``) and a dense ranker (cosine
over embeddings, ``operators.similarity``) each return a top-k list,
and the lists are FUSED rather than the scores compared — BM25 scores
and cosines live on incomparable scales.  Reciprocal Rank Fusion
(Cormack, Clarke & Büttcher, SIGIR 2009) is the standard scale-free
fusion:

    rrf(d) = Σ_systems 1 / (k + rank_system(d))

with k ≈ 60 damping the head.  RRF needs only ranks, never scores, so
any mix of systems fuses without calibration.

Scale shape: each input list is already top-k-bounded (systems × k
rows per query — index-query-result-sized, not corpus-sized), so the
union + per-id aggregate + rank window all run over bounded candidate
sets.  With ``query_col`` the window partitions per query and the
whole fusion is one narrow pass over the concatenated result tables;
without it (single query) the global window sees ≤ Σ k_i rows.

Reference parity note: no analog in the reference repo; this is the
training-pipeline extension family (retrieval over the corpus).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    ranked: Sequence[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    query_col: Optional[str] = None,
    top_k: Optional[int] = None,
) -> DataFrame:
    """Fuse ranked lists: each input carries (``id_col``,
    ``rank_col``[, ``query_col``]) with rank starting at 1.  Returns
    (``id_col``, rrf_score, n_systems, rank) — rank re-derived from the
    fused score with a deterministic id tie-break — optionally cut to
    ``top_k`` rows (per query when ``query_col`` is given)."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [
        df.select(*keys, F.col(rank_col).cast("long").alias("_r"))
        for df in ranked
    ]
    u = reduce(DataFrame.unionAll, parts)
    fused = u.groupBy(*keys).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_r"))).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = (
        Window.partitionBy(query_col) if query_col else Window.partitionBy()
    ).orderBy(F.desc("rrf_score"), F.col(id_col))
    out = fused.withColumn("rank", F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out.orderBy(*keys[:-1], "rank")


def ranked_from_ordered(
    df: DataFrame,
    order_cols: Sequence,
    id_col: str = "doc_id",
    query_col: Optional[str] = None,
) -> DataFrame:
    """Attach a 1-based ``rank`` to a result table ordered by
    ``order_cols`` (e.g. ``[F.desc("score"), "doc_id"]``) — the
    adapter from a scorer's output to ``rrf_fuse`` input.  The window
    runs over an already top-k-bounded result set."""
    w = (
        Window.partitionBy(query_col) if query_col else Window.partitionBy()
    ).orderBy(*order_cols)
    return df.withColumn("rank", F.row_number().over(w).cast("int"))
