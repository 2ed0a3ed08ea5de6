"""BM25 ranked retrieval over the documents corpus — the lexical twin
of the ANN family (`operators/similarity.py`): Okapi BM25 (Robertson &
Walker) with Lucene's +1-smoothed idf, so scores are always positive:

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d)  = Σ_{t ∈ q} idf(t) · tf · (k1 + 1)
                   / (tf + k1 · (1 − b + b · dl / avgdl))

Scale design:

- **Index build** is one explode + two hash aggregates: postings
  ``(term, doc_id, tf, dl)`` and document frequency ``(term, df)``;
  corpus stats (N, avgdl) are two scalars.  Nothing collects.
- **Materialized index** partitions postings by ``term_bucket =
  hash(term) % n_buckets`` — a query's terms map to a handful of
  buckets, so the scan is partition-pruned exactly like the MinHash
  band index (`dedup.write_minhash_index`).
- **Single query** resolves as: bucket-pruned postings scan → term IN
  filter → per-doc score sum → ``TakeOrderedAndProject`` top-k.  No
  full-corpus pass, no collect beyond k rows.
- **Batch queries** join a (query_id, term) frame against postings on
  (bucket, term): ONE shuffle each side, then per-query window top-k —
  the corpus-side exchange amortizes over the whole batch.

Tokenization reuses the LM lane's normalizer (lowercase, explicit
whitespace class) so the DuckDB oracle mirrors it bit-for-bit.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .ngram_lm import _norm_tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_BUCKETS = 64


def tokenize_query(q: str) -> List[str]:
    """Driver-side twin of ``_norm_tokens`` for query strings."""
    return [t for t in " ".join(q.lower().split()).split(" ") if t]


def bm25_build(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ postings ``(term, doc_id, tf, dl)``.  One explode + one
    aggregate; ``dl`` rides along via a window-free groupBy (tf per
    (doc, term) and dl = sum of tfs per doc, recovered with a second
    windowless aggregate join — see below).

    Implementation note: dl is attached by aggregating tf per doc and
    joining back; both aggregates hash-partition on doc_id so the join
    is co-partitioned (no third shuffle under AQE)."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_norm_tokens(F.col(text_col))).alias("term"),
        )
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")


def bm25_stats(postings: DataFrame) -> DataFrame:
    """→ one row (n_docs, avgdl) — the corpus scalars."""
    return postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def write_bm25_index(
    postings: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Materialize the postings partitioned by term hash bucket: a
    query's terms prune to ≤ |terms| buckets (PartitionFilters, like
    the MinHash band index).

    The corpus scalars (n_docs, avgdl) are materialized alongside under
    ``{path}/_stats`` — an underscore-prefixed directory, so the
    postings reader's file index skips it.  Without this every query
    re-aggregates the FULL postings table just to learn avgdl; with it
    a query touches only its pruned buckets plus one tiny file."""
    (
        postings.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(n_buckets))
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )
    bm25_stats(postings).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_stats"
    )
    # per-term document frequencies, bucket-partitioned like the
    # postings: batch retrieval joins its query terms against THIS
    # instead of re-aggregating the full postings table every batch
    (
        postings.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(n_buckets))
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/_df")
    )


def read_bm25_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_bm25_stats(spark: SparkSession, path: str) -> DataFrame:
    """The materialized (n_docs, avgdl) row written by
    ``write_bm25_index`` — pass it to ``bm25_topk``/``bm25_topk_batch``
    as ``stats`` so queries never re-scan the corpus."""
    return spark.read.parquet(f"{path}/_stats")


def read_bm25_df(spark: SparkSession, path: str) -> DataFrame:
    """The materialized per-term document frequencies — pass to
    ``bm25_topk_batch`` as ``df_table``; its term_bucket partitioning
    prunes the read to the batch's own terms."""
    return spark.read.parquet(f"{path}/_df")


def _score_col(k1: float, b: float) -> F.Column:
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return idf * tf_norm


def bm25_topk(
    postings: DataFrame,
    query: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    n_buckets: Optional[int] = None,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-k documents for one query string →
    ``(doc_id, score, n_terms_hit)``, ties broken by doc_id.

    When the postings frame carries a ``term_bucket`` column (a
    materialized index), the scan is first pruned to the query terms'
    buckets — pass ``n_buckets`` matching the index.  Pass ``stats``
    (``read_bm25_stats``) to skip the full-corpus (n_docs, avgdl)
    aggregate — with both, a query's cost is bounded by its buckets."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("bm25: empty query")
    scoped = postings
    if n_buckets is not None and "term_bucket" in postings.columns:
        buckets = sorted({hash_bucket(t, n_buckets) for t in terms})
        scoped = scoped.filter(F.col("term_bucket").isin(buckets))
    hits = scoped.filter(F.col("term").isin(terms))

    # df per query term over the full postings (df is a property of the
    # corpus, not of the pruned scan — compute it from the hits, which
    # contain every posting of every query term)
    df_tbl = hits.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    if stats is None:
        stats = bm25_stats(postings)
    scored = (
        hits.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", _score_col(k1, b))
        .groupBy("doc_id")
        .agg(
            F.sum("_s").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
    return scored


def hash_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``pmod(hash(term), n_buckets)`` — Spark's
    Murmur3 string hash, reimplemented so query planning never needs a
    JVM round-trip."""
    import struct

    data = term.encode("utf-8")
    length = len(data)
    seed = 42
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    rounds = length // 4
    for i in range(rounds):
        (kk,) = struct.unpack_from("<i", data, i * 4)
        kk = (kk * c1) & 0xFFFFFFFF
        kk = ((kk << 15) | (kk >> 17)) & 0xFFFFFFFF
        kk = (kk * c2) & 0xFFFFFFFF
        h ^= kk
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    # Spark (Murmur3_x86_32.hashUnsafeBytes): tail bytes are hashed
    # one-per-round as signed ints, not accumulated into one word
    for i in range(rounds * 4, length):
        byte = struct.unpack_from("b", data, i)[0]
        kk = (byte * c1) & 0xFFFFFFFF
        kk = ((kk << 15) | (kk >> 17)) & 0xFFFFFFFF
        kk = (kk * c2) & 0xFFFFFFFF
        h ^= kk
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    # back to signed, then pmod
    if h >= 1 << 31:
        h -= 1 << 32
    return h % n_buckets


def bm25_topk_batch(
    postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    stats: Optional[DataFrame] = None,
    df_table: Optional[DataFrame] = None,
) -> DataFrame:
    """Batch retrieval: (query_id, query) frame → per-query top-k
    ``(query_id, rank, doc_id, score)``.  One postings-side shuffle on
    term, one window top-k per query — the batch twin of
    ``bm25_topk``, exact per-query equality pinned by tests.  Pass the
    materialized ``stats`` row (skips the corpus-wide avgdl scan) and
    ``df_table`` (``read_bm25_df`` — skips the corpus-wide df
    aggregate); with both, a batch touches only its own terms."""
    q_terms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_norm_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()
    if df_table is None:
        df_tbl = postings.groupBy("term").agg(
            F.count_distinct("doc_id").alias("df")
        )
    else:
        df_tbl = df_table.select("term", "df")
    if stats is None:
        stats = bm25_stats(postings)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("doc_id")
    )
    return (
        q_terms.join(postings, "term")
        .join(df_tbl, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", _score_col(k1, b))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_s").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
