"""Similarity search over embedding columns (``array<float>``).

- ``cosine_sim``          : JVM-side cosine via zip_with/aggregate
- ``brute_force_topk``    : exact top-k for a query vector (baseline)
- ``knn_join``            : exact top-k for a (small) query table via
                            broadcast crossJoin + window rank
- ``lsh_bucket_topk``     : random-hyperplane LSH variant — sign-bit
                            signatures bucket the corpus so each query
                            scans only its bucket(s); the 100 TB path
- ``embedding_near_dups`` : near-duplicate pairs by cosine ≥ threshold
                            within LSH buckets
- ``kmeans_centroids`` /
  ``write_ivf_index`` /
  ``query_ivf_index``     : true k-means IVF — distributed Lloyd fit,
                            cell-partitioned inverted lists, n_probe
                            partition-pruned queries

Hyperplanes are generated driver-side from a fixed seed and shipped as
literal arrays — deterministic, no Python on executors.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """NULL for zero/empty vectors (try_divide) instead of the ANSI
    DIVIDE_BY_ZERO task failure — one all-zeros embedding must not kill
    a corpus-scale job; threshold/rank filters then drop the NULLs."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one literal query vector.  The scan is a
    narrow map + TakeOrderedAndProject — no shuffle of the corpus."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            cosine_sim(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact k-NN of each query row: broadcast the (small) query table,
    crossJoin, rank per query.  Use ``lsh_bucket_topk`` when the query set
    or corpus makes the cross product infeasible."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    joined = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).crossJoin(F.broadcast(q))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        joined.withColumn("cosine", cosine_sim(F.col("_cv"), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def chunked_topk(
    chunks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    doc_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Chunk-level retrieval with DOCUMENT-level answers — the RAG
    corpus pattern: long documents are embedded per chunk
    (``textstats.chunk_documents`` upstream), similarity is computed
    against chunks, and each document scores as the MAX over its
    chunks (the MaxSim reduction of late-interaction retrievers,
    applied at chunk granularity) so one strongly-matching passage
    surfaces the whole document.  Returns per-query top-k documents:
    (query_id, doc_id, score, n_chunks, rank).

    Plan: queries broadcast onto the chunk scan (the bounded-batch
    contract of ``knn_join``), ONE (query, doc) aggregate with
    map-side combine, then the per-query top-k window over
    aggregate-sized input.  Swap the crossJoin stage for
    ``lsh_bucket_topk`` / IVF-PQ candidates at corpus scale — the
    max-pool and ranking are unchanged."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    scored = (
        chunks.select(
            F.col(doc_col),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", cosine_sim(F.col("_cv"), F.col("_qv")))
    )
    pooled = scored.groupBy(query_id_col, doc_col).agg(
        F.max("cosine").alias("score"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(doc_col)
    )
    return (
        pooled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, doc_col, "score", "n_chunks", "rank")
    )


def mine_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    positives: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    anchor_id_col: str = "anchor_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR /
    SimCSE / sentence-transformers recipe): for each anchor, the top-k
    most-similar corpus vectors that are neither the anchor itself nor
    one of its labeled positives — the negatives that actually move an
    InfoNCE loss, vs random negatives the model already separates.

    ``positives`` is ``(anchor_id, vec_id)`` labeled-pair rows.  Plan:
    anchors broadcast onto the corpus scan (the bounded-query-batch
    contract of ``knn_join``); self and positives are removed with a
    broadcast LEFT ANTI join BEFORE the per-anchor top-k window, so an
    anchor always receives k true negatives rather than k minus its
    positive count.  Returns (anchor_id, vec_id, cosine, rank).

    Swap the crossJoin stage for ``lsh_bucket_topk`` /
    ``query_ivfpq_index`` candidates when the anchor batch is large —
    the exclusion join and window are unchanged."""
    a = anchors.select(
        F.col(anchor_id_col),
        F.col(vec_col).cast("array<double>").alias("_av"),
    )
    joined = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
        )
        .crossJoin(F.broadcast(a))
        .filter(F.col(id_col) != F.col(anchor_id_col))
        .join(
            F.broadcast(positives.select(anchor_id_col, id_col)),
            [anchor_id_col, id_col],
            "left_anti",
        )
    )
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        joined.withColumn("cosine", cosine_sim(F.col("_cv"), F.col("_av")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(anchor_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> List[List[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_signature(vec: Column, planes: List[List[float]]) -> Column:
    """Random-hyperplane sign bits packed into a long bucket key."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(x)) for x in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    key = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        key = key.bitwiseOR(F.shiftleft(b.cast("long"), i))
    return key


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN: bucket corpus and queries by hyperplane sign
    signature; rank within matching buckets only.  At 100 TB the bucketed
    corpus is written partitioned by ``bucket`` so a query touches one
    partition (IVF-style routing); recall is tuned by n_planes and by
    probing neighbor buckets."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("bucket", lsh_signature(F.col("_cv"), planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("bucket", lsh_signature(F.col("_qv"), planes))

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        c.join(F.broadcast(q), "bucket")
        .withColumn("cosine", cosine_sim(F.col("_cv"), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "bucket", "cosine", "rank")
    )


def write_bucketed_index(
    corpus: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> None:
    """Materialize the IVF-style ANN index: the corpus written
    partitioned by hyperplane bucket (`path/bucket=K/*.parquet`).  At
    100 TB this is the index-build job; queries then read only their
    bucket partition(s) via partition pruning (see
    ``query_bucketed_index``)."""
    planes = _hyperplanes(dim, n_planes, seed)
    (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
        )
        .withColumn("bucket", lsh_signature(F.col("_cv"), planes))
        # one writer per bucket dir (not tasks × dirs small files)
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def query_bucketed_index(
    spark,
    path: str,
    query_vec: List[float],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """Top-k over a materialized bucket index: compute the query's bucket
    driver-side, read ONLY the matching partition directories (partition
    pruning — the scan must list `PartitionFilters`, not a full scan),
    rank by cosine.  ``probe_hamming`` > 0 additionally probes buckets
    within that Hamming distance of the query bucket (multi-probe recall
    knob, still pruned)."""
    import numpy as np

    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(qv, np.asarray(plane))) >= 0:
            qbucket |= 1 << i
    buckets = [
        b
        for b in range(1 << n_planes)
        if bin(b ^ qbucket).count("1") <= probe_hamming
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    return (
        df.select(
            F.col(id_col),
            "bucket",
            cosine_sim(F.col("_cv"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


# ----------------------------------------------------------- k-means IVF


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _nearest_centroid(vec: Column, centroids: List[List[float]]) -> Column:
    """Index of the nearest centroid (squared L2), ties to the lowest
    index: array_min over (dist, idx) structs compares lexicographically,
    entirely JVM-side."""
    entries = [
        F.struct(
            _sq_dist(vec, F.array(*[F.lit(float(x)) for x in c])).alias("d"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_min(F.array(*entries))["i"]


# Centroid count above which ``assign="auto"`` abandons the literal
# argmin expression for the broadcast-join path.  The literal path
# compiles one squared-distance sub-expression PER centroid; SCALE.md
# measured whole-stage codegen collapsing at ~64 such terms (the PQ
# literal encoder's m*k ceiling) — the paper-scale operating points
# (SemDeDup: 50k clusters; IVF: 4k-64k cells) are far past it.
ASSIGN_JOIN_THRESHOLD = 64


def assign_cells(
    df: DataFrame,
    centroids: List[List[float]],
    vec_col: str,
    id_col: str,
    out_col: str = "cell",
    assign: str = "auto",
    with_centroid: bool = False,
) -> DataFrame:
    """Attach each row's nearest-centroid index as ``out_col`` (and,
    with ``with_centroid``, the winning centroid vector as ``_cvec``),
    via one of two result-identical paths:

    - ``literal`` — `_nearest_centroid`'s inlined argmin.  Zero shuffle,
      but the expression tree carries O(k) distance terms and codegen
      collapses past k ≈ 64 (see ASSIGN_JOIN_THRESHOLD).
    - ``join`` — the large-k path, mirroring ``pq_encode_join``: the
      centroids ship as a k-row BROADCAST table, a BroadcastNestedLoopJoin
      inflates each row k-fold INSIDE the map stage, and a single
      min(struct(dist, cell, cvec)) aggregate with map-side partial
      aggregation picks the winner — the one exchange carries one row
      per id, never the k-fold inflation.  Expression size is O(1) in k;
      executor residency is the k x dim broadcast (50k x 768 doubles =
      ~300 MB, the FAISS coarse-quantizer residency at the SemDeDup
      paper's operating point).

    Ties break to the lowest cell index on BOTH paths: distances are the
    same `_sq_dist` expression over the same values (bit-identical
    doubles), and min(struct(d, cell, ...)) compares lexicographically
    exactly like the literal path's array_min over (d, i) structs.
    ``assign="auto"`` picks ``join`` when len(centroids) >
    ASSIGN_JOIN_THRESHOLD.  Equality of the two paths is pinned by
    tests/test_pipeline_ops.py::test_assign_cells_join_equals_literal.

    Requires ``id_col`` values to be unique (true of every caller:
    vec_id / doc_id are keys); other columns ride through F.first
    inside the same aggregate — no re-join.
    """
    k = len(centroids)
    use_join = assign == "join" or (assign == "auto" and k > ASSIGN_JOIN_THRESHOLD)
    if not use_join:
        out = df.withColumn(
            out_col, _nearest_centroid(F.col(vec_col), centroids)
        )
        if with_centroid:
            cent_arr = F.array(
                *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
            )
            out = out.withColumn(
                "_cvec", F.element_at(cent_arr, F.col(out_col) + 1)
            )
        return out
    cdf = (
        _centroid_df(df.sparkSession, centroids)
        .withColumnRenamed("cell", "_ac")
        .withColumnRenamed("cvec", "_acv")
    )
    j = df.crossJoin(F.broadcast(cdf))
    # with_centroid: cvec rides inside the min struct (only compared on
    # exact (d, cell) ties, impossible since cells are distinct) so it
    # costs no second join; without it the struct stays array-free so
    # the aggregate hash-combines map-side.
    fields = [
        _sq_dist(F.col(vec_col), F.col("_acv")).alias("d"),
        F.col("_ac").alias("c"),
    ]
    if with_centroid:
        fields.append(F.col("_acv").alias("cw"))
    best = F.min(F.struct(*fields))
    others = [c for c in df.columns if c != id_col]
    aggs = [F.first(F.col(c)).alias(c) for c in others] + [
        best["c"].alias(out_col)
    ]
    if with_centroid:
        aggs.append(best["cw"].alias("_cvec"))
    return j.groupBy(id_col).agg(*aggs)


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    assign: str = "auto",
) -> List[List[float]]:
    """Lloyd's k-means for IVF coarse quantization, distributed and
    deterministic: init = the k lowest-id vectors; each iteration ships
    the centroids as literal arrays (broadcast by construction — no
    Python on executors), assigns every vector JVM-side, and recomputes
    means with one posexplode + groupBy.  The driver round-trip per
    iteration is k x dim rows — independent of corpus size.

    (``seed`` is kept for API stability; the deterministic lowest-id
    init makes runs reproducible without RNG.)"""
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    centroids = [
        [float(x) for x in r["_v"]]
        for r in v.orderBy(id_col).limit(k).collect()
    ]
    for _ in range(iters):
        assigned = assign_cells(v, centroids, "_v", id_col, assign=assign)
        sums = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cells keep their centroid
        by_cell: dict = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cell, dims in by_cell.items():
            new[cell] = [dims[p] for p in sorted(dims)]
        if new == centroids:
            break
        centroids = new
    return centroids


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: List[List[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> None:
    """Materialize the k-means IVF index: every vector assigned to its
    nearest centroid cell, written partitioned by ``cell`` — the classic
    IVF layout (coarse quantizer + inverted lists).  At 100 TB this is
    the index-build batch job; queries read n_probe cell partitions via
    partition pruning instead of the corpus.  Assignment auto-routes
    through the broadcast-join path above ASSIGN_JOIN_THRESHOLD cells
    (``assign_cells``), so paper-scale cell counts (4k-64k) compile."""
    v = assign_cells(
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
        ),
        centroids,
        "_cv",
        id_col,
        assign=assign,
    )
    # one writer per cell dir (not tasks × dirs small files)
    v.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(path)


def query_ivf_index(
    spark,
    path: str,
    query_vec: List[float],
    centroids: List[List[float]],
    k: int = 10,
    n_probe: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over a materialized IVF index: rank the centroids against
    the query driver-side (k x dim floats — tiny), read ONLY the
    ``n_probe`` nearest cell partitions (the scan must list
    ``PartitionFilters``), rank by cosine within them."""
    qv = np.asarray(query_vec, dtype=float)
    order = sorted(
        range(len(centroids)),
        key=lambda i: float(np.sum((qv - np.asarray(centroids[i])) ** 2)),
    )
    cells = order[: max(1, n_probe)]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return (
        df.select(
            F.col(id_col),
            "cell",
            cosine_sim(F.col("_cv"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold — O(n²), the verification twin
    of ``embedding_near_dups`` (which finds a subset of these pairs via
    LSH buckets).  Use only on bounded inputs (a bucket, a sample, a
    test corpus); the LSH variant is the 100 TB path."""
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_sim(F.col("l._v"), F.col("r._v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) found within LSH
    buckets — the embedding analog of MinHash near-dup detection."""
    planes = _hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("bucket", lsh_signature(F.col("_v"), planes))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_sim(F.col("l._v"), F.col("r._v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ------------------------------------------------ int8 quantization


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) ∈ [-127, 127] — a 4× storage/IO cut for
    embedding corpora (the difference between an ANN index that fits in
    cluster memory and one that doesn't).  Returns
    (id, qvec array<tinyint>, scale double); all-zero vectors get
    scale 0 and an all-zero qvec.  Pure JVM expressions."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    # _scale staged as a real column so the max-abs reduction runs once,
    # not once per element of the quantizing transform
    return df.withColumn("_scale", scale).select(
        F.col(id_col),
        F.transform(
            v,
            lambda x: F.when(
                F.col("_scale") > 0, F.round(x / F.col("_scale"))
            )
            .otherwise(F.lit(0.0))
            .cast("tinyint"),
        ).alias("qvec"),
        F.col("_scale").alias("scale"),
    )


def quantized_cosine_topk(
    qdf: DataFrame,
    query_vec: List[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine over a ``quantize_embeddings`` table.  Cosine is
    scale-invariant per vector, so the corpus side needs NO
    dequantization — the integer qvec IS the direction; only the query
    stays full-precision.  TakeOrderedAndProject, no corpus shuffle."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qv = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    return (
        qdf.select(
            F.col(id_col),
            cosine_sim(qv, q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


# --- Product quantization (PQ) -------------------------------------------
#
# Classic IVF-PQ compression for embedding corpora (Jégou et al., "Product
# Quantization for Nearest Neighbor Search"): split each D-dim vector into
# M subvectors, k-means each subspace independently, store only the M code
# bytes per vector (e.g. 64 float32 dims = 256 B -> 4 B at m=4, a 64x cut),
# and answer queries by ADC — asymmetric distance computation — summing
# per-subspace lookup-table entries.  At 100 TB the encoded corpus is what
# fits in cluster memory; the LUTs are M x K doubles shipped as literal
# arrays, so scoring is pure JVM expression work (element_at + adds), no
# Python on executors and no corpus shuffle (TakeOrderedAndProject).


def _slices(vec: Column, m: int, d_sub: int) -> List[Column]:
    return [F.slice(vec, i * d_sub + 1, d_sub) for i in range(m)]


def _nearest_by_sub(
    sub: Column, sv: Column, codebooks: List[List[List[float]]]
) -> Column:
    """Nearest-codeword index where the codebook depends on the subspace
    id: a CASE over subspaces, each branch the same array_min-of-structs
    argmin used for IVF (ties to the lowest code).  Entirely JVM-side."""
    expr = F.lit(None).cast("int")
    for i in range(len(codebooks) - 1, -1, -1):
        expr = F.when(sub == i, _nearest_centroid(sv, codebooks[i])).otherwise(expr)
    return expr


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> List[List[List[float]]]:
    """Fit PQ codebooks: one k-means per subspace, all M subspaces trained
    in the SAME Spark job per Lloyd iteration (posexplode the M slices,
    assign by (sub, code), one groupBy recomputes every mean) — M times
    fewer jobs than fitting subspaces serially.  Deterministic init: the
    M-sliced subvectors of the k lowest-id vectors (``iters=0`` keeps
    exactly those seeds, which a SQL oracle can rebuild).  Driver
    round-trip per iteration is m x k x d_sub floats — corpus-size
    independent.  Returns codebooks[m][k][d_sub].

    ``assign``: 'literal' compiles the argmin as one CASE over m×k
    (dist, code) structs — fastest per row at small codebooks but the
    expression is REBUILT AND RECOMPILED every iteration and stops
    being viable past m×k ≈ 64 (codegen method-size limits).  'join'
    broadcasts the codebook as a table and argmins per subspace inside
    one aggregate (same tie rule, one exchange) — the k=256 path.
    'auto' picks literal for m×k ≤ 64, join beyond."""
    dim = len(df.select(F.col(vec_col)).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if assign == "auto":
        assign = "literal" if m * k <= 64 else "join"
    d_sub = dim // m
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    seeds = v.orderBy(id_col).limit(k).collect()
    codebooks = [
        [[float(x) for x in r["_v"][i * d_sub : (i + 1) * d_sub]] for r in seeds]
        for i in range(m)
    ]
    if iters <= 0:
        return codebooks
    sub = v.select(
        F.col(id_col),
        F.posexplode(F.array(*_slices(F.col("_v"), m, d_sub))).alias("sub", "_sv"),
    )
    for _ in range(iters):
        if assign == "join":
            cb_df = _codebook_df(df.sparkSession, codebooks)
            j = sub.join(F.broadcast(cb_df), "sub")
            # every codeword row in an (id, sub) group shares the same
            # _sv, so first() recovers it inside the same aggregate —
            # no re-join, one exchange per iteration
            assigned = j.groupBy(id_col, "sub").agg(
                F.min(
                    F.struct(
                        _sq_dist(F.col("_sv"), F.col("cw")).alias("d"),
                        F.col("code").alias("c"),
                    )
                )["c"].alias("code"),
                F.first("_sv").alias("_sv"),
            )
        else:
            assigned = sub.withColumn(
                "code", _nearest_by_sub(F.col("sub"), F.col("_sv"), codebooks)
            )
        sums = (
            assigned.select("sub", "code", F.posexplode("_sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new = [[list(c) for c in cb] for cb in codebooks]  # empty cells keep seeds
        by_cell: dict = {}
        for r in sums:
            by_cell.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mu"]
        for (s, c), dims in by_cell.items():
            new[s][c] = [dims[p] for p in sorted(dims)]
        if new == codebooks:
            break
        codebooks = new
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: List[List[List[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as M code bytes: codes[i] = argmin_j
    L2(subvec_i, codebooks[i][j]).  Narrow map, zero shuffle; this is the
    index-build scan.  Compose with ``write_ivf_index`` partitioning to
    get full IVF-PQ (cell-pruned read + compressed residency).  Returns
    (id, codes array<tinyint>)."""
    m, d_sub = len(codebooks), len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[
            _nearest_centroid(s, codebooks[i]).cast("tinyint")
            for i, s in enumerate(_slices(v, m, d_sub))
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    query_vec: List[float],
    codebooks: List[List[List[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over a ``pq_encode`` table: the driver precomputes
    LUT[i][j] = ||q_sub_i - codebooks[i][j]||^2 (m x k doubles, shipped
    as literal arrays) and each row's approximate squared L2 distance is
    the sum of M element_at lookups — no decode, no shuffle,
    TakeOrderedAndProject.  Ascending distance, ties to the lowest id."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    q = np.asarray(query_vec, dtype=float)
    luts = [
        [
            float(np.sum((q[i * d_sub : (i + 1) * d_sub] - np.asarray(cw)) ** 2))
            for cw in codebooks[i]
        ]
        for i in range(m)
    ]
    adc = None
    for i in range(m):
        term = F.element_at(
            F.array(*[F.lit(x) for x in luts[i]]),
            F.col("codes")[i].cast("int") + 1,
        )
        adc = term if adc is None else adc + term
    return (
        codes_df.select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.asc("adc"), id_col)
        .limit(k)
    )


def pq_topk_refined(
    codes_df: DataFrame,
    raw_df: DataFrame,
    query_vec: List[float],
    codebooks: List[List[List[float]]],
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """FAISS-style refine stage over a PQ code table: ADC ranks a
    shortlist of C candidates (TakeOrderedAndProject over the codes
    scan, no shuffle), then ONLY those C rows get exact squared-L2
    distances against their raw vectors and the true top-k wins.

    Why: ADC distances are quantized — measured recall@10 on the
    clustered fixture is ~0.5 for raw-vector PQ — and re-ranking a
    C >> k shortlist with exact metrics recovers nearly-exact answers
    for the cost of C full-precision distance evaluations.

    Scale shape: the C-row shortlist BROADCASTS into a hash join
    against the raw table (corpus side is a narrow columnar (id, vec)
    scan, never shuffled); exact scoring + final top-k touch C rows.
    C is a constant (default 100), so driver/exchange cost is bounded
    regardless of corpus size."""
    cand = pq_topk(
        codes_df, query_vec, codebooks, k=shortlist, id_col=id_col
    ).select(id_col, "adc")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        raw_df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.col("adc"), _sq_dist(v, q).alias("dist"))
        .orderBy(F.asc("dist"), id_col)
        .limit(k)
    )


def _codebook_df(spark, codebooks: List[List[List[float]]]) -> DataFrame:
    rows = [
        (s, c, [float(x) for x in cw])
        for s, cb in enumerate(codebooks)
        for c, cw in enumerate(cb)
    ]
    return spark.createDataFrame(rows, "sub int, code int, cw array<double>")


def pq_encode_join(
    df: DataFrame,
    codebooks: List[List[List[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Large-k encode path, result-identical to ``pq_encode``: the
    literal argmin CASE compiles one struct per (subspace, codeword) and
    stops being viable past k ≈ 32 (whole-stage codegen method-size
    limits; classic PQ uses k = 256).  Here the m×k codebook ships as a
    BROADCAST table instead: explode the M slices, join each (row,
    subspace) against its subspace's codewords, and take one
    min(struct(dist, code)) PER SUBSPACE inside a single groupBy(id) —
    min ignores the other subspaces' NULLs and ties go to the lowest
    code, the same rule as the literal path.  Shuffle: ONE exchange
    (the id aggregate, with map-side partial aggregation; the broadcast
    join adds none); m×k×d_sub codebook floats per executor."""
    m, d_sub = len(codebooks), len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    sub = df.select(
        F.col(id_col),
        F.posexplode(F.array(*_slices(v, m, d_sub))).alias("sub", "_sv"),
    )
    j = sub.join(F.broadcast(_codebook_df(df.sparkSession, codebooks)), "sub")
    aggs = [
        F.min(
            F.when(
                F.col("sub") == i,
                F.struct(
                    _sq_dist(F.col("_sv"), F.col("cw")).alias("d"),
                    F.col("code").alias("c"),
                ),
            )
        )["c"]
        .cast("tinyint")
        .alias(f"_c{i}")
        for i in range(m)
    ]
    return (
        j.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_c{i}") for i in range(m)]).alias("codes"),
        )
    )


# --- IVF-PQ (coarse cells + PQ-coded residuals) --------------------------


def _with_residuals(
    df: DataFrame,
    centroids: List[List[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> DataFrame:
    """Attach ``cell`` (nearest coarse centroid) and ``_rv`` (residual
    vector − centroid).  Assignment + the winning centroid come from
    ``assign_cells(with_centroid=True)`` — literal argmin at small k,
    broadcast-join past ASSIGN_JOIN_THRESHOLD."""
    v = F.col(vec_col).cast("array<double>")
    out = assign_cells(
        df.select(F.col(id_col), v.alias("_v")),
        centroids,
        "_v",
        id_col,
        assign=assign,
        with_centroid=True,
    )
    return out.withColumn(
        "_rv", F.zip_with(F.col("_v"), F.col("_cvec"), lambda a, b: a - b)
    ).drop("_cvec")


def train_ivfpq(
    df: DataFrame,
    n_cells: int = 8,
    m: int = 4,
    k: int = 16,
    cell_iters: int = 3,
    pq_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
):
    """Train the FAISS-standard IVF-PQ pair: coarse k-means for the cell
    quantizer, then PQ codebooks fitted on the RESIDUALS (vector −
    assigned centroid) — residual PQ quantizes a tighter distribution
    than raw vectors, the reason FAISS composes them this way.  Returns
    (centroids[n_cells][dim], codebooks[m][k][d_sub])."""
    centroids = kmeans_centroids(
        df, k=n_cells, iters=cell_iters, vec_col=vec_col, id_col=id_col,
        assign=assign,
    )
    r = _with_residuals(df, centroids, vec_col, id_col, assign=assign)
    codebooks = pq_train(
        r, m=m, k=k, iters=pq_iters, vec_col="_rv", id_col=id_col,
        assign=assign,
    )
    return centroids, codebooks


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    store_vectors: bool = False,
    assign: str = "auto",
) -> None:
    """Materialize the IVF-PQ index: inverted lists partitioned by cell
    hold ONLY (id, M code bytes) — at 100 TB the index is ~64× smaller
    than IVF-Flat (64-dim float32 → 4 bytes at m=4), the difference
    between lists that fit in cluster memory and lists that don't.  One
    writer per cell directory, same layout discipline as the IVF and
    MinHash indexes.

    ``store_vectors=True`` additionally writes the raw vector column
    into the same cell partitions for the exact re-rank stage
    (``query_ivfpq_index_refined``) — the FAISS ``IndexRefineFlat``
    layout.  The residency math still holds: ADC scans read only the
    (id, codes) columns (parquet is columnar — the vec column's pages
    are never fetched), and the refine stage reads vec pages only from
    the n_probe pruned partitions."""
    r = _with_residuals(corpus, centroids, vec_col, id_col, assign=assign)
    m, d_sub = len(codebooks), len(codebooks[0][0])
    use_join = assign == "join" or (
        assign == "auto" and m * len(codebooks[0]) > ASSIGN_JOIN_THRESHOLD
    )
    if use_join:
        # large m*k: residual codes through the broadcast-join encoder
        # (pq_encode_join), joined back on the unique id — one extra
        # co-partitioned exchange, O(1) expression size.
        codes_df = pq_encode_join(r, codebooks, vec_col="_rv", id_col=id_col)
        out = r.join(codes_df, id_col)
    else:
        codes = F.array(
            *[
                _nearest_centroid(s, codebooks[i]).cast("tinyint")
                for i, s in enumerate(_slices(F.col("_rv"), m, d_sub))
            ]
        )
        out = r.withColumn("codes", codes)
    cols = [F.col(id_col), F.col("cell"), F.col("codes")]
    if store_vectors:
        cols.append(F.col("_v").alias("vec"))
    out = out.select(*cols)
    out.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(path)


def query_ivfpq_index(
    spark,
    path: str,
    query_vec: List[float],
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the IVF-PQ index: rank cells driver-side, read
    ONLY the n_probe nearest cell partitions (PartitionFilters), and
    score each row by its CELL'S residual LUT — LUT_c[i][j] =
    ||(q − centroid_c)_sub_i − codebooks[i][j]||², n_probe × m × k
    doubles shipped as literals, summed via element_at.  No decode, no
    shuffle, TakeOrderedAndProject.  Ascending approximate squared L2,
    ties to the lowest id."""
    cells, adc = _ivfpq_cells_and_adc(query_vec, centroids, codebooks, n_probe)
    df = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return (
        df.select(F.col(id_col), "cell", adc.alias("adc"))
        .orderBy(F.asc("adc"), id_col)
        .limit(k)
    )


def _ivfpq_cells_and_adc(
    query_vec: List[float],
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    n_probe: int,
):
    """Driver-side cell ranking + the per-cell residual-LUT ADC column
    (shared by the plain and refined IVF-PQ queries)."""
    q = np.asarray(query_vec, dtype=float)
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    order = sorted(
        range(len(centroids)),
        key=lambda i: float(np.sum((q - np.asarray(centroids[i])) ** 2)),
    )
    cells = order[: max(1, n_probe)]

    def lut_for(cell: int) -> List[List[float]]:
        qr = q - np.asarray(centroids[cell])
        return [
            [
                float(np.sum((qr[i * d_sub : (i + 1) * d_sub] - np.asarray(cw)) ** 2))
                for cw in codebooks[i]
            ]
            for i in range(m)
        ]

    def adc_for(cell: int):
        lut = lut_for(cell)
        expr = None
        for i in range(m):
            term = F.element_at(
                F.array(*[F.lit(x) for x in lut[i]]),
                F.col("codes")[i].cast("int") + 1,
            )
            expr = term if expr is None else expr + term
        return expr

    adc = F.lit(None).cast("double")
    for c in cells:
        adc = F.when(F.col("cell") == c, adc_for(c)).otherwise(adc)
    return cells, adc


def query_ivfpq_index_refined(
    spark,
    path: str,
    query_vec: List[float],
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 100,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ query with the FAISS-style exact re-rank stage: the ADC
    shortlist of C candidates is re-scored with exact squared L2 on the
    raw vectors stored IN the pruned cell partitions
    (``write_ivfpq_index(store_vectors=True)``), and the exact top-k
    wins.  Lifts measured recall@10 from ~0.66 (ADC only) to ≥0.9 on
    the clustered fixture.

    Plan shape: ONE partition-pruned read (PartitionFilters: cell IN
    n_probe) → ADC TakeOrderedAndProject keeps the shortlist rows WITH
    their vec column (no second scan, no join) → exact distance + final
    top-k over C rows.  Zero exchanges on the corpus side; the refine
    adds C exact distance evaluations, corpus-size independent."""
    cells, adc = _ivfpq_cells_and_adc(query_vec, centroids, codebooks, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(cells))
        .select(F.col(id_col), "cell", "vec", adc.alias("adc"))
        .orderBy(F.asc("adc"), id_col)
        .limit(shortlist)
    )
    return (
        cand.select(
            F.col(id_col), F.col("cell"), _sq_dist(F.col("vec"), q).alias("dist")
        )
        .orderBy(F.asc("dist"), id_col)
        .limit(k)
    )


def query_ivfpq_batch(
    spark,
    path: str,
    queries: DataFrame,
    centroids: List[List[float]],
    codebooks: List[List[List[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch ADC over the IVF-PQ index — the shape a retrieval job runs
    (a TABLE of queries, not one vector).  Literal per-query LUTs can't
    ship for a whole batch, so the LUT itself becomes data:

    1. driver ranks cells per query (|queries| × n_cells distances —
       queries are the small side by definition) and builds the
       per-query LUT table (query_id, cell, sub, code, d) =
       ||(q − centroid_cell)_sub − codeword||² — |Q|·n_probe·m·k rows,
       BROADCAST;
    2. index rows from the probed cell partitions only (PartitionFilters)
       posexplode their M codes — a narrow ×m map, no shuffle;
    3. broadcast-join on (cell, sub, code) and ONE hash aggregate sums
       the M terms per (query, id) — the single exchange;
    4. per-query top-k by window rank.

    Corpus-side cost: probed partitions × (m+1) narrow work + one
    aggregate; identical answers to ``query_ivfpq_index`` per query."""
    qrows = queries.select(query_id_col, vec_col).collect()
    m, d_sub = len(codebooks), len(codebooks[0][0])
    lut_rows = []
    probe_cells = set()
    for row in qrows:
        q = np.asarray([float(x) for x in row[vec_col]])
        order = sorted(
            range(len(centroids)),
            key=lambda i: float(np.sum((q - np.asarray(centroids[i])) ** 2)),
        )
        for cell in order[: max(1, n_probe)]:
            probe_cells.add(cell)
            qr = q - np.asarray(centroids[cell])
            for i in range(m):
                sub_q = qr[i * d_sub : (i + 1) * d_sub]
                for code, cw in enumerate(codebooks[i]):
                    lut_rows.append(
                        (
                            row[query_id_col],
                            cell,
                            i,
                            code,
                            float(np.sum((sub_q - np.asarray(cw)) ** 2)),
                        )
                    )
    # id type derived from the queries frame (string/bigint ids both
    # survive the union/join path — the ADVICE r2 empty-batch lesson)
    from pyspark.sql import types as T

    qid_type = queries.schema[query_id_col].dataType
    lut_schema = T.StructType(
        [
            T.StructField(query_id_col, qid_type, False),
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("sub", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField("d", T.DoubleType(), False),
        ]
    )
    lut = spark.createDataFrame(lut_rows, lut_schema)

    idx = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(sorted(probe_cells)))
        .select(
            F.col(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.posexplode("codes").alias("sub", "code"),
        )
        .withColumn("code", F.col("code").cast("int"))
    )
    scored = (
        idx.join(F.broadcast(lut), ["cell", "sub", "code"])
        .groupBy(query_id_col, id_col, "cell")
        .agg(F.sum("d").alias("adc"), F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") == m)  # only fully-probed (query, id) pairs
        .drop("_m")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cell", "adc", "rank")
    )


# -------------------------------------------------- SemDeDup


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: List[List[float]],
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, arXiv:2303.09540):
    assign every embedding to its nearest k-means centroid, then compute
    pairwise cosine ONLY within each cluster; pairs with cosine ≥ ``tau``
    are semantic duplicates.  Returns ``(id_a, id_b, cell, cosine)``
    with ``id_a < id_b``.

    Scale shape — the within-cluster self-join is the paper's own
    complexity reduction: O(N²/k) comparisons instead of O(N²).  Both
    sides shuffle once on ``cell`` and the join is co-partitioned; at
    100 TB you pick k large enough (paper: 50k clusters for LAION) that
    the largest cell fits a task.  No cross-cell pair is ever formed —
    there is no cartesian anywhere (`tests/test_plan_quality.py` pins
    SortMergeJoin/ShuffledHashJoin on the equality key)."""
    v = assign_cells(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        centroids,
        "_v",
        "_id",
        assign=assign,
    )
    a = v.select(
        F.col("_id").alias("id_a"), F.col("cell"), F.col("_v").alias("_va")
    )
    b = v.select(
        F.col("_id").alias("id_b"), F.col("cell"), F.col("_v").alias("_vb")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cell", "cosine")
    )


def _centroid_df(spark, centroids: List[List[float]]) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType(), False),
            T.StructField(
                "cvec", T.ArrayType(T.DoubleType(), False), False
            ),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)], schema
    )


def semantic_dedup(
    df: DataFrame,
    centroids: List[List[float]],
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> DataFrame:
    """Full SemDeDup decision table over the members of the semantic
    near-dup graph: ``(vec_id, cell, cluster_id, cos_centroid, kept)``.

    Duplicate groups are connected components of the ≥ tau pair graph
    (min-label propagation, reused from the text near-dup family); per
    the paper, the member KEPT from each group is the one with the
    LOWEST cosine similarity to its cluster centroid — the most atypical
    example survives, maximizing diversity (ties break to the lowest
    id).  Vectors outside the graph are trivially kept and are not
    returned; ``semantic_dedup_keep`` applies the verdict to the corpus.

    Scale shape — assignment + the winning centroid come from
    ``assign_cells(with_centroid=True)`` (literal argmin at small k,
    k-row broadcast join past ASSIGN_JOIN_THRESHOLD — never a shuffle
    of the corpus keyed on anything but the unique id); the
    winner-per-cluster argmin is one min(struct) aggregate."""
    from .dedup import near_dup_clusters

    pairs = semantic_dedup_pairs(df, centroids, tau, vec_col, id_col, assign)
    clusters = near_dup_clusters(pairs)  # (doc_id, cluster_id)

    v = assign_cells(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        centroids,
        "_v",
        "doc_id",
        assign=assign,
        with_centroid=True,
    )
    member = clusters.join(v, "doc_id")
    member = member.withColumn(
        "cos_centroid", cosine_sim(F.col("_v"), F.col("_cvec"))
    )
    winners = member.groupBy("cluster_id").agg(
        F.min(F.struct("cos_centroid", "doc_id"))["doc_id"].alias("_keep_id")
    )
    return (
        member.join(winners, "cluster_id")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("cluster_id"),
            F.col("cos_centroid"),
            (F.col("doc_id") == F.col("_keep_id")).alias("kept"),
        )
    )


def semantic_dedup_keep(
    df: DataFrame,
    centroids: List[List[float]],
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "auto",
) -> DataFrame:
    """Rows of ``df`` surviving SemDeDup: graph members whose ``kept``
    verdict is false are dropped via one LEFT ANTI join; everything
    outside the near-dup graph survives untouched."""
    verdict = semantic_dedup(df, centroids, tau, vec_col, id_col, assign)
    losers = verdict.filter(~F.col("kept")).select(F.col(id_col))
    return df.join(losers, id_col, "left_anti")


# ------------------------------------------------------------------ OPQ


def sample_vectors(
    df: DataFrame,
    n: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic training sample: the ``n`` lowest-id vectors as a
    numpy matrix.  Quantizer training on a BOUNDED sample is the
    published practice (FAISS trains on ≤ ~256k points regardless of
    corpus size); the driver round-trip is sample-sized, never the
    corpus."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(id_col)
        .limit(n)
        .collect()
    )
    return np.array([list(r[1]) for r in rows], dtype=float)


def _local_pq(
    X: np.ndarray, m: int, k: int, iters: int
) -> List[np.ndarray]:
    """Plain per-subspace Lloyd on a sample matrix (deterministic init:
    first k rows' slices; empty clusters keep their centroid).  Only
    used inside OPQ's rotation loop — the corpus-scale codebooks come
    from the distributed ``pq_train``."""
    d_sub = X.shape[1] // m
    books = []
    for i in range(m):
        S = X[:, i * d_sub : (i + 1) * d_sub]
        C = S[:k].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(k):
                mask = a == j
                if mask.any():
                    C[j] = S[mask].mean(0)
        books.append(C)
    return books


def _pq_reconstruct(
    X: np.ndarray, books: List[np.ndarray]
) -> np.ndarray:
    m = len(books)
    d_sub = X.shape[1] // m
    out = np.empty_like(X)
    for i in range(m):
        S = X[:, i * d_sub : (i + 1) * d_sub]
        d = ((S[:, None, :] - books[i][None, :, :]) ** 2).sum(-1)
        out[:, i * d_sub : (i + 1) * d_sub] = books[i][d.argmin(1)]
    return out


def opq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    opq_iters: int = 8,
    lloyd_iters: int = 4,
    sample: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[float]]:
    """Learn an OPQ rotation (Ge et al., CVPR 2013, non-parametric):
    an orthogonal d×d matrix R minimizing the PQ quantization error of
    the ROTATED data, by alternating (1) per-subspace Lloyd on X·R and
    (2) the orthogonal-Procrustes solve R = U·Vᵀ from SVD(Xᵀ·X̂).
    Axis-aligned subspace quantizers waste their budget when variance
    is concentrated in correlated dimensions; the rotation rebalances
    it, which is the remaining public-knowledge headroom past the
    exact-refine stage.

    Trains on the deterministic bounded sample (see
    :func:`sample_vectors`); apply with :func:`rotate_vectors`, then
    the WHOLE existing PQ family (pq_train / pq_encode / pq_topk /
    refine / IVF-PQ) composes unchanged in the rotated space (queries
    rotate once, driver-side).  Returns R as list-of-lists (row-vector
    convention: x_rot = x · R)."""
    X = sample_vectors(df, n=sample, vec_col=vec_col, id_col=id_col)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    R = np.eye(dim)
    for _ in range(opq_iters):
        Xr = X @ R
        books = _local_pq(Xr, m, k, lloyd_iters)
        X_hat = _pq_reconstruct(Xr, books)
        # min_R ||X R - X_hat||_F  s.t.  RᵀR = I  →  R = U Vᵀ,
        # U S Vᵀ = SVD(Xᵀ X_hat)
        U, _, Vt = np.linalg.svd(X.T @ X_hat)
        R = U @ Vt
    return [[float(x) for x in row] for row in R]


def rotate_vectors(
    df: DataFrame,
    R: List[List[float]],
    vec_col: str = "embedding",
    out_col: Optional[str] = None,
) -> DataFrame:
    """x → x·R over the corpus: Arrow-batched numpy matmul (narrow map,
    zero shuffle, one pass — the rotation rides the same scan as the
    subsequent ``pq_encode``).  The matrix ships in the task closure
    (d² doubles — KBs)."""
    out = out_col or vec_col
    Rm = np.array(R, dtype=float)

    @F.pandas_udf("array<double>")
    def _rot(col: pd.Series) -> pd.Series:
        M = np.array(col.tolist(), dtype=float) @ Rm
        return pd.Series(list(M))

    return df.withColumn(out, _rot(F.col(vec_col).cast("array<double>")))


def rotate_query(query_vec: List[float], R: List[List[float]]) -> List[float]:
    return [
        float(x) for x in np.asarray(query_vec, dtype=float) @ np.array(R)
    ]
