"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the standard recipe for biasing a raw web corpus
toward a high-quality target domain before pretraining.

Recipe: fit bag-of-ngrams (unigram + bigram) models over the RAW and
TARGET corpora, weight every raw document by its log likelihood ratio
``log p_target(doc) - log p_raw(doc)``, then sample without replacement
proportionally to the weights via Gumbel top-k.

Engine mapping (all JVM-side, zero Python on executors):

* feature extraction — one ``explode`` of a per-doc feature array built
  from ``textstats.tokens``; the paper hashes features into a fixed
  bucket count (``hash_buckets=``, ``xxhash64 % N``) which keeps the
  model a broadcastable N-row table at any corpus size; raw string
  features (``hash_buckets=None``) are the oracle-friendly variant.
* model fit — one map-side-combinable ``groupBy(feature).count`` per
  corpus; add-alpha smoothing over the UNION vocabulary so both models
  are normalized against the same support.
* weighting — explode + join against the log-ratio table (broadcast
  when hashed: 10k rows), one sum aggregate per doc.  Two shuffles
  total at any scale (feature agg + per-doc sum).
* Gumbel top-k — RNG-free: the Gumbel noise is derived from
  ``md5(doc_id:seed)`` exactly like the split/sampling family, so
  selection is reproducible across runs, engines, and cluster sizes,
  and the DuckDB oracle recomputes it bit-for-bit.

There is no DSIR analog in the reference repo (single-process checker);
this is part of the LLM-training-data family the engine adds on top.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import tokens

#: 2^24 — the md5-derived uniform uses the first 6 hex chars.
_MD5_SPACE = 16**6


def doc_features(
    text: Column, hash_buckets: Optional[int] = None
) -> Column:
    """Array of unigram + bigram features (with multiplicity) for one
    document.  With ``hash_buckets`` the features are xxhash64-bucketed
    strings (the paper's fixed-dimension variant)."""
    toks = tokens(text)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda w, i: F.concat_ws(" ", w, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    if hash_buckets is not None:
        feats = F.transform(
            feats,
            lambda s: F.pmod(F.xxhash64(s), F.lit(hash_buckets)).cast(
                "string"
            ),
        )
    return feats


def feature_counts(
    df: DataFrame,
    text_col: str = "text",
    hash_buckets: Optional[int] = None,
) -> DataFrame:
    """``(feature, cnt)`` bag-of-ngrams counts for a corpus — one
    explode + one map-side-combinable aggregate."""
    return (
        df.select(
            F.explode(doc_features(F.col(text_col), hash_buckets)).alias(
                "feature"
            )
        )
        .groupBy("feature")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-feature ``log p_target - log p_raw`` under add-``alpha``
    smoothing over the union vocabulary: ``p(f) = (c_f + α) / (T + αV)``
    with V = |union vocab|.  Returns ``(feature, log_ratio)`` plus the
    constant unseen-feature ratio as a 1-row twin accessible via
    ``unseen_log_ratio`` (needed only when scoring a third corpus).

    The totals/vocab-size reduction is two scalar aggregates; the join
    is a full outer on feature — model-sized, not corpus-sized."""
    r = raw_counts.select("feature", F.col("cnt").alias("_cr"))
    t = target_counts.select("feature", F.col("cnt").alias("_ct"))
    vocab = r.join(t, "feature", "full_outer").select(
        "feature",
        F.coalesce("_cr", F.lit(0)).alias("_cr"),
        F.coalesce("_ct", F.lit(0)).alias("_ct"),
    )
    # scalar totals as a broadcast 1-row cross — never a driver action
    totals = vocab.agg(
        F.sum("_cr").alias("_tr"),
        F.sum("_ct").alias("_tt"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = float(alpha)
    return vocab.crossJoin(F.broadcast(totals)).select(
        "feature",
        (
            F.log(F.col("_ct") + F.lit(a))
            - F.log(F.col("_tt") + F.lit(a) * F.col("_v"))
            - F.log(F.col("_cr") + F.lit(a))
            + F.log(F.col("_tr") + F.lit(a) * F.col("_v"))
        ).alias("log_ratio"),
    )


def dsir_weights(
    df: DataFrame,
    log_ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_buckets: Optional[int] = None,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document importance weight: ``(id, n_feats, log_w)`` where
    ``log_w = Σ_f log_ratio(f)`` over the document's features (with
    multiplicity).  ``broadcast_model=True`` for the hashed variant
    (the model is ≤ hash_buckets rows — ship it to the corpus, never
    shuffle the corpus to it)."""
    # explode_outer: a featureless (empty-text) document must survive
    # with n_feats=0/log_w=0, not silently vanish from the weight table
    feats = df.select(
        F.col(id_col),
        F.explode_outer(doc_features(F.col(text_col), hash_buckets)).alias(
            "feature"
        ),
    )
    m = F.broadcast(log_ratios) if broadcast_model else log_ratios
    return (
        feats.join(m, "feature", "left")
        .groupBy(id_col)
        .agg(
            F.count("feature").alias("n_feats"),
            F.coalesce(
                F.sum(F.coalesce("log_ratio", F.lit(0.0))), F.lit(0.0)
            ).alias("log_w"),
        )
    )


def gumbel_noise(col: Column, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel draw from the md5 of
    ``<id>:<seed>``: u = (h24 + 1) / (2^24 + 1) ∈ (0,1), g = -ln(-ln u).
    Engine-portable (the DuckDB twin is strpos arithmetic on the same
    md5 hex)."""
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat_ws(":", col, F.lit(str(seed))), "UTF-8")),
            1,
            6,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(_MD5_SPACE + 1))
    return -F.log(-F.log(u))


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Gumbel top-k resampling over the weight table: the ``k``
    documents with the largest ``log_w + Gumbel(md5(id:seed))`` — an
    exact sample-without-replacement proportional to ``exp(log_w)``
    (Vieira 2014).  ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject: per-partition top-k then a k-row merge —
    never a global sort, never a single-task window."""
    g = gumbel_noise(F.col(id_col).cast("string"), seed)
    return (
        weights.withColumn("gumbel_key", F.col("log_w") + g)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )


def dsir_selected_flag(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Every weight row plus ``gumbel_key`` and a ``selected`` flag —
    the audit view of ``dsir_select``.  The k winner ids come back as a
    broadcast (k rows), so the corpus-sized side never shuffles."""
    winners = dsir_select(weights, k, id_col, seed).select(
        F.col(id_col), F.lit(True).alias("selected")
    )
    g = gumbel_noise(F.col(id_col).cast("string"), seed)
    return (
        weights.withColumn("gumbel_key", F.col("log_w") + g)
        .join(F.broadcast(winners), id_col, "left")
        .fillna({"selected": False})
    )
