"""Deterministic sampling and dataset splits (training-data lane).

RNG-free: every decision is a pure function of the document id via an
md5 hash bucket, so splits are reproducible across runs, engines and
cluster sizes (no seed drift between partitions, no dependence on row
order), new documents never reshuffle old ones between splits, and a
DuckDB oracle can recompute the assignment bit-for-bit.  All JVM-side
expressions — sampling a 100 TB corpus is a narrow scan, no shuffle.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame, functions as F

HASH_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the integer value of
    the first 6 md5 hex chars of the (string) id — engine-portable (the
    DuckDB twin is ``_md5_int_sql``-style arithmetic), uniform enough
    for split assignment (24 bits ≫ 10⁴ buckets)."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 6), 16, 10)
        .cast("long")
        % buckets
    )


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.9,
    valid_frac: float = 0.05,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Attach ``split`` ∈ {train, valid, test} by hash-bucket range:
    bucket < train·B → train, < (train+valid)·B → valid, else test.
    Fractions are exact at bucket granularity (1/10⁴ by default)."""
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    t_hi = int(round(train_frac * buckets))
    v_hi = t_hi + int(round(valid_frac * buckets))
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_frac: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic per-stratum downsampling (the training-mix shaper:
    e.g. keep 100% of rare languages, 10% of the dominant one).  A row
    survives iff its hash bucket < frac(stratum)·buckets — no RNG, so
    resampling with the same fractions returns the identical corpus,
    and raising a fraction strictly grows the sample (nested samples).
    The fraction map is a literal CASE chain — no join, no shuffle."""
    frac = F.lit(float(default_frac))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    return df.filter(b < F.round(frac * buckets).cast("long"))


def pack_shards(
    df: DataFrame,
    budget_tokens: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Assign each document a ``shard`` so consecutive documents (in
    id order) fill ~``budget_tokens`` per shard — the export step that
    turns a cleaned corpus into bounded training-data files.

    shard = floor(exclusive-prefix-sum(tokens) / budget): a document
    starts in the shard its running total lands in, so every shard
    except the last holds ≥ budget tokens and the assignment is a pure
    function of the global id order.

    Scale shape — the naive ``Window.orderBy(id)`` running total drags
    the whole corpus through ONE task (the classic global-window
    bottleneck); this uses the two-phase parallel prefix sum instead:
    range-partition by id, per-partition running totals in parallel
    windows, then a ``num_ranges``-row driver round-trip turns
    partition totals into exclusive offsets that are mapped back as a
    literal CASE — no single-task stage anywhere."""
    from pyspark.sql import Window

    from .textstats import token_count

    t = (
        df.select(
            F.col(id_col),
            # NULL text counts as 0 tokens (NULL would poison the
            # running totals on both engines differently)
            F.coalesce(token_count(F.col(text_col)), F.lit(0)).alias("_tc"),
        )
        .repartitionByRange(num_ranges, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("_lcum", F.sum("_tc").over(w))
    if checkpoint:
        # two consumers (totals collect + final select) — materialize the
        # token-count/window stage once.  checkpoint=False keeps the
        # full lineage visible (plan audits / callers that cache higher)
        t = t.localCheckpoint(eager=False)
    totals = {
        r["_pid"]: r["_t"]
        for r in t.groupBy("_pid").agg(F.max("_lcum").alias("_t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.lit(0).cast("long")
    for pid, o in sorted(offsets.items()):
        off = F.when(F.col("_pid") == pid, F.lit(o).cast("long")).otherwise(off)
    prev_cum = off + F.col("_lcum") - F.col("_tc")
    return t.select(
        id_col,
        F.col("_tc").alias("n_tokens"),
        F.floor(prev_cum / F.lit(budget_tokens)).cast("int").alias("shard"),
    )


def split_manifest(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_frac: float = 0.9,
    valid_frac: float = 0.05,
) -> DataFrame:
    """(split, stratum, n_docs, n_tokens) audit table for a split —
    the record a training run pins alongside the data."""
    from .textstats import token_count

    return (
        with_split(df, id_col, train_frac, valid_frac)
        .groupBy("split", F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
        )
    )
