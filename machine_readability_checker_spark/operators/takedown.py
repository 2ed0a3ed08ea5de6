"""Takedown propagation: purge document ids out of materialized index
artifacts (MinHash band index, BM25 postings) without rebuilding them.

A row-level delete on the corpus table (``IcebergLayoutTable.
delete_where`` + ``TableMaintenance.purge_deleted``) leaves the purged
ids living on in every derived index — a DMCA/GDPR takedown isn't done
until index probes stop returning them.  Rebuilding a 100 TB index for
a thousand-id takedown is absurd; these operators rewrite ONLY the
index partitions that actually contain the purged ids:

1. one semi-join of the index against the id list finds the affected
   partition directories (bounded by the index's partition count, never
   the corpus);
2. each affected directory is rewritten through an anti-join and
   swapped via the same ``.compact.tmp`` → ``.old`` rename protocol as
   table compaction — so ``TableMaintenance.recover_compaction``-style
   crash recovery applies (``recover_index_purge`` here);
3. for BM25, the purged docs' postings are read FIRST and folded into
   the ``_stats`` (n_docs, avgdl) and per-term ``_df`` sidecars, so
   post-purge scores are EXACTLY what a from-scratch rebuild on the
   surviving corpus produces (pinned by test).

The reference app has no index or delete surface (single file per run);
this is pipeline infrastructure the 10^12-document target demands.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F


def _leaf_dirs(
    path: str, partition_cols: Sequence[str]
) -> List[Tuple[Tuple[int, ...], str]]:
    """All (partition-values, dir) leaves of a Hive-partitioned index."""
    out: List[Tuple[Tuple[int, ...], str]] = []

    def walk(d: str, depth: int, vals: Tuple[int, ...]):
        if depth == len(partition_cols):
            out.append((vals, d))
            return
        prefix = partition_cols[depth] + "="
        for name in sorted(os.listdir(d)):
            if name.startswith(prefix):
                walk(
                    os.path.join(d, name),
                    depth + 1,
                    vals + (int(name[len(prefix):]),),
                )

    walk(path, 0, ())
    return out


def _swap_in(df: DataFrame, leaf_dir: str) -> None:
    """Rewrite a leaf directory atomically: write ``.compact.tmp``,
    rename the live dir to ``.old``, rename tmp in, drop ``.old`` —
    the compaction swap protocol, so half-done swaps are recoverable."""
    tmp = leaf_dir + ".compact.tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = leaf_dir + ".old"
    os.rename(leaf_dir, old)
    os.rename(tmp, leaf_dir)
    shutil.rmtree(old)


def recover_index_purge(path: str) -> List[str]:
    """Idempotent crash recovery for half-finished index-purge swaps,
    the ``recover_compaction`` protocol over an index tree: a leaf with
    ``.old`` and a live dir finished its swap (drop the leftover); one
    with only ``.old`` is restored; orphaned ``.compact.tmp`` is stale
    output (removed).  Returns the root-relative paths restored."""
    restored: List[str] = []
    for dirpath, dirnames, _ in os.walk(path):
        for name in list(dirnames):
            full = os.path.join(dirpath, name)
            if name.endswith(".old"):
                live = full[: -len(".old")]
                if os.path.isdir(live):
                    shutil.rmtree(full)
                else:
                    os.rename(full, live)
                    restored.append(os.path.relpath(live, path))
            elif name.endswith(".compact.tmp"):
                shutil.rmtree(full)
    return restored


def purge_ids_from_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
    partition_cols: Sequence[str] = ("band", "bucket"),
) -> Dict[str, int]:
    """Remove every row carrying a purged id from a Hive-partitioned
    index, rewriting only the partitions that contain one.  Defaults fit
    ``dedup.write_minhash_index`` (band=K/bucket=M); pass
    ``("term_bucket",)`` for a BM25 postings tree (or use
    ``purge_ids_from_bm25_index``, which also fixes the score sidecars).

    Scale shape: the affected-partition probe is ONE partition-pruned
    scan joined (broadcast) against the takedown-sized id list — the
    distinct partition tuples it returns are bounded by the index's
    directory count.  Each affected leaf is then rewritten
    independently (id anti-join, row counts verified) and swapped
    atomically.  Returns {partitions_rewritten, rows_removed}."""
    ids = ids.select(F.col(id_col)).distinct()
    idx = spark.read.parquet(path)
    affected = (
        idx.join(F.broadcast(ids), id_col, "left_semi")
        .select(*partition_cols)
        .distinct()
        .collect()
    )
    rows_removed = 0
    rewritten = 0
    leaves = dict(_leaf_dirs(path, partition_cols))
    for r in affected:
        key = tuple(int(r[c]) for c in partition_cols)
        leaf = leaves.get(key)
        if leaf is None:
            continue
        df = spark.read.parquet(leaf)
        n_before = df.count()
        kept = df.join(F.broadcast(ids), id_col, "left_anti")
        n_after = kept.count()
        if n_after == n_before:
            continue
        _swap_in(kept, leaf)
        rows_removed += n_before - n_after
        rewritten += 1
    return {"partitions_rewritten": rewritten, "rows_removed": rows_removed}


def purge_ids_from_minhash_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> Dict[str, int]:
    """Takedown over a ``write_minhash_index`` layout: after this, a
    ``query_minhash_index`` probe can never return a purged id — its
    band entries are gone from every band=K/bucket=M partition."""
    return purge_ids_from_index(
        spark, path, ids, id_col, partition_cols=("band", "bucket")
    )


def purge_ids_from_bm25_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> Dict[str, int]:
    """Takedown over a ``write_bm25_index`` layout, exact to a rebuild:
    removes the purged docs' postings rows (bucket-pruned rewrites) AND
    folds their contribution out of the score sidecars —
    ``_df`` loses one per term the doc carried (terms reaching df=0
    disappear), ``_stats`` drops the docs from n_docs and their lengths
    from avgdl.  Post-purge ``bm25_topk``/``bm25_batch_topk`` scores
    equal a from-scratch index built on the surviving corpus (pinned by
    tests/test_takedown.py::test_bm25_purge_equals_rebuild)."""
    ids = ids.select(F.col(id_col).alias("doc_id")).distinct()
    idx = spark.read.parquet(path)
    purged = idx.join(F.broadcast(ids), "doc_id", "left_semi")
    # sidecar corrections, computed BEFORE the postings rewrite
    doc_stats = (
        purged.groupBy("doc_id").agg(F.first("dl").alias("dl")).collect()
    )
    n_purged = len(doc_stats)
    sum_dl = sum(r["dl"] for r in doc_stats)
    # MATERIALIZE the decrements before the postings rewrite — the lazy
    # plan reads the postings files, which are about to change under it.
    # Size = the purged docs' distinct terms (takedown-sized, not corpus)
    dec_rows = (
        purged.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("dec"))
        .collect()
    )
    dec = spark.createDataFrame(
        [(r["term"], r["dec"]) for r in dec_rows] or [("", 0)],
        "term string, dec long",
    ).filter(F.col("dec") > 0)
    out = purge_ids_from_index(
        spark, path, ids, "doc_id", partition_cols=("term_bucket",)
    )
    if n_purged == 0:
        return {**out, "docs_removed": 0, "df_partitions_rewritten": 0}

    # ---- _df: decrement per-term document frequencies, pruned to the
    # buckets holding an affected term
    df_path = os.path.join(path, "_df")
    df_rewritten = 0
    if os.path.isdir(df_path):
        dft = spark.read.parquet(df_path)
        affected = (
            dft.join(F.broadcast(dec), "term", "left_semi")
            .select("term_bucket")
            .distinct()
            .collect()
        )
        leaves = dict(_leaf_dirs(df_path, ("term_bucket",)))
        for r in affected:
            leaf = leaves.get((int(r["term_bucket"]),))
            if leaf is None:
                continue
            one = spark.read.parquet(leaf)
            fixed = (
                one.join(F.broadcast(dec), "term", "left")
                .withColumn(
                    "df", F.col("df") - F.coalesce(F.col("dec"), F.lit(0))
                )
                .drop("dec")
                .filter(F.col("df") > 0)
            )
            _swap_in(fixed, leaf)
            df_rewritten += 1

    # ---- _stats: one-row algebraic update (exact: counts and sums)
    stats_path = os.path.join(path, "_stats")
    if os.path.isdir(stats_path):
        s = spark.read.parquet(stats_path).collect()[0]
        n_new = int(s["n_docs"]) - n_purged
        avg_new = (
            (float(s["avgdl"]) * int(s["n_docs"]) - float(sum_dl)) / n_new
            if n_new > 0
            else 0.0
        )
        fixed = spark.createDataFrame(
            [(n_new, avg_new)], "n_docs long, avgdl double"
        )
        _swap_in(fixed, stats_path)
    return {
        **out,
        "docs_removed": n_purged,
        "df_partitions_rewritten": df_rewritten,
    }


def purge_ids_from_ivf_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> Dict[str, int]:
    """Takedown over a ``write_ivf_index`` / ``write_ivfpq_index``
    layout (cell-partitioned inverted lists): purged vectors leave
    only the cell directories that contain them, so
    ``query_ivf_index``/``query_ivfpq_index`` probes can never return
    them — same pruned-rewrite contract as the MinHash/BM25 purges."""
    return purge_ids_from_index(
        spark, path, ids, id_col, partition_cols=("cell",)
    )


def takedown(
    spark: SparkSession,
    table,
    predicate,
    key_col: str = "doc_id",
    minhash_index: Optional[str] = None,
    bm25_index: Optional[str] = None,
    ivf_index: Optional[str] = None,
    ivf_id_col: str = "vec_id",
) -> Dict[str, object]:
    """One-call takedown: row-level delete on the Iceberg-layout table
    (merge-on-read — physical purge rides ``purge_deleted`` after
    snapshot expiry) plus immediate propagation into the given
    materialized indexes.  Returns the per-surface stats."""
    snap = table.delete_where(spark, predicate, key_col=key_col)
    ids = spark.read.parquet(
        os.path.join(table.delete_dir, f"d{snap['delete_id']}")
    ).select(key_col)
    out: Dict[str, object] = {
        "table": {
            "snapshot_version": snap["version"],
            "rows_deleted": snap["rows_deleted"],
        }
    }
    if minhash_index:
        out["minhash"] = purge_ids_from_minhash_index(
            spark, minhash_index, ids, id_col=key_col
        )
    if bm25_index:
        out["bm25"] = purge_ids_from_bm25_index(
            spark, bm25_index, ids, id_col=key_col
        )
    if ivf_index:
        out["ivf"] = purge_ids_from_ivf_index(
            spark, ivf_index,
            ids.withColumnRenamed(key_col, ivf_id_col),
            id_col=ivf_id_col,
        )
    return out
