"""Skew-aware repartitioning for document corpora.

Documents are heavily size-skewed (a whale workbook next to tiny CSVs —
FIXTURES.md family 18).  Plain ``repartition(n)`` round-robins rows but
shuffles everything; ``repartition(n, doc_id)`` can still co-locate several
whales.  The strategy here:

- partition key = ``xxhash64(doc_id, salt)`` — deterministic (fixed salt)
  so the checkpoint/resume manifest's split assignment is reproducible
  across runs (SURVEY.md §4.2 item 3);
- a secondary log2-size bucket key joins the hash so same-sized giants
  spread across partitions instead of landing together;
- Arrow's ``maxRecordsPerBatch`` (session.py) bounds per-batch payload
  inside a partition.

At cluster scale the same expression becomes the Iceberg bucket transform
(``bucket(N, doc_id)``) so the layout survives writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 42


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    doc_id_col: str = "doc_id",
    size_col: str = "n_bytes",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Deterministic skew-defusing repartition of a document DataFrame."""
    hash_key = F.xxhash64(F.col(doc_id_col), F.lit(salt))
    if size_col in df.columns:
        size_bucket = F.floor(F.log2(F.col(size_col) + F.lit(1)))
        return df.repartition(num_partitions, hash_key, size_bucket)
    return df.repartition(num_partitions, hash_key)


def split_id(doc_id_col: str = "doc_id", num_splits: int = 64, salt: int = DEFAULT_SALT):
    """Deterministic split assignment column for checkpoint manifests:
    ``pmod(xxhash64(doc_id, salt), num_splits)``."""
    return F.pmod(F.xxhash64(F.col(doc_id_col), F.lit(salt)), F.lit(num_splits))
