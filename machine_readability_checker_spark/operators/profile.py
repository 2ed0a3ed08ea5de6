"""Table profiling: per-column data-quality stats in one pass.

The corpus-scale analog of the reference's per-file readability report:
before running a pipeline over 100 TB you profile the table — null
fractions, cardinalities, value lengths — and gate ingestion on the
result.  One aggregate job over the table produces every column's stats
(Spark plans multiple count-distincts via a single Expand + partial
aggregation — one scan, no per-column passes); the wide one-row result
is then unpivoted driver-side into (column, stat...) rows, which is a
#columns-sized literal, not data.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_len, max_len) per
    column.  ``n_distinct`` is exact (null excluded); ``min_len`` /
    ``max_len`` measure the string rendering of non-null values —
    NULL for all-null columns.  Column order follows the schema."""
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        v = F.col(c)
        s = F.length(v.cast("string"))
        aggs += [
            F.count(F.when(v.isNull(), 1)).alias(f"__nn_{c}"),
            F.countDistinct(v).alias(f"__nd_{c}"),
            F.min(s).alias(f"__mn_{c}"),
            F.max(s).alias(f"__mx_{c}"),
        ]
    row = df.agg(F.count("*").alias("__n"), *aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            row["__n"],
            row[f"__nn_{c}"],
            row[f"__nd_{c}"],
            row[f"__mn_{c}"],
            row[f"__mx_{c}"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, n_rows bigint, n_nulls bigint, n_distinct bigint,"
        " min_len int, max_len int",
    )
