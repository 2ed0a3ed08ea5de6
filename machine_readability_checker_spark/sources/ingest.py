"""Ingest-lane helpers: extension gate / quarantine split, sheet
enumeration, docs_raw loading.

The reference rejects files outside {xlsx, xls, csv} with an exception
(``loader.py:15,157-159``); at corpus scale a throw is wrong — the gate is
a DataFrame split: supported rows flow on, rejects land in a quarantine
sink with a reason column (the same pattern the kernel uses for parse
errors).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.grid import ALLOWED_FORMATS, parse_document

SUPPORTED_FORMATS = sorted(ALLOWED_FORMATS)

SHEET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sheet_idx", T.IntegerType(), False),
        T.StructField("sheet_name", T.StringType(), False),
        T.StructField("n_rows", T.IntegerType(), False),
        T.StructField("n_cols", T.IntegerType(), False),
    ]
)


def load_docs_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def extension_gate(df_raw: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """(supported, quarantined) split on the format column.  Pure filter —
    pushed into the scan, no shuffle."""
    fmt = F.lower(F.col("fmt"))
    # coalesce: a NULL fmt makes isin() NULL, and BOTH filter(p) and
    # filter(~p) drop NULL rows — the document would vanish from the
    # pipeline with no quarantine record, the exact failure the gate
    # exists to prevent.  NULL routes to quarantine.
    ok = F.coalesce(fmt.isin(SUPPORTED_FORMATS), F.lit(False))
    supported = df_raw.filter(ok)
    rejected = df_raw.filter(~ok).withColumn(
        "quarantine_reason",
        F.concat(
            F.lit("unsupported format: "), F.coalesce(F.col("fmt"), F.lit("<null>"))
        ),
    )
    return supported, rejected


def _sheets_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        rows = {"doc_id": [], "sheet_idx": [], "sheet_name": [],
                "n_rows": [], "n_cols": []}
        for r in batch.itertuples(index=False):
            doc = parse_document(str(r.fmt), bytes(r.content))
            for i, sheet in enumerate(doc.sheets):
                rows["doc_id"].append(str(r.doc_id))
                rows["sheet_idx"].append(i)
                rows["sheet_name"].append(sheet.name)
                rows["n_rows"].append(len(sheet.rows))
                rows["n_cols"].append(
                    max((len(x) for x in sheet.rows), default=0)
                )
        yield pd.DataFrame(rows)


def enumerate_sheets(df_raw: DataFrame) -> DataFrame:
    """Sheet inventory (reference ``get_sheet_names``/``get_xls_workbook_info``
    — loader.py:243-262, level1_checker.py:45-65) as a table:
    (doc_id, sheet_idx, sheet_name, n_rows, n_cols)."""
    return df_raw.select("doc_id", "fmt", "content").mapInPandas(
        _sheets_kernel, schema=SHEET_SCHEMA
    )
