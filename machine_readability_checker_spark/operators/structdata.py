"""Structured-data (schema.org) harvest over a crawled-page corpus.

``structured_data(df_pages)`` runs the stdlib JSON-LD + microdata
parser (``core/structdata.py``) as one Arrow-batched ``mapInPandas``
kernel over pages ``(doc_id, url, content[, charset])`` and explodes
every entity property into a row — the relational shape downstream
curation joins on (entity-type histograms, per-domain product/recipe
coverage, supervised-pair mining).

At 100 TB this is a narrow map: no shuffle, parallelism is the page
corpus's partitioning, per-page item/depth caps bound adversarial
nesting, and malformed pages yield zero rows rather than failed tasks.
The WAT-style analog: Common Crawl publishes this channel as WAT
metadata; Web Data Commons mines it the same way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

STRUCT_DATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("item_id", T.IntegerType(), False),
        T.StructField("prop_idx", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("item_type", T.StringType(), True),
        T.StructField("prop", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)


def structured_data(df_pages: DataFrame) -> DataFrame:
    """pages(doc_id, url, content[, charset]) → one row per entity
    property (items without properties still yield one row with a
    NULL prop, so type-only entities stay countable).  ``item_id`` is
    the entity's document-order index (JSON-LD entities first, then
    microdata), ``prop_idx`` the property's order within it."""
    from ..core.structdata import parse_structured_data

    has_charset = "charset" in df_pages.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                url = str(getattr(row, "url", "") or "") or None
                charset = (
                    str(getattr(row, "charset", "") or "")
                    if has_charset else ""
                )
                try:
                    items = parse_structured_data(
                        bytes(row.content), charset
                    )
                except Exception:  # malformed page: no rows
                    items = []
                for ii, item in enumerate(items):
                    if not item["props"]:
                        rows.append(
                            (str(row.doc_id), url, ii, 0,
                             item["format"], item["type"], None, None)
                        )
                    for pi, (nm, val) in enumerate(item["props"]):
                        rows.append(
                            (str(row.doc_id), url, ii, pi,
                             item["format"], item["type"], nm, val)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in STRUCT_DATA_SCHEMA.fields]
            )

    return df_pages.mapInPandas(kernel, schema=STRUCT_DATA_SCHEMA)
