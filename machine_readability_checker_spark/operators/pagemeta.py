"""Page-metadata harvest: head metadata (title/description/OpenGraph/
canonical/robots-meta/lang) for every crawled page, and the
rel=canonical frontier key real crawlers dedup on.

Two surfaces:

- ``page_metadata(df_pages)``: one narrow Arrow kernel over
  pages(doc_id, url, content[, charset]) → a metadata column per
  field.  ``canonical`` and ``og_image`` resolve against
  ``<base href>``/page URL per RFC 3986 (``core/html.py::
  extract_page_metadata``).  Zero shuffle; parallelism is the page
  corpus's partitioning.
- ``canonical_key(df_meta)``: the frontier dedup key — the page's
  OWN declared ``<link rel=canonical>`` when present (what Google
  honors for duplicate clustering), else the fetched URL, both
  through ``weburl.canonicalize_url`` (pure JVM).  Pages whose
  canonical points off-host keep it (cross-host canonicals are
  valid); a later robots/ownership policy can filter.

No reference analog (the reference reads local files); semantics are
the published rel=canonical (RFC 6596) + OpenGraph protocol.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .weburl import canonicalize_url

PAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("og_title", T.StringType(), True),
        T.StructField("og_description", T.StringType(), True),
        T.StructField("og_image", T.StringType(), True),
        T.StructField("canonical", T.StringType(), True),
        T.StructField("robots", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_FIELDS = [f.name for f in PAGE_META_SCHEMA.fields][2:]


def page_metadata(df_pages: DataFrame) -> DataFrame:
    """pages(doc_id, url, content[, charset]) → PAGE_META_SCHEMA rows.
    Malformed pages yield all-null metadata, never a failed task."""
    from ..core.html import extract_page_metadata

    has_charset = "charset" in df_pages.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                url = str(getattr(row, "url", "") or "")
                charset = (
                    str(getattr(row, "charset", "") or "")
                    if has_charset else ""
                )
                try:
                    meta = extract_page_metadata(
                        bytes(row.content), url, charset
                    )
                except Exception:  # malformed page: all-null metadata
                    meta = {}
                rows.append(
                    (str(row.doc_id), url or None)
                    + tuple(meta.get(k) for k in _FIELDS)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGE_META_SCHEMA.fields]
            )

    return df_pages.mapInPandas(kernel, schema=PAGE_META_SCHEMA)


def canonical_key(df_meta: DataFrame) -> DataFrame:
    """Append ``frontier_key``: canonicalize(rel=canonical) when the
    page declares one, else canonicalize(fetched url) — pure JVM
    expression over the metadata frame, no Python, no shuffle."""
    return df_meta.withColumn(
        "frontier_key",
        F.when(
            F.col("canonical").isNotNull(),
            canonicalize_url(F.col("canonical")),
        ).otherwise(canonicalize_url(F.col("url"))),
    )


def x_robots_noindex(col) -> "F.Column":
    """True when an ``X-Robots-Tag`` HTTP header value opts the page
    out of indexing: any comma-separated directive equal to
    ``noindex``/``none`` after stripping an optional ``agent:`` scope.
    A general-corpus crawler honors ANY bot's opt-out (conservative by
    design — the header's per-agent scoping exists for engines that
    identify as one agent; a training-data pipeline is nobody's
    special case).  Pure JVM predicate."""
    toks = F.split(F.lower(F.coalesce(col, F.lit(""))), ",")
    cleaned = F.transform(
        toks,
        lambda t: F.trim(
            F.regexp_replace(t, r"^\s*[a-z0-9_.\-]+\s*:\s*", "")
        ),
    )
    return F.array_contains(cleaned, "noindex") | F.array_contains(
        cleaned, "none"
    )


def noindex_filter(df_meta: DataFrame) -> DataFrame:
    """Drop pages whose ``<meta name=robots>`` carries ``noindex`` (or
    ``none``, which the robots-meta spec defines as noindex,nofollow) —
    the page author's opt-out a curation pipeline must honor.  Pure
    JVM predicate."""
    tokens = F.split(F.lower(F.coalesce(F.col("robots"), F.lit(""))), r"[,\s]+")
    return df_meta.filter(
        ~F.array_contains(tokens, "noindex")
        & ~F.array_contains(tokens, "none")
    )
