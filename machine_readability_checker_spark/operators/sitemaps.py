"""Sitemap parsing (sitemaps.org XML protocol): the discovery-side
complement to robots.txt politeness — a crawl frontier seeds itself
from `<urlset>` / `<sitemapindex>` documents.

Parsing is stdlib ``xml.etree`` inside an Arrow-batched kernel (same
fail-soft contract as every codec here: malformed XML → one quarantine
row, never a task failure).  Namespace handling is tolerant — real
sitemaps carry the 0.9 namespace, no namespace, or vendor extensions —
and entity limits are the stdlib's (billion-laughs expansion is
rejected by ElementTree's default parser).

Scale shape: one sitemap file = one kernel row (sitemap files are
≤50 MB/50k URLs by spec); the explode to URL rows is the kernel's
output, no shuffle.  Index files chain: ``sitemap_urls`` emits their
children as ``kind='sitemap'`` rows for the caller's next fetch round
(frontier iteration is the crawler's loop, not a hidden recursion
here).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

URLS_SCHEMA = (
    "source_url string, kind string, loc string, lastmod string, "
    "changefreq string, priority double, error string"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(
    data: bytes,
) -> List[Tuple[str, str, Optional[str], Optional[str], Optional[float]]]:
    """Sitemap XML → ordered entry tuples
    ``(kind, loc, lastmod, changefreq, priority)`` where kind is
    ``url`` (from `<urlset>`) or ``sitemap`` (from `<sitemapindex>`).
    Raises ``ValueError`` on malformed XML or a non-sitemap root."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"sitemap: XML parse error: {e}") from None
    root_tag = _local(root.tag)
    if root_tag == "urlset":
        child_tag, kind = "url", "url"
    elif root_tag == "sitemapindex":
        child_tag, kind = "sitemap", "sitemap"
    else:
        raise ValueError(f"sitemap: unexpected root element <{root_tag}>")

    out = []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        fields = {_local(c.tag): (c.text or "").strip() for c in child}
        loc = fields.get("loc", "")
        if not loc:
            continue  # spec: <loc> is required; skip junk entries
        prio = None
        if fields.get("priority"):
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        out.append(
            (
                kind,
                loc,
                fields.get("lastmod") or None,
                fields.get("changefreq") or None,
                prio,
            )
        )
    return out


def sitemap_urls(
    df: DataFrame, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """(sitemap url, xml bytes) rows → one row per entry
    (source_url, kind, loc, lastmod, changefreq, priority, error);
    malformed documents yield a single quarantine row with ``error``
    set.  One Arrow kernel, zero shuffles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "source_url", "kind", "loc", "lastmod", "changefreq",
            "priority", "error",
        ]
        for batch in batches:
            rows = []
            for src, content in zip(batch[url_col], batch[content_col]):
                blob = bytes(content) if content is not None else b""
                try:
                    for kind, loc, lastmod, cf, prio in parse_sitemap(blob):
                        rows.append(
                            (src, kind, loc, lastmod, cf, prio, None)
                        )
                except ValueError as e:
                    rows.append((src, None, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(url_col, content_col).mapInPandas(
        kernel, schema=URLS_SCHEMA
    )
