"""RSS 2.0 / Atom feed parsing: the push-side discovery channel next
to sitemaps — news/blog crawls seed and refresh their frontier from
syndication feeds, which also carry the publication timestamps a
freshness-aware curation pipeline orders by.

Parsing is stdlib ``xml.etree`` inside an Arrow-batched kernel, same
fail-soft contract as the sitemap lane (malformed XML → one quarantine
row, never a task failure); dialect is auto-detected from the root
element (``rss``/``feed``), namespaces handled by local-name matching.
Dates normalize to UTC ISO-8601 strings from both conventions —
RFC 822 (RSS ``pubDate``, via ``email.utils``) and RFC 3339 (Atom
``published``/``updated``) — with the raw string preserved; an
unparseable date is data, not an error.

Scale shape: one feed document = one kernel row; the explode to entry
rows is the kernel's output, no shuffle.  Formats are the published
RSS 2.0 spec and RFC 4287 (Atom); no reference analog.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

ENTRIES_SCHEMA = (
    "feed_url string, dialect string, entry_idx int, url string, "
    "title string, published_raw string, published_utc string, "
    "error string"
)


def _local(tag) -> str:
    return str(tag).rsplit("}", 1)[-1].lower()


def _norm_date(raw: Optional[str]) -> Optional[str]:
    """RFC 822 or RFC 3339 date string → 'YYYY-MM-DD HH:MM:SS' UTC, or
    None when absent/unparseable (an unparseable date is data)."""
    if not raw:
        return None
    raw = raw.strip()
    from datetime import timezone

    try:  # RFC 3339 / ISO-8601 (Atom)
        from datetime import datetime

        dt = datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        try:  # RFC 822 (RSS pubDate)
            from email.utils import parsedate_to_datetime

            dt = parsedate_to_datetime(raw)
        except (TypeError, ValueError):
            return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def parse_feed(
    data: bytes,
) -> Tuple[str, List[Tuple[Optional[str], Optional[str], Optional[str]]]]:
    """Feed XML → (dialect, [(url, title, published_raw), ...]) in
    document order.  Raises ``ValueError`` on malformed XML or a root
    that is neither ``<rss>`` nor Atom ``<feed>``."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"feed: XML parse error: {e}") from None
    kind = _local(root.tag)
    out: List[Tuple[Optional[str], Optional[str], Optional[str]]] = []
    if kind == "rss":
        for item in root.iter():
            if _local(item.tag) != "item":
                continue
            link = title = pub = None
            for ch in item:
                t = _local(ch.tag)
                if t == "link" and link is None:
                    link = (ch.text or "").strip() or None
                elif t == "title" and title is None:
                    title = " ".join((ch.text or "").split()) or None
                elif t == "pubdate" and pub is None:
                    pub = (ch.text or "").strip() or None
            out.append((link, title, pub))
        return "rss", out
    if kind == "feed":
        for entry in root.iter():
            if _local(entry.tag) != "entry":
                continue
            link = alt_link = title = pub = updated = None
            for ch in entry:
                t = _local(ch.tag)
                if t == "link":
                    rel = (ch.get("rel") or "alternate").lower()
                    href = (ch.get("href") or "").strip() or None
                    if rel == "alternate" and alt_link is None:
                        alt_link = href
                    if link is None:
                        link = href
                elif t == "title" and title is None:
                    title = " ".join((ch.text or "").split()) or None
                elif t == "published" and pub is None:
                    pub = (ch.text or "").strip() or None
                elif t == "updated" and updated is None:
                    updated = (ch.text or "").strip() or None
            # Atom: rel=alternate wins; published outranks updated
            out.append((alt_link or link, title, pub or updated))
        return "atom", out
    raise ValueError(f"feed: unsupported root element <{kind}>")


def feed_entries(
    df: DataFrame, content_col: str = "content", url_col: str = "url"
) -> DataFrame:
    """feeds(url, content) → one row per entry (ENTRIES_SCHEMA); a
    malformed feed yields one quarantine row with ``error`` set."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "feed_url", "dialect", "entry_idx", "url", "title",
            "published_raw", "published_utc", "error",
        ]
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[url_col], pdf[content_col]):
                src = str(src or "")
                try:
                    dialect, entries = parse_feed(bytes(blob))
                except Exception as e:
                    rows.append(
                        (src, None, -1, None, None, None, None, str(e))
                    )
                    continue
                for i, (link, title, pub) in enumerate(entries):
                    rows.append(
                        (src, dialect, i, link, title, pub,
                         _norm_date(pub), None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(kernel, schema=ENTRIES_SCHEMA)
