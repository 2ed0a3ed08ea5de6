"""HTTP redirect resolution — 3xx ``Location`` chains → a canonical
alias map for frontier dedup and link-graph rewriting.

A real crawl archives its redirect responses alongside the pages:
~5-10% of fetches answer 301/302/307/308, and the link graph is full
of edges pointing at the OLD side of a move.  Without resolution,
PageRank mass strands on alias nodes that have no content and the
frontier treats ``/old`` and its target as distinct pages.  Production
curation (Common Crawl's webgraph, any search-engine canonicalizer)
follows the chains to their terminal URL and rewrites edges through
the map — that is what this module does, Spark-shaped:

- :func:`redirect_edges` — 3xx WARC records → one ``(src, dst)``
  alias edge each, ``Location`` resolved per RFC 9110 §10.2.2 against
  the request URL (RFC 3986 reference resolution — relative and
  path-absolute Locations are common), both endpoints canonicalized.
- :func:`resolve_redirect_map` — follow each chain to its terminal
  URL with a hop cap: every src has exactly ONE outgoing alias edge
  (frontier dedup upstream guarantees it; this function enforces it
  deterministically), so resolution is function iteration — at most
  ``max_hops`` self-joins of the ALIAS table (never the corpus),
  each join broadcast-sized in practice.  Chains still moving at the
  cap are flagged ``cyclic`` (redirect loops are a real-web staple)
  and excluded from rewriting.
- :func:`rewrite_edges_dst` — replace link-graph edge destinations
  through the resolved map (one join keyed on dst; the map side is
  the small one).

100 TB shape: the alias table is a few percent of the page table; all
iteration happens on it alone.  The corpus-sized frames are touched
exactly once each (one filter to harvest, one join to rewrite).

No counterpart in the reference repo (single-process, local
spreadsheet files — ``src/processor/loader.py``); behavior follows the
public RFCs (9110/3986) and the Common Crawl webgraph methodology.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .weburl import canonicalize_url

#: statuses that carry a Location the crawler followed
REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def redirect_edges(records: DataFrame) -> DataFrame:
    """WARC record frame (``sources.warc.WARC_SCHEMA``) → canonical
    alias edges ``(src, dst, status)``, one per 3xx response with a
    ``Location``.  Resolution runs in one Arrow kernel over the tiny
    3xx subset (stdlib ``urljoin`` — the same resolver the HTML link
    harvest uses, so graph keys agree); canonicalization is the JVM
    fold both graph endpoints already go through."""
    rx = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").isin(*REDIRECT_STATUSES)
        & F.col("error").isNull()
        & F.col("url").isNotNull()
        & F.col("http_location").isNotNull()
    ).select("url", "http_location", "http_status")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urldefrag, urljoin

        for pdf in batches:
            dsts = []
            for u, loc in zip(pdf["url"], pdf["http_location"]):
                target, _frag = urldefrag(urljoin(u, loc))
                dsts.append(target)
            yield pd.DataFrame(
                {
                    "src_raw": pdf["url"],
                    "dst_raw": dsts,
                    "status": pdf["http_status"],
                }
            )

    resolved = rx.mapInPandas(
        kernel, schema="src_raw string, dst_raw string, status int"
    )
    return (
        resolved.select(
            canonicalize_url(F.col("src_raw")).alias("src"),
            canonicalize_url(F.col("dst_raw")).alias("dst"),
            "status",
        )
        .filter(F.col("src") != F.col("dst"))  # self-redirect = no-op
    )


def resolve_redirect_map(
    edges: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Alias edges ``(src, dst)`` → ``(src, final, hops, cyclic)``:
    the terminal URL of each chain, the number of redirects followed,
    and whether the chain was still moving at ``max_hops`` (loop).

    Each src keeps ONE deterministic successor (min dst — duplicate
    captures of the same URL can disagree), making the walk a function
    iteration: ``max_hops`` left-joins of the alias table against
    itself, terminal rows riding along unchanged.  Alias-table-sized
    work only; a ``localCheckpoint`` would be overkill at ≤8 joins."""
    e = edges.groupBy("src").agg(F.min("dst").alias("dst"))
    step = e.select(
        F.col("src").alias("cur"), F.col("dst").alias("nxt")
    )
    walk = e.select(
        "src", F.col("dst").alias("cur"), F.lit(1).alias("hops")
    )
    for _ in range(max_hops - 1):
        walk = (
            walk.join(step, "cur", "left")
            .select(
                "src",
                F.coalesce("nxt", "cur").alias("cur"),
                F.when(
                    F.col("nxt").isNotNull(), F.col("hops") + 1
                ).otherwise(F.col("hops")).alias("hops"),
            )
        )
    return walk.join(step, "cur", "left").select(
        "src",
        F.col("cur").alias("final"),
        "hops",
        (F.col("nxt").isNotNull() & (F.col("hops") == max_hops)).alias(
            "cyclic"
        ),
    )


def rewrite_edges_dst(
    graph: DataFrame, redirect_map: DataFrame
) -> DataFrame:
    """Link-graph edges with destinations rewritten through the
    resolved redirect map (non-cyclic entries only — a loop has no
    terminal to rewrite to).  One join keyed on ``dst``; the map side
    is the small one, so at scale this broadcasts (AQE picks it; the
    hint is explicit for the planner-visible contract).  Sources are
    NOT rewritten: an edge's src is a fetched 200 page, which by
    definition did not answer 3xx in the same crawl snapshot."""
    aliases = F.broadcast(
        redirect_map.filter(~F.col("cyclic")).select(
            F.col("src").alias("dst"), F.col("final").alias("_final")
        )
    )
    return (
        graph.join(aliases, "dst", "left")
        .withColumn("dst", F.coalesce("_final", "dst"))
        .drop("_final")
    )
