"""End-to-end web-crawl curation plan: WARC records → robots-filtered,
frontier-deduplicated pages → extracted spans → link graph + PageRank
prior.

This is the composition the individual web operators exist for — the
Common-Crawl-style path from raw crawl archives to a curated page table
a training pipeline consumes:

1. split the record stream into HTML responses and robots.txt bodies
   (both arrive in the same crawl);
2. parse robots rules once per domain (Arrow kernel over the tiny
   robots subset) and evaluate crawl permission relationally —
   the rules broadcast, the page table never shuffles for the filter;
3. canonicalize URLs (JVM fold) and collapse frontier duplicates —
   one row per canonical URL, kept deterministically (min doc_id),
   with the per-URL window pruned map-side (WindowGroupLimit);
4. extract spans through the shared salted-repartition kernel
   (identical path to jobs/extract.py — skew-immune);
5. harvest hyperlinks, canonicalize BOTH endpoints, and compute
   degrees + PageRank over the canonical graph.

Shuffle budget end-to-end (excluding PageRank's per-iteration pair):
robots broadcast (0 corpus exchanges) + 1 frontier window + 1 salted
repartition + 1 edge distinct + 1 degree aggregate — every other step
is a narrow map or an Arrow kernel.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window, functions as F

from ..operators import linkgraph as LG
from ..operators import weburl as WU
from ..operators.extract import extract
from ..operators.repartition import salted_repartition
from ..operators.robots import robots_allowed, robots_rules
from ..sources.warc import warc_to_docs_raw


def _with_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    p = WU.parse_url(F.col(url_col))
    path = F.regexp_extract(F.col(url_col), WU._PATH_RE, 1)
    return df.withColumn("domain", p["host"]).withColumn(
        "path", F.when(path == "", F.lit("/")).otherwise(path)
    )


def crawl_curate(
    records: DataFrame,
    agent: str = "*",
    pr_iters: int = 5,
    cores: int = 8,
    sniff: bool = False,
    honor_canonical: bool = False,
    honor_noindex: bool = False,
    structured: bool = False,
) -> Dict[str, DataFrame]:
    """WARC record frame (``sources.warc.WARC_SCHEMA``) → the curated
    outputs: ``pages`` (canonical URL, robots verdict survived, degree
    + rank prior), ``spans`` (extraction output), ``graph`` (canonical
    edges), ``ranks``, and the intermediate ``blocked``/``dups``
    diagnostic frames the job's stats line counts.

    ``sniff=True`` routes extraction lanes on magic-byte content
    sniffing instead of the server's Content-Type header (see
    ``sources.warc.warc_to_docs_raw``).

    ``honor_canonical=True`` deduplicates the frontier on each page's
    DECLARED ``<link rel=canonical>`` when present (RFC 6596 — what
    production crawlers cluster duplicates on), falling back to the
    canonicalized fetched URL.  Costs one extra Arrow kernel pass
    (head-metadata harvest) over the kept-candidate pages.

    ``honor_noindex=True`` honors ``<meta name=robots>`` ``noindex``:
    such pages leave the corpus outputs (``pages``/``spans``, returned
    also as the ``noindex`` diagnostic frame) but still feed the link
    graph — noindex is an indexing opt-out, not nofollow.  Shares the
    metadata kernel with ``honor_canonical``.

    ``structured=True`` additionally harvests schema.org annotations
    (JSON-LD + microdata, ``operators.structdata``) from the corpus
    pages into a ``structdata`` frame — one more narrow Arrow kernel
    over the already-kept pages, nothing upstream changes."""
    html = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("error").isNull()
        & F.col("content").isNotNull()
    )
    robots_bodies = _with_parts(
        html.filter(F.col("url").rlike(r"^[^?#]*/robots\.txt$"))
    ).select("domain", "content")
    pages_raw = _with_parts(
        html.filter(~F.col("url").rlike(r"^[^?#]*/robots\.txt$"))
    ).withColumn("canonical_url", WU.canonicalize_url(F.col("url")))
    meta = None
    if honor_canonical or honor_noindex:
        # ONE metadata harvest kernel serves both policies
        from ..operators.pagemeta import page_metadata

        meta = page_metadata(
            pages_raw.select("doc_id", "url", "content", "charset")
        )
    if honor_canonical:
        # frontier key = the page's declared rel=canonical (resolved +
        # canonicalized), else the fetched URL's canonical form; the
        # preference itself is a JVM expression
        from ..operators.pagemeta import canonical_key

        keyed = canonical_key(meta).select("doc_id", "frontier_key")
        pages_raw = (
            pages_raw.drop("canonical_url")
            .join(keyed, "doc_id", "left")
            .withColumn(
                "canonical_url",
                F.coalesce(
                    F.col("frontier_key"),
                    WU.canonicalize_url(F.col("url")),
                ),
            )
            .drop("frontier_key")
        )

    # robots: parse once per domain, broadcast the rules, evaluate
    # relationally — the page table is never shuffled for this filter
    rules = robots_rules(robots_bodies)
    verdicts = robots_allowed(
        pages_raw.select("doc_id", "domain", "path"), rules, agent=agent
    ).select("doc_id", "allowed")
    pages_v = pages_raw.join(verdicts, "doc_id", "left").withColumn(
        "allowed", F.coalesce(F.col("allowed"), F.lit(True))
    )
    blocked = pages_v.filter(~F.col("allowed"))
    allowed = pages_v.filter(F.col("allowed"))

    # frontier dedup: one page per canonical URL, deterministic winner
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    with_rn = allowed.withColumn("_rn", F.row_number().over(w))
    dups = with_rn.filter(F.col("_rn") > 1).drop("_rn")
    kept = with_rn.filter(F.col("_rn") == 1).drop("_rn")

    # noindex (meta robots) is an INDEXING opt-out, not a crawl ban:
    # such pages leave the corpus (pages/spans) but still pass link
    # juice — the graph below harvests from `kept`, corpus stages from
    # `corpus_kept` (real-crawler semantics: noindex ≠ nofollow)
    noindex = None
    corpus_kept = kept
    if honor_noindex:
        from ..operators.pagemeta import noindex_filter, x_robots_noindex

        indexable = noindex_filter(meta).select("doc_id")
        if "x_robots" in records.columns:
            # the HTTP-header form: X-Robots-Tag noindex/none drops the
            # page from the corpus exactly like <meta robots>
            hdr_blocked = records.filter(
                x_robots_noindex(F.col("x_robots"))
            ).select("doc_id")
            indexable = indexable.join(hdr_blocked, "doc_id", "left_anti")
        noindex = kept.join(indexable, "doc_id", "left_anti")
        corpus_kept = kept.join(indexable, "doc_id", "left_semi")

    # extraction: identical kernel + skew treatment as jobs/extract.py;
    # docs_raw is also returned so the job can route it through the
    # manifest-committed resumable runner instead (--resume-spans)
    docs_raw = warc_to_docs_raw(
        records.join(corpus_kept.select("doc_id"), "doc_id", "left_semi"),
        sniff=sniff,
    )
    spans = extract(salted_repartition(docs_raw, cores))

    # link graph over canonical endpoints
    edges_raw = LG.extract_edges(
        kept.select("url", "content", "charset"), charset_col="charset"
    )
    edges_canon = edges_raw.select(
        WU.canonicalize_url(F.col("src")).alias("src"),
        WU.canonicalize_url(F.col("dst")).alias("dst"),
        "anchor",
        "nofollow",
    )
    # redirect resolution: the crawl's own 3xx records become an alias
    # map (Location resolved + canonicalized, chains followed to their
    # terminal, loops flagged) and edge DESTINATIONS rewrite through it
    # — rank mass lands on the page that actually has content instead
    # of stranding on moved URLs.  Alias-table-sized work; the corpus
    # frames are untouched.
    from ..operators import redirects as RD

    redirect_map = RD.resolve_redirect_map(RD.redirect_edges(records))
    edges_canon = RD.rewrite_edges_dst(edges_canon, redirect_map)
    graph = LG.graph_edges(edges_canon)
    deg = LG.degree_stats(graph)
    ranks = LG.pagerank(graph, n_iter=pr_iters)

    # degree/rank join on the GRAPH's node key — the canonicalized
    # FETCHED url.  With honor_canonical the frontier key
    # (canonical_url) may be the page's declared rel=canonical, which
    # is not what edges_canon keyed nodes on; joining on it would
    # silently null out exactly the canonical-declaring pages' ranks
    pages = (
        corpus_kept.select(
            "doc_id", "url", "canonical_url", "domain", "path"
        )
        .withColumn("_node", WU.canonicalize_url(F.col("url")))
        .join(deg.withColumnRenamed("node", "_node"), "_node", "left")
        .join(ranks.withColumnRenamed("node", "_node"), "_node", "left")
        .drop("_node")
        .fillna(0, subset=["out_degree", "in_degree"])
    )
    structdata = None
    if structured:
        from ..operators.structdata import structured_data

        structdata = structured_data(
            corpus_kept.select("doc_id", "url", "content", "charset")
        )

    return {
        "pages": pages,
        "spans": spans,
        "docs_raw": docs_raw,
        "graph": graph,
        "ranks": ranks,
        "blocked": blocked,
        "dups": dups,
        "redirects": redirect_map,
        "noindex": noindex,
        "structdata": structdata,
    }
