"""Link-graph operators: edge extraction, degree statistics, PageRank.

The web-scale curation loop the reference's single-file checker never
needed: crawled pages carry hyperlinks, and corpus quality work
(RefinedWeb/CCNet-style) uses the induced graph — in/out degrees for
spam heuristics, PageRank as a document prior.  Everything here is
built from the crawl lanes this repo already has (`core.html`
anchor harvest, `core.warc` pages, `weburl.parse_url`).

Scale design (the part that must survive 10^12 documents):

- ``extract_edges``: ONE Arrow-batched ``mapInPandas`` over pages —
  per-page Python parses HTML (CPU-bound, embarrassingly parallel),
  emits (src, dst, anchor, nofollow) rows.  No shuffle; edge dedup is
  deferred to the graph build where it is one exchange over the much
  smaller edge list.
- ``degree_stats``: union of the two projections + one hash aggregate
  keyed on node (map-side partial combine) — NOT a self-join of edges.
- ``pagerank``: the classic bulk-synchronous iteration expressed so
  each round is exactly one shuffle: contributions = edges ⋈ ranks on
  ``src`` (both sides hash-partitioned on the same key once, so the
  join itself reuses the exchange), then ``groupBy dst`` re-shuffles
  by destination.  Dangling mass (nodes with no outlinks) is a scalar
  aggregate broadcast back into the update expression (a 1-row cross
  join, not a driver round-trip).  Lineage is cut with a lazy
  ``localCheckpoint`` per iteration so the twice-referenced rank table
  is shared, not a doubling expression tree.
  Skewed in-degree (every page links to the homepage) stays safe: the
  per-dst aggregate does map-side combine, so a hot destination
  receives one partial per upstream partition, not one row per edge.

Reference parity note: no analog in the reference (it audits one
uploaded table at a time, `src/app/app.py:51-295`); this family is the
training-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

EDGE_SCHEMA = "src string, dst string, anchor string, nofollow boolean"


def extract_edges(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
    charset_col: Optional[str] = None,
) -> DataFrame:
    """Crawled pages (url, html bytes) → hyperlink edge rows
    (src, dst, anchor, nofollow), one Arrow-batched kernel, zero
    shuffles.  Fragment-only, javascript:/mailto:/data: and non-http
    destinations are already dropped by ``core.html.extract_links``;
    duplicate hrefs survive (frontier scheduling wants them; graph
    builds dedup with one DISTINCT over edges)."""
    cols = [F.col(url_col).alias("url"), F.col(content_col).alias("content")]
    if charset_col:
        cols.append(F.col(charset_col).alias("charset"))
    else:
        cols.append(F.lit("").alias("charset"))
    src = pages.select(*cols)

    def kernel(batches):
        import pandas as _pd

        from machine_readability_checker_spark.core.html import (
            extract_links,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                for dst, anchor, nofollow in extract_links(
                    content, r.url or "", r.charset or ""
                ):
                    rows.append((r.url, dst, anchor, nofollow))
            yield _pd.DataFrame(
                rows, columns=["src", "dst", "anchor", "nofollow"]
            )

    return src.mapInPandas(kernel, schema=EDGE_SCHEMA)


def graph_edges(
    edges: DataFrame, follow_only: bool = True, drop_self: bool = True
) -> DataFrame:
    """Raw anchor rows → the deduplicated directed graph (src, dst):
    DISTINCT pairs, optionally honoring rel=nofollow and dropping
    self-loops.  One exchange on (src, dst)."""
    e = edges
    if follow_only and "nofollow" in e.columns:
        e = e.filter(~F.col("nofollow"))
    e = e.select("src", "dst")
    if drop_self:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.distinct()


def extract_wiki_edges(
    pages: DataFrame,
    title_col: str = "title",
    content_col: str = "content",
) -> DataFrame:
    """Wiki articles (title, wikitext bytes) → wikilink edge rows
    (src, dst, anchor) — the Wikipedia-link-graph twin of
    ``extract_edges``; the whole downstream family (build_graph /
    degree_stats / pagerank / hits / anchor_texts) runs unchanged on
    titles instead of URLs.  Same shape: one Arrow-batched kernel,
    zero shuffles; duplicate mentions survive (anchor profiles want
    them; graph builds dedup with one DISTINCT)."""
    src = pages.select(
        F.col(title_col).alias("title"),
        F.col(content_col).alias("content"),
    )

    def kernel(batches):
        import pandas as _pd

        from machine_readability_checker_spark.core.wikitext import (
            extract_wiki_links,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                for dst, anchor in extract_wiki_links(content):
                    rows.append((r.title, dst, anchor))
            yield _pd.DataFrame(rows, columns=["src", "dst", "anchor"])

    return src.mapInPandas(kernel, schema="src string, dst string, "
                                          "anchor string")


def degree_stats(graph: DataFrame) -> DataFrame:
    """(src, dst) graph → per-node (node, out_degree, in_degree).

    Union of the two one-column projections tagged with which end the
    node appeared at, then ONE hash aggregate — the union is
    map-side-only, so the whole statistic costs a single shuffle keyed
    on node.  Nodes appear whether or not they have both directions
    (a pure source has in_degree 0, a pure sink out_degree 0)."""
    ends = graph.select(
        F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        graph.select(
            F.col("dst").alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")
        )
    )
    return ends.groupBy("node").agg(
        F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree")
    )


def pagerank(
    graph: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    num_partitions: Optional[int] = None,
    init_ranks: Optional[DataFrame] = None,
    tol: Optional[float] = None,
    check_every: int = 1,
    info: Optional[dict] = None,
) -> DataFrame:
    """(src, dst) edge list → (node, rank) after ``n_iter`` synchronous
    PageRank iterations with uniform teleport and dangling-mass
    redistribution (ranks sum to 1 every iteration).

    Plan shape per iteration (the 100 TB contract):

    1. ``contribs = edges ⋈ ranks ON src`` — edges are repartitioned
       on ``src`` ONCE and cached; ranks leave each iteration already
       hash-partitioned, so Catalyst reuses the exchange instead of
       re-shuffling the (huge) edge side every round.
    2. ``groupBy(dst).sum`` — one exchange, map-side partial combine
       defuses in-degree skew (the homepage problem).
    3. dangling mass = a ONE-ROW aggregate over sink-node ranks,
       broadcast-cross-joined into the update — it stays inside the
       plan (no per-iteration driver action, which would re-trigger
       the whole lineage as a separate job every round).
    4. new rank = (1-d)/N + d * (contrib + dangling/N) — a narrow map
       over the node table left-joined with contribs.

    Each iteration's rank table is ``localCheckpoint``'d (lazy): the
    next iteration references it TWICE (contribution join + dangling
    aggregate), and the checkpoint makes that a shared materialized
    RDD instead of a doubling expression tree — without it the plan
    re-derives 2^k subtrees by iteration k.  The only driver-side
    scalar is N (one count); per-node data never collects.

    ``init_ranks`` (node, rank) warm-starts the iteration — the
    incremental-recrawl path: yesterday's converged ranks are a far
    better starting point than uniform, so a lightly-changed graph
    needs 2-3 iterations instead of 10+.  Ranks are renormalized over
    the CURRENT node set (new nodes get the uniform prior, vanished
    nodes' mass is redistributed by the normalization), so mass still
    sums to 1 from iteration one.

    ``tol`` turns on a convergence stop: every ``check_every``
    iterations the L1 delta ``Σ|rank_t − rank_{t−1}|`` is computed
    (one join on the already-co-partitioned rank tables + a one-row
    aggregate — the only thing that crosses to the driver is a single
    double) and iteration ends early once it falls to ``tol`` or
    below.  ``n_iter`` stays the hard upper bound, so the worst case
    is unchanged; at 10^12 nodes set ``check_every`` ≥ 2 to amortize
    the extra action.  ``info`` (a caller-supplied dict) receives
    ``iterations`` (rounds actually run) and ``last_delta``."""
    edges = graph.select("src", "dst")
    if num_partitions:
        edges = edges.repartition(num_partitions, "src")
    else:
        edges = edges.repartition("src")
    edges = edges.persist()

    nodes = (
        graph.select(F.col("src").alias("node"))
        .unionAll(graph.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = graph.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    # node table with out_degree (0 = dangling sink), partitioned on node
    base = (
        nodes.join(out_deg, "node", "left")
        .fillna(0, subset=["out_degree"])
        .withColumn("is_sink", F.col("out_degree") == 0)
        .repartition("node")
        .persist()
    )
    n_nodes = base.count()  # O(1) scalar; also materializes the cache
    if n_nodes == 0:
        return base.select("node", F.lit(0.0).alias("rank")).limit(0)

    if init_ranks is None:
        ranks = base.withColumn("rank", F.lit(1.0 / n_nodes))
    else:
        seeded = base.join(
            init_ranks.select(
                "node", F.col("rank").alias("_r0")
            ),
            "node",
            "left",
        ).withColumn(
            "_r0", F.coalesce(F.col("_r0"), F.lit(1.0 / n_nodes))
        )
        total = F.broadcast(
            seeded.agg(F.sum("_r0").alias("_tot"))
        )
        ranks = (
            seeded.crossJoin(total)
            .withColumn("rank", F.col("_r0") / F.col("_tot"))
            .drop("_r0", "_tot")
        )
    it_done, last_delta, ckpted = 0, None, False
    for it in range(n_iter):
        if not ckpted:
            ranks = ranks.localCheckpoint(eager=False)
        ckpted = False
        prev = ranks
        dang = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("is_sink"), F.col("rank"))), F.lit(0.0)
            ).alias("_dangling")
        )
        contribs = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    # sinks never match an edge src, but ANSI mode
                    # evaluates the projection before the join filters
                    # them — guard the division
                    F.when(
                        F.col("out_degree") > 0,
                        F.col("rank") / F.col("out_degree"),
                    ).alias("w"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("contrib"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))  # 1 row: the dangling scalar
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.col("_dangling") / F.lit(float(n_nodes))
                ),
            )
            .select("node", "out_degree", "is_sink", "rank")
        )
        it_done = it + 1
        if tol is not None and (it + 1) % max(check_every, 1) == 0:
            # checkpoint now so the delta action materializes the SAME
            # rdd the next iteration (or the caller) reuses — the check
            # adds one join + scalar agg, never a recompute
            ranks = ranks.localCheckpoint(eager=False)
            ckpted = True
            last_delta = (
                ranks.select("node", "rank")
                .join(
                    prev.select("node", F.col("rank").alias("_pr")),
                    "node",
                )
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("rank") - F.col("_pr"))),
                        F.lit(0.0),
                    ).alias("_d")
                )
                .first()[0]
            )
            if last_delta <= tol:
                break
    if info is not None:
        info["iterations"] = it_done
        info["last_delta"] = last_delta
    return ranks.select("node", "rank")


def anchor_texts(
    edges: DataFrame, k: int = 3, follow_only: bool = True
) -> DataFrame:
    """Per-target anchor-text profile: the top-k distinct anchor texts
    pointing at each destination with occurrence counts →
    (dst, anchor, n_occurrences, rn).  Anchor text is how the REST of
    the web describes a page — classic IR document-expansion signal
    (and a spam tell when thousands of sources repeat one phrase).

    Scale shape: ONE hash aggregate on (dst, anchor) — map-side combine
    absorbs the hot-anchor skew ("click here" at billions of
    occurrences arrives as one partial per task) — then a per-dst
    window that WindowGroupLimit prunes map-side.  Empty anchors
    (image links) are dropped; ties break on anchor text for
    determinism."""
    from pyspark.sql import Window

    e = edges
    if follow_only and "nofollow" in e.columns:
        e = e.filter(~F.col("nofollow"))
    counts = (
        e.filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.desc("n_occurrences"), F.asc("anchor")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "dst",
            "anchor",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def hits(
    graph: DataFrame,
    n_iter: int = 10,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Kleinberg's HITS over a (src, dst) edge list → (node, hub,
    authority) after ``n_iter`` synchronous iterations with L2
    normalization each half-step (the convergent formulation).

    PageRank ranks by random-surfer mass; HITS separates "pages that
    POINT at good content" (hubs) from "pages good content points AT"
    (authorities) — the directory-vs-article distinction a curation
    pipeline uses to pick seed lists vs keep lists.

    Plan shape per iteration — the same contract as ``pagerank``:

    * authority update: edges ⋈ hubs on ``src`` → groupBy ``dst`` sum
      (one reused-exchange join + one partial-combine aggregate);
    * hub update: edges ⋈ authorities on ``dst`` → groupBy ``src`` sum
      (symmetric);
    * each L2 norm is a ONE-ROW aggregate broadcast-cross-joined back
      (no driver action);
    * the score table is lazily ``localCheckpoint``'d per iteration —
      it is referenced by both half-steps AND its own norm aggregate,
      so without the barrier the plan doubles per round."""
    edges = graph.select("src", "dst")
    if num_partitions:
        edges = edges.repartition(num_partitions, "src")
    else:
        edges = edges.repartition("src")
    edges = edges.persist()

    nodes = (
        graph.select(F.col("src").alias("node"))
        .unionAll(graph.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        ).limit(0)

    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    )
    for _ in range(n_iter):
        scores = scores.localCheckpoint(eager=False)
        # authority(v) = Σ hub(u) over u→v, then L2-normalize
        auth_raw = (
            edges.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        auth = (
            nodes.join(auth_raw, "node", "left")
            .withColumn("_a", F.coalesce(F.col("_a"), F.lit(0.0)))
        )
        a_norm = auth.agg(
            F.sqrt(F.sum(F.col("_a") * F.col("_a"))).alias("_an")
        )
        auth = (
            auth.crossJoin(F.broadcast(a_norm))
            .withColumn(
                "authority",
                F.when(F.col("_an") > 0, F.col("_a") / F.col("_an"))
                .otherwise(F.lit(0.0)),
            )
            .select("node", "authority")
            .localCheckpoint(eager=False)
        )
        # hub(u) = Σ authority(v) over u→v, then L2-normalize
        hub_raw = (
            edges.join(
                auth.select(F.col("node").alias("dst"), "authority"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("_h"))
        )
        hub = (
            nodes.join(hub_raw, "node", "left")
            .withColumn("_h", F.coalesce(F.col("_h"), F.lit(0.0)))
        )
        h_norm = hub.agg(
            F.sqrt(F.sum(F.col("_h") * F.col("_h"))).alias("_hn")
        )
        hub = (
            hub.crossJoin(F.broadcast(h_norm))
            .withColumn(
                "hub",
                F.when(F.col("_hn") > 0, F.col("_h") / F.col("_hn"))
                .otherwise(F.lit(0.0)),
            )
            .select("node", "hub")
        )
        scores = hub.join(auth, "node")
    return scores.select("node", "hub", "authority")
