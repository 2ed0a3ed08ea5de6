"""Link-graph family: anchor harvest, URL resolution, degrees, PageRank."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from machine_readability_checker_spark.core.html import extract_links
from machine_readability_checker_spark.operators import linkgraph as LG


# ---------------------------------------------------------- extract_links


def test_extract_links_resolution_and_filtering():
    html = b"""<html><head><base href="https://ex.co.uk/sub/"></head>
    <body>
    <a href="#top">frag</a>
    <a href="https://other.com/docs/7">abs</a>
    <a href="../docs/9.html">updir</a>
    <a href="rel2">rel</a>
    <a href="/root.html?q=1#sec">rooted</a>
    <a rel="me nofollow" href="http://spam.example/x#frag">nf</a>
    <a href="mailto:a@b">mail</a>
    <a href="javascript:void(0)">js</a>
    <a href="data:text/plain,x">data</a>
    <script><a href="/hidden">no</a></script>
    </body></html>"""
    links = extract_links(html, "https://ex.co.uk/page/1.html")
    assert links == [
        ("https://other.com/docs/7", "abs", False),
        ("https://ex.co.uk/docs/9.html", "updir", False),
        ("https://ex.co.uk/sub/rel2", "rel", False),
        ("https://ex.co.uk/root.html?q=1", "rooted", False),
        ("http://spam.example/x", "nf", True),
    ]


def test_extract_links_no_base_and_anchor_text_normalization():
    html = b'<p><a href="a/b">two\n  words</a><a href="a/b">dup</a></p>'
    links = extract_links(html, "https://h.com/d/page.html")
    # duplicates preserved in document order; whitespace collapsed
    assert links == [
        ("https://h.com/d/a/b", "two words", False),
        ("https://h.com/d/a/b", "dup", False),
    ]


def test_extract_links_malformed_nesting_and_unclosed():
    html = b'<a href="/x">one<a href="/y">two'
    links = extract_links(html, "https://h.com/")
    assert [(u, t) for u, t, _ in links] == [
        ("https://h.com/x", "one"),
        ("https://h.com/y", "two"),
    ]


# ------------------------------------------------------------ graph build


@pytest.fixture(scope="module")
def small_graph(spark):
    # 0→1, 0→2, 1→2, 2→0, 3 dangling (3 has an inlink but no outlinks)
    edges = spark.createDataFrame(
        [
            ("0", "1", "a", False),
            ("0", "2", "b", False),
            ("0", "2", "b-dup", False),  # dup edge: deduped
            ("1", "2", "c", False),
            ("2", "0", "d", False),
            ("2", "2", "self", False),  # self-loop: dropped
            ("1", "3", "e", False),
            ("1", "9", "nf", True),  # nofollow: dropped
        ],
        "src string, dst string, anchor string, nofollow boolean",
    )
    return LG.graph_edges(edges)


def test_graph_edges_dedup_nofollow_selfloop(small_graph):
    got = {(r.src, r.dst) for r in small_graph.collect()}
    assert got == {("0", "1"), ("0", "2"), ("1", "2"), ("2", "0"), ("1", "3")}


def test_degree_stats(small_graph):
    deg = {
        r.node: (r.out_degree, r.in_degree)
        for r in LG.degree_stats(small_graph).collect()
    }
    assert deg == {
        "0": (2, 1),
        "1": (2, 1),
        "2": (1, 2),
        "3": (0, 1),
    }


def _pagerank_numpy(edges, n_iter, damping):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for s, _ in edges:
        out[idx[s]] += 1
    rank = [1.0 / n] * n
    for _ in range(n_iter):
        dangling = sum(r for r, o in zip(rank, out) if o == 0)
        contrib = [0.0] * n
        for s, d in edges:
            contrib[idx[d]] += rank[idx[s]] / out[idx[s]]
        rank = [
            (1.0 - damping) / n + damping * (c + dangling / n)
            for c in contrib
        ]
    return {nodes[i]: rank[i] for i in range(n)}


def test_pagerank_matches_sequential_reference(spark, small_graph):
    edges = [(r.src, r.dst) for r in small_graph.collect()]
    want = _pagerank_numpy(edges, n_iter=7, damping=0.85)
    got = {
        r.node: r.rank
        for r in LG.pagerank(small_graph, n_iter=7, damping=0.85).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), k


def test_pagerank_mass_conserved_and_partition_invariant(spark, small_graph):
    df = LG.pagerank(small_graph, n_iter=5)
    total = df.agg(F.sum("rank")).first()[0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    # partition invariance: same result at a different parallelism
    df2 = LG.pagerank(small_graph.repartition(7), n_iter=5)
    a = {r.node: round(r.rank, 12) for r in df.collect()}
    b = {r.node: round(r.rank, 12) for r in df2.collect()}
    assert a == b


def test_extract_edges_kernel(spark):
    rows = [
        (
            "https://h.com/a",
            (
                b'<html><body><a href="/b">to b</a>'
                b'<a rel="nofollow" href="/c">to c</a></body></html>'
            ),
        ),
        ("https://h.com/empty", b"<html><body>none</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, content binary")
    got = sorted(
        (r.src, r.dst, r.anchor, r.nofollow)
        for r in LG.extract_edges(pages).collect()
    )
    assert got == [
        ("https://h.com/a", "https://h.com/b", "to b", False),
        ("https://h.com/a", "https://h.com/c", "to c", True),
    ]


def test_anchor_texts_topk(spark):
    edges = spark.createDataFrame(
        [
            ("s1", "d1", "click here", False),
            ("s2", "d1", "click here", False),
            ("s3", "d1", "spark engine", False),
            ("s4", "d1", "zz", False),
            ("s5", "d1", "aa", False),
            ("s6", "d1", "", False),      # image link: dropped
            ("s7", "d1", "spam", True),   # nofollow: dropped
            ("s8", "d2", "only one", False),
        ],
        "src string, dst string, anchor string, nofollow boolean",
    )
    got = [
        (r.dst, r.anchor, r.n_occurrences, r.rn)
        for r in LG.anchor_texts(edges, k=3)
        .orderBy("dst", "rn")
        .collect()
    ]
    # count desc, anchor asc tiebreak; k=3 caps d1's four anchors
    assert got == [
        ("d1", "click here", 2, 1),
        ("d1", "aa", 1, 2),
        ("d1", "spark engine", 1, 3),
        ("d2", "only one", 1, 1),
    ]


def test_pagerank_warm_start_converges_to_same_fixed_point(
    spark, small_graph
):
    """Warm-starting from near-converged ranks reaches the same fixed
    point; new/vanished nodes are handled by renormalization (mass
    stays 1 from iteration one)."""
    cold = LG.pagerank(small_graph, n_iter=30)
    warm = LG.pagerank(small_graph, n_iter=3, init_ranks=cold)
    a = {r.node: r.rank for r in cold.collect()}
    b = {r.node: r.rank for r in warm.collect()}
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-6), k
    # init over a DIFFERENT node set: unknown node dropped, missing
    # nodes seeded uniform; mass conserved immediately
    partial = spark.createDataFrame(
        [("0", 0.9), ("ghost", 0.5)], "node string, rank double"
    )
    seeded = LG.pagerank(small_graph, n_iter=1, init_ranks=partial)
    total = seeded.agg(F.sum("rank")).first()[0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_pagerank_tol_stops_early_at_same_answer(spark, small_graph):
    """tol turns on the convergence stop: the loop ends as soon as the
    L1 delta falls to tol, well before the n_iter ceiling, and the
    early-stopped ranks match the full-length run to the same
    tolerance.  info reports rounds actually run + the last delta."""
    info: dict = {}
    early = LG.pagerank(
        small_graph, n_iter=100, tol=1e-10, check_every=2, info=info
    )
    assert info["iterations"] < 100  # actually stopped early
    assert info["last_delta"] is not None and info["last_delta"] <= 1e-10
    full = LG.pagerank(small_graph, n_iter=100)
    a = {r.node: r.rank for r in early.collect()}
    b = {r.node: r.rank for r in full.collect()}
    for k in b:
        assert math.isclose(a[k], b[k], rel_tol=1e-8, abs_tol=1e-10), k
    # tol=None keeps the exact legacy behavior (hard iteration count)
    info2: dict = {}
    legacy = LG.pagerank(small_graph, n_iter=7, info=info2)
    assert info2["iterations"] == 7 and info2["last_delta"] is None
    want = _pagerank_numpy(
        [(r.src, r.dst) for r in small_graph.collect()], 7, 0.85
    )
    got = {r.node: r.rank for r in legacy.collect()}
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), k


def _hits_numpy(edges, n_iter):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = [1.0] * n
    auth = [0.0] * n
    for _ in range(n_iter):
        auth = [0.0] * n
        for s, d in edges:
            auth[idx[d]] += hub[idx[s]]
        an = math.sqrt(sum(a * a for a in auth))
        auth = [a / an if an > 0 else 0.0 for a in auth]
        hub = [0.0] * n
        for s, d in edges:
            hub[idx[s]] += auth[idx[d]]
        hn = math.sqrt(sum(h * h for h in hub))
        hub = [h / hn if hn > 0 else 0.0 for h in hub]
    return {nodes[i]: (hub[i], auth[i]) for i in range(n)}


def test_hits_matches_sequential_reference(spark, small_graph):
    edges = [(r.src, r.dst) for r in small_graph.collect()]
    want = _hits_numpy(edges, n_iter=6)
    got = {
        r.node: (r.hub, r.authority)
        for r in LG.hits(small_graph, n_iter=6).collect()
    }
    assert set(got) == set(want)
    for k, (h, a) in want.items():
        assert math.isclose(got[k][0], h, rel_tol=1e-10, abs_tol=1e-12), k
        assert math.isclose(got[k][1], a, rel_tol=1e-10, abs_tol=1e-12), k
    # pure sink "3" is a valid authority but a zero hub
    assert got["3"][0] == 0.0 and got["3"][1] > 0
    # L2 norms are 1
    assert math.isclose(sum(h * h for h, _ in got.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(a * a for _, a in got.values()), 1.0, rel_tol=1e-9)
