"""HTTP redirect resolution (operators/redirects.py): Location
resolution, chain walking with loop flagging, link-graph rewrite, and
the crawl-plan integration over the gen fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.redirects import (
    redirect_edges,
    resolve_redirect_map,
    rewrite_edges_dst,
)


def _records(spark, rows):
    """rows: (url, status, location) → minimal WARC-frame shape."""
    return spark.createDataFrame(
        [
            (f"r{i}", u, "response", s, loc, None)
            for i, (u, s, loc) in enumerate(rows)
        ],
        "doc_id string, url string, warc_type string, http_status int,"
        " http_location string, error string",
    )


def test_redirect_edges_resolution_matrix(spark):
    recs = _records(
        spark,
        [
            # absolute Location
            ("http://a.com/x", 301, "http://b.com/y"),
            # path-absolute (the common case)
            ("http://a.com/deep/page", 302, "/moved"),
            # relative with dot segments
            ("http://a.com/d1/d2/page", 307, "../up"),
            # fragment stripped, host case folded
            ("http://a.com/f", 308, "HTTP://B.COM/z#frag"),
            # 200 and 404 never produce edges
            ("http://a.com/ok", 200, "/ignored"),
            ("http://a.com/gone", 404, "/ignored"),
            # self-redirect is a no-op, not an edge
            ("http://a.com/self", 301, "http://a.com/self"),
        ],
    )
    got = {
        (r.src, r.dst, r.status)
        for r in redirect_edges(recs).collect()
    }
    assert got == {
        ("http://a.com/x", "http://b.com/y", 301),
        ("http://a.com/deep/page", "http://a.com/moved", 302),
        ("http://a.com/d1/d2/page", "http://a.com/d1/up", 307),
        ("http://a.com/f", "http://b.com/z", 308),
    }


def test_resolve_chain_hops_and_terminal(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r.src: (r.final, r.hops, r.cyclic)
        for r in resolve_redirect_map(e, max_hops=8).collect()
    }
    assert got == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
        "x": ("y", 1, False),
    }


def test_resolve_flags_loops(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("into", "a"), ("t", "z")],
        "src string, dst string",
    )
    rm = {r.src: r for r in resolve_redirect_map(e, max_hops=6).collect()}
    assert rm["a"].cyclic and rm["b"].cyclic and rm["into"].cyclic
    assert not rm["t"].cyclic
    assert rm["t"].final == "z"


def test_resolve_duplicate_src_deterministic(spark):
    # two captures of the same URL disagreeing → min dst wins
    e = spark.createDataFrame(
        [("a", "z2"), ("a", "z1")], "src string, dst string"
    )
    rows = resolve_redirect_map(e).collect()
    assert len(rows) == 1 and rows[0].final == "z1"


def test_rewrite_edges_dst(spark):
    graph = spark.createDataFrame(
        [("p1", "old1"), ("p2", "loop1"), ("p3", "plain")],
        "src string, dst string",
    )
    rmap = spark.createDataFrame(
        [("old1", "new1", 1, False), ("loop1", "wher", 6, True)],
        "src string, final string, hops int, cyclic boolean",
    )
    got = {(r.src, r.dst) for r in rewrite_edges_dst(graph, rmap).collect()}
    # resolved alias rewritten, loop left alone, unmapped untouched
    assert got == {("p1", "new1"), ("p2", "loop1"), ("p3", "plain")}


@pytest.fixture(scope="module")
def crawl_out(spark, tmp_path_factory):
    from machine_readability_checker_spark.plans.crawl import crawl_curate
    from machine_readability_checker_spark.sources.fixtures import (
        gen_crawl_warc_files,
    )
    from machine_readability_checker_spark.sources.warc import read_warc

    d = str(tmp_path_factory.mktemp("crawl_redir"))
    expected = gen_crawl_warc_files(d, n_pages=120)
    out = crawl_curate(read_warc(spark, f"{d}/*.warc.gz"), cores=8)
    return expected, out


def test_crawl_gen_redirects_resolve(spark, crawl_out):
    expected, out = crawl_out
    rm = out["redirects"].collect()
    resolved = [r for r in rm if not r.cyclic]
    loops = [r for r in rm if r.cyclic]
    assert len(resolved) == expected["redirects"]
    assert {r.src.rsplit("/", 2)[-2] for r in loops} == {"loop"}
    # the 2-hop chain /older → /old → real resolved to the real URL
    chains = [r for r in resolved if "/older/" in r.src]
    assert chains and all(
        r.hops == 2 and "/old" not in r.final for r in chains
    )


def test_crawl_graph_has_no_alias_nodes(spark, crawl_out):
    """Pages link to /old/ aliases, so graph reconciliation only holds
    if rewrite resolved them back onto canonical nodes."""
    expected, out = crawl_out
    graph = out["graph"]
    assert graph.filter(
        F.col("dst").rlike("/old(er)?/") | F.col("src").rlike("/old(er)?/")
    ).count() == 0
    # every kept page still emits its 2 followable edges
    assert graph.count() == 2 * expected["kept"]
