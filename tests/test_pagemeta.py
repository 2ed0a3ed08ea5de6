"""Page metadata harvest (core extract_page_metadata + operators/pagemeta)."""

from __future__ import annotations

from machine_readability_checker_spark.core.html import extract_page_metadata
from machine_readability_checker_spark.operators import pagemeta as PM

_PAGE = b"""<!DOCTYPE html>
<html lang="ja"><head>
<base href="/sub/">
<title>  Page
  Title </title>
<meta name="description" content="first desc">
<meta name="description" content="second desc ignored">
<meta name="robots" content="noindex, follow">
<meta property="og:title" content="OG Title">
<meta property="og:description" content="og desc">
<meta property="og:image" content="img/cover.png">
<link rel="stylesheet alternate" href="/style.css">
<link rel="canonical" href="../canon">
</head><body><p>body</p></body></html>"""


def test_metadata_matrix_with_base_resolution():
    meta = extract_page_metadata(_PAGE, "http://ex.example/a/b/page.html")
    assert meta["title"] == "Page Title"  # whitespace collapsed
    assert meta["description"] == "first desc"  # first wins
    assert meta["robots"] == "noindex, follow"
    assert meta["og_title"] == "OG Title"
    assert meta["og_description"] == "og desc"
    assert meta["lang"] == "ja"
    # base href /sub/ resolves against the page URL, then the
    # relative canonical/og:image against that base (RFC 3986)
    assert meta["canonical"] == "http://ex.example/canon"
    assert meta["og_image"] == "http://ex.example/sub/img/cover.png"


def test_metadata_absent_fields_are_none():
    meta = extract_page_metadata(b"<html><body>x</body></html>", "http://e/")
    assert meta == {
        k: None
        for k in (
            "title", "description", "og_title", "og_description",
            "og_image", "canonical", "robots", "lang",
        )
    }


def test_page_metadata_kernel_and_malformed(spark):
    rows = [
        ("d0", "http://a.example/x", bytearray(_PAGE)),
        ("d1", "http://b.example/y", bytearray(b"\xff\xfe garbage \x00")),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, url string, content binary"
    )
    got = {r.doc_id: r for r in PM.page_metadata(df).collect()}
    assert got["d0"].og_title == "OG Title"
    assert got["d0"].canonical == "http://a.example/canon"
    assert got["d1"].title is None and got["d1"].canonical is None


def test_canonical_key_prefers_declared_canonical(spark):
    df = spark.createDataFrame(
        [
            ("d0", "http://A.example/x?utm_source=t", "http://a.example/canon"),
            ("d1", "http://B.example:80/y#frag", None),
        ],
        "doc_id string, url string, canonical string",
    )
    got = {r.doc_id: r.frontier_key for r in PM.canonical_key(df).collect()}
    assert got["d0"] == "http://a.example/canon"
    assert got["d1"] == "http://b.example/y"

    plan = (
        PM.canonical_key(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan  # pure JVM


def test_noindex_filter(spark):
    df = spark.createDataFrame(
        [
            ("keep1", None),
            ("keep2", "nofollow"),
            ("drop1", "noindex"),
            ("drop2", "NOINDEX, nofollow"),
            ("drop3", "none"),  # spec: none == noindex,nofollow
        ],
        "doc_id string, robots string",
    )
    kept = {r.doc_id for r in PM.noindex_filter(df).collect()}
    assert kept == {"keep1", "keep2"}


def test_x_robots_noindex_directive_forms(spark):
    """Header-form opt-out: unscoped and agent-scoped noindex/none
    block; unrelated directives (nofollow alone, unavailable_after,
    nosnippet) do not; NULL header passes."""
    from pyspark.sql import functions as F

    rows = [
        ("a", "noindex"),
        ("b", "NOINDEX, nofollow"),
        ("c", "googlebot: noindex"),
        ("d", "none"),
        ("e", "nofollow"),
        ("f", "unavailable_after: 25 Jun 2027 15:00:00 PST"),
        ("g", "nosnippet, noarchive"),
        ("h", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, x_robots string")
    blocked = {
        r.doc_id
        for r in df.filter(
            PM.x_robots_noindex(F.col("x_robots"))
        ).collect()
    }
    assert blocked == {"a", "b", "c", "d"}
