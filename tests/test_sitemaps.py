"""Sitemap XML parsing: protocol shapes, tolerance, quarantine."""

from __future__ import annotations

import pytest

from machine_readability_checker_spark.operators.sitemaps import (
    parse_sitemap,
    sitemap_urls,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_urlset_full_fields():
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
    <urlset {NS}>
      <url><loc>https://a.com/1</loc><lastmod>2026-01-02</lastmod>
           <changefreq>daily</changefreq><priority>0.8</priority></url>
      <url><loc>https://a.com/2</loc></url>
      <url><priority>0.5</priority></url>
    </urlset>"""
    got = parse_sitemap(xml.encode())
    # entry without <loc> is skipped (spec: loc required)
    assert got == [
        ("url", "https://a.com/1", "2026-01-02", "daily", 0.8),
        ("url", "https://a.com/2", None, None, None),
    ]


def test_sitemapindex_and_no_namespace():
    xml = b"""<sitemapindex>
      <sitemap><loc>https://a.com/s1.xml</loc>
               <lastmod>2026-02-01</lastmod></sitemap>
      <sitemap><loc>https://a.com/s2.xml</loc></sitemap>
    </sitemapindex>"""
    got = parse_sitemap(xml)
    assert [(k, l) for k, l, *_ in got] == [
        ("sitemap", "https://a.com/s1.xml"),
        ("sitemap", "https://a.com/s2.xml"),
    ]


def test_bad_priority_and_junk_children_tolerated():
    xml = b"""<urlset>
      <url><loc>https://a.com/x</loc><priority>high</priority></url>
      <junk>ignored</junk>
    </urlset>"""
    got = parse_sitemap(xml)
    assert got == [("url", "https://a.com/x", None, None, None)]


def test_malformed_raises():
    for bad in (b"", b"<urlset><url>", b"<html><body>nope</body></html>"):
        with pytest.raises(ValueError):
            parse_sitemap(bad)


def test_kernel_quarantine_row(spark):
    rows = [
        (
            "https://a.com/sitemap.xml",
            b"<urlset><url><loc>https://a.com/1</loc></url></urlset>",
        ),
        ("https://b.com/sitemap.xml", b"not xml at all"),
    ]
    df = spark.createDataFrame(rows, "url string, content binary")
    got = {r.source_url: r for r in sitemap_urls(df).collect()}
    assert got["https://a.com/sitemap.xml"].loc == "https://a.com/1"
    assert got["https://a.com/sitemap.xml"].error is None
    bad = got["https://b.com/sitemap.xml"]
    assert bad.loc is None and "parse error" in bad.error
