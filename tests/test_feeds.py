"""RSS/Atom feed source (operators/feeds.py)."""

from __future__ import annotations

from machine_readability_checker_spark.operators import feeds as FD

_RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Site</title><link>http://s.example/</link>
<item>
  <title>First   post</title>
  <link>http://s.example/p1</link>
  <pubDate>Tue, 02 Jan 2024 03:04:05 GMT</pubDate>
</item>
<item>
  <title>Second</title>
  <link>http://s.example/p2</link>
  <pubDate>Tue, 02 Jan 2024 05:04:05 +0200</pubDate>
</item>
<item><title>No date or link</title></item>
</channel></rss>"""

_ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>A</title>
<entry>
  <title>Entry one</title>
  <link rel="self" href="http://a.example/self1"/>
  <link rel="alternate" href="http://a.example/e1"/>
  <published>2024-01-02T03:04:05Z</published>
  <updated>2024-06-01T00:00:00Z</updated>
</entry>
<entry>
  <title>Entry two</title>
  <link href="http://a.example/e2"/>
  <updated>2024-03-04T05:06:07+09:00</updated>
</entry>
</feed>"""


def test_rss_parse_and_date_normalization():
    dialect, entries = FD.parse_feed(_RSS)
    assert dialect == "rss"
    assert entries == [
        ("http://s.example/p1", "First post",
         "Tue, 02 Jan 2024 03:04:05 GMT"),
        ("http://s.example/p2", "Second",
         "Tue, 02 Jan 2024 05:04:05 +0200"),
        (None, "No date or link", None),
    ]
    assert FD._norm_date(entries[0][2]) == "2024-01-02 03:04:05"
    # +0200 converts to UTC
    assert FD._norm_date(entries[1][2]) == "2024-01-02 03:04:05"


def test_atom_alternate_link_and_published_priority():
    dialect, entries = FD.parse_feed(_ATOM)
    assert dialect == "atom"
    # rel=alternate beats rel=self; published beats updated
    assert entries[0] == (
        "http://a.example/e1", "Entry one", "2024-01-02T03:04:05Z"
    )
    assert entries[1] == (
        "http://a.example/e2", "Entry two", "2024-03-04T05:06:07+09:00"
    )
    assert FD._norm_date(entries[1][2]) == "2024-03-03 20:06:07"


def test_unparseable_date_is_data_not_error():
    assert FD._norm_date("next Tuesday-ish") is None
    assert FD._norm_date(None) is None


def test_feed_entries_kernel_with_quarantine(spark):
    rows = [
        ("http://s.example/feed.xml", bytearray(_RSS)),
        ("http://a.example/atom.xml", bytearray(_ATOM)),
        ("http://bad.example/x", bytearray(b"<html>not a feed</html>")),
        ("http://worse.example/y", bytearray(b"\x00<<<")),
    ]
    df = spark.createDataFrame(rows, "url string, content binary")
    out = FD.feed_entries(df).collect()
    by_feed = {}
    for r in out:
        by_feed.setdefault(r.feed_url, []).append(r)
    assert len(by_feed["http://s.example/feed.xml"]) == 3
    assert len(by_feed["http://a.example/atom.xml"]) == 2
    a1 = sorted(
        by_feed["http://a.example/atom.xml"], key=lambda r: r.entry_idx
    )[0]
    assert a1.url == "http://a.example/e1"
    assert a1.published_utc == "2024-01-02 03:04:05"
    for bad in ("http://bad.example/x", "http://worse.example/y"):
        (q,) = by_feed[bad]
        assert q.error is not None and q.entry_idx == -1
