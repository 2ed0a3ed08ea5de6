"""CDXJ index source + SURT key tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.weburl import surt_key
from machine_readability_checker_spark.sources.cdx import (
    fetch_plan,
    latest_captures,
    read_cdxj,
)

LINES = [
    # two captures of the same URL: the later one must win
    'com,example)/a 20240101000000 {"url": "https://example.com/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
    '"length": "10", "offset": "0", "filename": "w0.warc.gz"}',
    'com,example)/a 20240301000000 {"url": "https://example.com/a", '
    '"mime": "text/html", "status": "200", "digest": "sha1:BBB", '
    '"length": "20", "offset": "100", "filename": "w1.warc.gz"}',
    # later capture is a 404 → the earlier 200 must win
    'com,example)/b 20240101000000 {"url": "https://example.com/b", '
    '"mime": "text/html", "status": "200", "digest": "sha1:CCC", '
    '"length": "30", "offset": "200", "filename": "w0.warc.gz"}',
    'com,example)/b 20240301000000 {"url": "https://example.com/b", '
    '"mime": "text/html", "status": "404", "digest": "sha1:DDD", '
    '"length": "5", "offset": "300", "filename": "w1.warc.gz"}',
    # malformed JSON survives as a NULL-field row, never a task failure
    "com,example)/bad 20240101000000 {not json",
]


def test_read_cdxj_latest_and_fetch_plan(spark, tmp_path):
    p = tmp_path / "idx.cdxj"
    p.write_text("\n".join(LINES) + "\n")
    df = read_cdxj(spark, str(p))
    assert df.count() == 5
    bad = df.filter("surt = 'com,example)/bad'").collect()[0]
    assert bad["url"] is None and bad["ts"] == "20240101000000"

    latest = {r["surt"]: r for r in latest_captures(df).collect()}
    assert latest["com,example)/a"]["digest"] == "sha1:BBB"
    assert latest["com,example)/a"]["offset"] == 100
    assert latest["com,example)/b"]["digest"] == "sha1:CCC"
    assert "com,example)/bad" not in latest  # NULL status filtered

    plan = {r["filename"]: r for r in fetch_plan(latest_captures(df)).collect()}
    assert plan["w0.warc.gz"]["n_captures"] == 1
    assert plan["w0.warc.gz"]["bytes_total"] == 30
    assert plan["w1.warc.gz"]["offsets"] == [100]


def test_surt_key_examples(spark):
    cases = [
        ("https://Sub.Example.COM/A/b?x=1", "com,example,sub)/a/b?x=1"),
        ("http://example.com", "com,example)/"),
        ("https://example.com/p?b=2&a=1", "com,example)/p?a=1&b=2"),
        ("https://www.example.co.uk/Path", "uk,co,example,www)/path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [
        r["k"]
        for r in df.select(surt_key(F.col("url")).alias("k"))
        .orderBy("url")
        .collect()
    ]
    want = [k for _, k in sorted(cases)]
    assert got == want
