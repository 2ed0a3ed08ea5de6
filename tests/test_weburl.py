"""URL / domain quality operators (operators/weburl.py).

RefinedWeb-style curation needs hostname parsing with public-suffix
awareness, per-domain stats, broadcast blocklists, and per-domain caps.
Correctness here is unit-level (parse edge cases) plus plan pins: the
blocklist join must broadcast the blocklist and NEVER shuffle the
corpus, and the per-domain cap must keep the skew-aware cold-key
bypass it inherits from sampling.cap_per_key.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from machine_readability_checker_spark.operators import weburl as WU


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _parse_one(spark, url: str) -> Row:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(WU.parse_url(F.col("url")).alias("p")).head()["p"]


def test_parse_url_basic(spark):
    p = _parse_one(spark, "https://www.example.com/a/b?x=1#frag")
    assert p["scheme"] == "https"
    assert p["host"] == "www.example.com"
    assert p["registered_domain"] == "example.com"
    assert p["tld"] == "com"
    assert p["path"] == "/a/b"
    assert p["query"] == "x=1"


def test_parse_url_two_level_suffix(spark):
    p = _parse_one(spark, "http://news.bbc.co.uk/stories")
    assert p["registered_domain"] == "bbc.co.uk"
    assert p["tld"] == "uk"
    # the suffix itself as a 2-label host: registered domain is the
    # whole host (n < 3 labels, can't go deeper)
    p2 = _parse_one(spark, "http://co.uk/")
    assert p2["registered_domain"] == "co.uk"


def test_parse_url_port_userinfo_case(spark):
    p = _parse_one(spark, "https://USER:pw@WWW.Example.COM:8443/x?q=2")
    assert p["host"] == "www.example.com"
    assert p["registered_domain"] == "example.com"
    assert p["path"] == "/x"
    assert p["query"] == "q=2"


def test_parse_url_bare_and_invalid(spark):
    p = _parse_one(spark, "ftp://host")
    assert p["scheme"] == "ftp"
    assert p["host"] == "host"
    assert p["registered_domain"] == "host"
    assert p["path"] == ""
    assert p["query"] == ""
    junk = _parse_one(spark, "not a url at all")
    assert junk["host"] == ""
    assert junk["registered_domain"] == ""


def test_domain_stats_values(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/1", "xx", "en"),
            (2, "https://b.example.com/2", "yyyy", "fr"),
            (3, "https://other.org/3", "zzz", "en"),
        ],
        "doc_id long, url string, text string, lang string",
    )
    rows = {
        r["registered_domain"]: r
        for r in WU.domain_stats(df).collect()
    }
    ex = rows["example.com"]
    assert (ex["n_docs"], ex["total_chars"], ex["n_langs"], ex["n_hosts"]) == (
        2,
        6,
        2,
        2,
    )
    assert rows["other.org"]["n_docs"] == 1


def test_blocklist_drops_and_never_shuffles_corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/x"),
            (2, "https://keep.org/y"),
        ],
        "doc_id long, url string",
    )
    block = spark.createDataFrame([("example.com",)], "registered_domain string")
    out = WU.apply_blocklist(df, block)
    assert [r["doc_id"] for r in out.collect()] == [2]
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus (probe) branch — everything printed before the build
    # side's BroadcastExchange — must be exchange-free; the blocklist's
    # own distinct() may shuffle the tiny build side only
    assert "Exchange" not in plan.split("BroadcastExchange")[0]


def test_cap_per_domain(spark):
    rows = [
        (i, f"https://{'big' if i < 20 else 'small'}.example{i % 2}.com/{i}")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = WU.cap_per_domain(df, cap=5)
    counts = (
        out.withColumn("rd", WU.parse_url(F.col("url"))["registered_domain"])
        .groupBy("rd")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in counts)
    # deterministic: same input -> same kept set
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in WU.cap_per_domain(df, cap=5).collect())
    assert a == b


def test_canonicalize_url_matrix(spark):
    from machine_readability_checker_spark.operators.weburl import (
        canonicalize_url,
    )

    cases = [
        # scheme/host case, userinfo, default port, dot segments,
        # tracking params, param sort, fragment
        (
            "HTTP://User:p@WWW.Example.COM:80/a/./b/../c"
            "?utm_source=x&b=2&a=1#frag",
            "http://www.example.com/a/c?a=1&b=2",
        ),
        ("https://ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # kept port
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/a/b/", "https://ex.com/a/b/"),
        ("https://ex.com/a//b/", "https://ex.com/a/b/"),
        ("https://ex.com/a/b/..", "https://ex.com/a/"),
        ("https://ex.com/a/.", "https://ex.com/a/"),
        ("https://ex.com/../../x", "https://ex.com/x"),  # .. never pops root
        ("https://ex.com/a?fbclid=123", "https://ex.com/a"),
        ("https://ex.com/a?z=1&y=2&utm_campaign=c", "https://ex.com/a?y=2&z=1"),
        ("https://ex.com/..", "https://ex.com/"),
        # RFC 3986 §6.2.2 percent-encoding normalization
        ("https://ex.com/d%6fcs/%7E%75ser", "https://ex.com/docs/~user"),
        ("https://ex.com/a%2fb", "https://ex.com/a%2Fb"),  # reserved: hex up
        ("https://ex.com/a?k=%2d%2E%5f", "https://ex.com/a?k=-._"),
        ("https://ex.com/100%", "https://ex.com/100%"),  # bare % untouched
        ("https://ex.com/a%2", "https://ex.com/a%2"),  # truncated escape
        ("https://ex.com/%41%%42", "https://ex.com/A%B"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [w for _, w in cases]


def test_canonicalize_url_is_jvm_only(spark):
    from machine_readability_checker_spark.operators.weburl import (
        with_canonical_url,
    )

    df = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
