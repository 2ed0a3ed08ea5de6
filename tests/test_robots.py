"""robots.txt tests: RFC 9309 parse + longest-match evaluation,
JVM-vs-Python pattern-translation equality, stdlib cross-validation,
and the no-Python-in-plan pin for the evaluation operator."""

from __future__ import annotations

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.robots import (
    parse_robots_txt,
    robots_allowed,
    robots_rules,
    rule_pattern_to_regex,
)

ROBOTS = """
# politeness file
User-agent: GoodBot
User-agent: OtherBot
Disallow: /private/
Allow: /private/press/

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/ok
Crawl-delay: 5

Sitemap: https://example.com/sitemap.xml
"""


def test_parse_groups_comments_sitemap():
    rules = parse_robots_txt(ROBOTS)
    assert ("goodbot", "disallow", "/private/") in rules
    assert ("otherbot", "disallow", "/private/") in rules
    assert ("goodbot", "allow", "/private/press/") in rules
    assert ("*", "disallow", "/tmp/") in rules
    assert ("*", "allow", "/tmp/ok") in rules
    assert ("", "sitemap", "https://example.com/sitemap.xml") in rules
    # empty Disallow is a no-op; directives are case-insensitive
    more = parse_robots_txt("USER-AGENT: A\nDISALLOW:\nDisAllow: /x\n")
    assert more == [("a", "disallow", "/x")]
    # a directive closes the UA run (the next UA starts fresh);
    # crawl-delay is additionally RECORDED, scoped to its group
    two = parse_robots_txt(
        "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /y\n"
    )
    assert two == [("a", "crawl-delay", "1"), ("b", "disallow", "/y")]


@pytest.mark.parametrize("pattern,path,expected", [
    ("/private/", "/private/x", True),
    ("/private/", "/privateer", False),
    ("/*.pdf$", "/docs/file.pdf", True),
    ("/*.pdf$", "/docs/file.pdfx", False),
    ("/a*b", "/aXYZb", True),
    ("/a*b", "/ab", True),
    ("/fish$", "/fish", True),
    ("/fish$", "/fishing", False),
    ("/x(y)+?", "/x(y)+?z", True),   # metacharacters are literal
])
def test_pattern_translation(pattern, path, expected):
    import re

    assert bool(re.match(rule_pattern_to_regex(pattern), path)) == expected


def test_jvm_translation_matches_python_twin(spark):
    pats = ["/private/", "/*.pdf$", "/a*b", "/fish$", "/x(y)+?",
            "/w[1]{2}", "/back\\slash", "/^caret", "/dot.", "/$"]
    df = spark.createDataFrame([(p,) for p in pats], "path string")
    ends = F.col("path").endswith("$")
    body = F.when(ends, F.expr("substring(path, 1, length(path) - 1)")
                  ).otherwise(F.col("path"))
    esc = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    jvm = df.select(
        "path",
        F.concat(F.lit("^"), F.replace(esc, F.lit("*"), F.lit(".*")),
                 F.when(ends, F.lit("$")).otherwise(F.lit(""))).alias("re"),
    ).collect()
    for r in jvm:
        assert r["re"] == rule_pattern_to_regex(r["path"]), r["path"]


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame(
        [("example.com", ROBOTS.encode("utf-8")),
         ("open.org", b"User-agent: *\nDisallow:\n")],
        "domain string, content binary",
    )
    r = robots_rules(df).cache()
    r.count()
    return r


def test_robots_allowed_evaluation(spark, rules):
    urls = spark.createDataFrame(
        [("u1", "example.com", "/private/x"),        # * group: no /private rule -> allowed
         ("u2", "example.com", "/tmp/junk"),         # disallow /tmp/
         ("u3", "example.com", "/tmp/ok/file"),      # allow /tmp/ok (longer)
         ("u4", "example.com", "/docs/paper.pdf"),   # /*.pdf$ disallow
         ("u5", "example.com", "/docs/paper.pdfx"),  # $ anchor -> allowed
         ("u6", "open.org", "/anything"),            # empty disallow -> allowed
         ("u7", "nowhere.net", "/x")],               # no rules -> allowed
        "doc_id string, domain string, path string",
    )
    out = {r["doc_id"]: r for r in robots_allowed(urls, rules).collect()}
    assert out["u1"]["allowed"] is True
    assert out["u2"]["allowed"] is False
    assert out["u2"]["matched_rule"] == "/tmp/"
    assert out["u3"]["allowed"] is True
    assert out["u3"]["matched_rule"] == "/tmp/ok"
    assert out["u4"]["allowed"] is False
    assert out["u5"]["allowed"] is True
    assert out["u6"]["allowed"] is True
    assert out["u7"]["allowed"] is True and out["u7"]["matched_rule"] is None


def test_exact_agent_group_overrides_star(spark, rules):
    urls = spark.createDataFrame(
        [("g1", "example.com", "/private/x"),
         ("g2", "example.com", "/private/press/kit"),
         ("g3", "example.com", "/tmp/junk")],
        "doc_id string, domain string, path string",
    )
    out = {r["doc_id"]: r
           for r in robots_allowed(urls, rules, agent="GoodBot").collect()}
    assert out["g1"]["allowed"] is False          # exact group disallows
    assert out["g2"]["allowed"] is True           # longer allow wins
    # the exact group REPLACES *: /tmp/ no longer applies
    assert out["g3"]["allowed"] is True


def test_cross_validate_against_stdlib(spark):
    """urllib.robotparser evaluates rules in file order (first match
    wins); ordering fixture rules longest-first with allow before
    disallow makes first-match == RFC longest-match, so the two
    implementations must agree on this family."""
    # plain-prefix rules only: the stdlib parser implements neither *
    # nor $ (it treats them literally), so wildcard rules are pinned by
    # the RFC tests above instead
    txt = (
        "User-agent: *\n"
        "Allow: /a/b/c\n"
        "Disallow: /a/b\n"
        "Allow: /a\n"
        "Disallow: /d/\n"
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    paths = ["/a/b/c/d", "/a/b/x", "/a/zzz", "/d/x", "/dd", "/other"]
    df = spark.createDataFrame([("r.com", txt.encode())],
                               "domain string, content binary")
    rules = robots_rules(df)
    urls = spark.createDataFrame(
        [(p, "r.com", p) for p in paths],
        "doc_id string, domain string, path string",
    )
    got = {r["doc_id"]: r["allowed"]
           for r in robots_allowed(urls, rules).collect()}
    for p in paths:
        assert got[p] == rp.can_fetch("anybot", f"https://r.com{p}"), p


def test_evaluation_plan_is_jvm_only(spark, rules):
    urls = spark.createDataFrame(
        [("u1", "example.com", "/x")],
        "doc_id string, domain string, path string",
    )
    plan = (
        robots_allowed(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # parsing is Arrow-batched python; EVALUATION must be JVM-only
    # (rules come pre-parsed/cached here, so no Python remains)
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_crawl_delays_precedence_and_clamps(spark):
    from machine_readability_checker_spark.operators.frontier import (
        schedule_frontier,
    )
    from machine_readability_checker_spark.operators.robots import (
        crawl_delays,
        robots_rules,
    )

    bodies = [
        ("a.com", "User-agent: *\nCrawl-delay: 2\n"
                  "User-agent: mybot\nCrawl-delay: 0.5\nDisallow: /x\n"),
        ("b.com", "User-agent: *\nCrawl-delay: 10\n"),
        ("c.com", "User-agent: *\nCrawl-delay: oops\n"),
        ("d.com", "User-agent: *\nCrawl-delay: 86400\n"),
        ("e.com", "User-agent: *\nDisallow: /z\n"),   # no delay rows
    ]
    df = spark.createDataFrame(
        [(d, b.encode()) for d, b in bodies], ["domain", "content"]
    )
    rules = robots_rules(df)
    got = {
        r["domain"]: r["crawl_delay_s"]
        for r in crawl_delays(rules, agent="MyBot").collect()
    }
    assert got["a.com"] == 0.5      # specific agent beats *
    assert got["b.com"] == 10.0
    assert got["c.com"] == 1.0      # unparseable -> default
    assert got["d.com"] == 3600.0   # hostile day-long delay clamps
    assert "e.com" not in got       # no delay rows -> no row (join LEFT)

    # frontier uses the per-host delay when joined on
    urls = spark.createDataFrame(
        [("a.com", f"https://a.com/{i}", 1.0) for i in range(3)]
        + [("b.com", f"https://b.com/{i}", 1.0) for i in range(3)],
        ["domain", "url", "priority"],
    ).join(crawl_delays(rules, agent="MyBot"), "domain", "left")
    sched = schedule_frontier(urls, delay_col="crawl_delay_s")
    etas = {
        (r["domain"], r["host_rank"]): r["eta_s"]
        for r in sched.collect()
    }
    assert etas[("a.com", 2)] == 1.0    # 2 waves * 0.5 s
    assert etas[("b.com", 2)] == 20.0   # 2 waves * 10 s
