"""robots.txt (RFC 9309) parsing + crawl-permission evaluation — the
politeness layer of a web-scale ingest pipeline.

Two halves, split exactly like the other hybrid lanes:

- **Parsing** is per-document line-state work (user-agent groups,
  comments, directive normalization) → a pure-Python core
  (``parse_robots_txt``) inside an Arrow-batched kernel
  (``robots_rules``), one rule row out per (agent, type, path).
- **Evaluation** (``robots_allowed``) is pure relational work: pick
  each domain's most specific applicable agent group (exact name if
  one exists, else ``*``), join URLs to that group's rules on
  registered domain, regex-match paths (RFC wildcards ``*`` and ``$``
  compile to anchored regexes on both engines), and apply the RFC
  longest-match rule — the longest matching path wins, ties break to
  ``allow``; no matching rule means allowed.  One rules-side shuffle,
  one join, one aggregate; URLs never collect.

Spec notes (public knowledge, RFC 9309 + the Google REP documentation):
consecutive ``User-agent`` lines share one group; an empty
``Disallow:`` is a no-op; directive names are case-insensitive; ``#``
starts a comment; ``Sitemap`` is group-independent and surfaces as its
own rule_type with agent ''.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

RULES_SCHEMA = "domain string, agent string, rule_type string, path string"


def parse_robots_txt(text: str) -> List[Tuple[str, str, str]]:
    """→ [(agent, rule_type, path)] in file order.  agent is lowercase;
    rule_type ∈ {allow, disallow, sitemap}; sitemap rows carry agent ''
    and the sitemap URL in ``path``."""
    rules: List[Tuple[str, str, str]] = []
    agents: List[str] = []
    group_open = False  # collecting consecutive user-agent lines
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not group_open:
                agents = []
                group_open = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            group_open = False
            if not val:
                continue  # empty Disallow/Allow: no restriction
            for a in agents or ["*"]:
                rules.append((a, key, val))
        elif key == "sitemap":
            rules.append(("", "sitemap", val))
        elif key == "crawl-delay":
            # de-facto standard (not in RFC 9309 but honored by most
            # crawlers): group-scoped like allow/disallow
            group_open = False
            for a in agents or ["*"]:
                rules.append((a, "crawl-delay", val))
        else:
            group_open = False  # unknown keys close the UA run
    return rules


def crawl_delays(
    rules: DataFrame, agent: str = "*", default_s: float = 1.0
) -> DataFrame:
    """rules(domain, agent, rule_type, path) → (domain,
    crawl_delay_s): the politeness interval ``schedule_frontier``
    should use per host.  Precedence mirrors rule-group matching: a
    group naming THIS agent beats the ``*`` group; unparseable values
    fall back to ``default_s``; delays clamp to [0, 3600] (a hostile
    86400 must not park the crawler for a day).  One aggregate over
    the (tiny) rule table — the frontier joins it broadcast."""
    a = F.lower(F.col("agent"))
    mine = (a == agent.lower()) & (a != "*")
    d = rules.filter(F.col("rule_type") == "crawl-delay").groupBy(
        "domain"
    ).agg(
        F.max(F.when(mine, F.col("path"))).alias("_mine"),
        F.max(F.when(a == "*", F.col("path"))).alias("_star"),
    )
    # try_cast: a malformed value ("Crawl-delay: oops") is NULL, not a
    # task failure (ANSI mode makes plain cast throw)
    val = F.coalesce(
        F.col("_mine").try_cast("double"),
        F.col("_star").try_cast("double"),
        F.lit(float(default_s)),
    )
    return d.select(
        "domain",
        F.least(F.greatest(val, F.lit(0.0)), F.lit(3600.0)).alias(
            "crawl_delay_s"
        ),
    )


def robots_rules(
    df: DataFrame, content_col: str = "content", domain_col: str = "domain"
) -> DataFrame:
    """(domain, robots bytes/text) rows → exploded rule rows
    ``(domain, agent, rule_type, path)``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"domain": [], "agent": [], "rule_type": [], "path": []}
            for dom, content in zip(batch[domain_col], batch[content_col]):
                text = (
                    content.decode("utf-8", "replace")
                    if isinstance(content, (bytes, bytearray))
                    else str(content or "")
                )
                for agent, rtype, path in parse_robots_txt(text):
                    out["domain"].append(dom)
                    out["agent"].append(agent)
                    out["rule_type"].append(rtype)
                    out["path"].append(path)
            yield pd.DataFrame(out)

    return df.select(domain_col, content_col).mapInPandas(
        kernel, schema=RULES_SCHEMA
    )


def rule_pattern_to_regex(path: str) -> str:
    """RFC 9309 path pattern → anchored regex both Spark (Java) and
    DuckDB (RE2) evaluate identically: ``*`` → ``.*``, a trailing ``$``
    anchors the end, everything else is literal."""
    anchored_end = path.endswith("$")
    body = path[:-1] if anchored_end else path
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.[]{}()+?^$|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_id_col: str = "doc_id",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """→ (url_id_col, domain, path, allowed, matched_rule, matched_len).

    RFC 9309 evaluation: per domain use the exact-agent group when one
    exists, else the ``*`` group; the longest matching rule decides;
    ties break to allow; no rule → allowed."""
    agent = agent.lower()
    ad = rules.filter(F.col("rule_type").isin("allow", "disallow"))
    ad = ad.filter(
        (F.col("agent") == agent) | (F.col("agent") == "*")
    ).withColumn(
        "_spec", F.when(F.col("agent") == agent, 2).otherwise(1)
    )
    # keep only each domain's most specific available group (RFC: a
    # crawler obeys exactly one group)
    w = Window.partitionBy("domain")
    grp = (
        ad.withColumn("_max_spec", F.max("_spec").over(w))
        .filter(F.col("_spec") == F.col("_max_spec"))
        .drop("_spec", "_max_spec")
    )
    # regex compiled rule-side as pure JVM expressions (no Python UDF):
    # strip a trailing '$' anchor, escape regex metacharacters EXCEPT
    # '*', turn '*' into '.*', re-anchor
    ends = F.col("path").endswith("$")
    body = F.when(
        ends, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.regexp_replace(
        body, r"([.\[\]{}()+?^$|\\])", r"\\$1"
    )
    grp = grp.withColumn(
        "_re",
        F.concat(
            F.lit("^"),
            F.replace(esc, F.lit("*"), F.lit(".*")),
            F.when(ends, F.lit("$")).otherwise(F.lit("")),
        ),
    )

    j = urls.select(
        F.col(url_id_col).alias("_uid"),
        F.col(domain_col).alias("domain"),
        F.col(path_col).alias("_path"),
    ).join(F.broadcast(grp), "domain", "left")
    matched = F.regexp_like(F.col("_path"), F.col("_re"))
    # longest match wins; ties → allow (struct max: length, then the
    # allow flag — true sorts above false)
    cand = F.when(
        F.col("_re").isNotNull() & matched,
        F.struct(
            F.length("path").alias("l"),
            (F.col("rule_type") == "allow").alias("a"),
            F.col("path").alias("p"),
        ),
    )
    return (
        j.groupBy("_uid", "domain", "_path")
        .agg(F.max(cand).alias("_best"))
        .select(
            F.col("_uid").alias(url_id_col),
            "domain",
            F.col("_path").alias(path_col),
            F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
            F.col("_best.p").alias("matched_rule"),
            F.col("_best.l").alias("matched_len"),
        )
    )
