"""Crawl-frontier scheduling: politeness-aware fetch waves.

A frontier is not fetched in priority order globally — politeness
bounds concurrent requests PER HOST (one in-flight request per domain
is the classic Heritrix/Nutch discipline), so the schedule interleaves
hosts: within each domain, URLs rank by priority (e.g. the PageRank
prior the crawl plan computes) and the i-th URL of a domain lands in
wave ``i // slots_per_wave``.  A wave is a set of URLs fetchable
concurrently without violating per-host politeness; expected fetch
time = wave × per-host delay.

Spark shape: ONE window over (domain, priority desc, url) — a single
exchange on domain; everything else is narrow arithmetic.  Hot
domains (millions of URLs on one host) are exactly the point: their
URLs serialize into deep waves instead of hammering the host, and the
window's per-partition sort handles them without skew tricks because
the schedule is per-domain state by definition.  Fully
SQL-expressible — the driver lane's oracle recomputes it with a
ROW_NUMBER window in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def schedule_frontier(
    urls: DataFrame,
    domain_col: str = "domain",
    priority_col: str = "priority",
    url_col: str = "url",
    slots_per_wave: int = 1,
    delay_s: float = 1.0,
    delay_col: str = None,
) -> DataFrame:
    """frontier(domain, url, priority) → + (host_rank, fetch_wave,
    eta_s): host_rank is the URL's 0-based position within its domain
    (priority desc, url as the deterministic tiebreak), fetch_wave =
    host_rank // slots_per_wave, eta_s = fetch_wave × the per-host
    delay — ``delay_col`` (e.g. robots.txt ``crawl_delays`` joined on
    domain, NULLs falling back to ``delay_s``) when given, else the
    scalar ``delay_s``."""
    if slots_per_wave < 1:
        raise ValueError("slots_per_wave must be >= 1")
    w = Window.partitionBy(domain_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    out = urls.withColumn("host_rank", F.row_number().over(w) - 1)
    per_host = (
        F.coalesce(F.col(delay_col), F.lit(float(delay_s)))
        if delay_col
        else F.lit(float(delay_s))
    )
    return out.withColumn(
        "fetch_wave", (F.col("host_rank") / slots_per_wave).cast("int")
    ).withColumn(
        "eta_s", F.col("fetch_wave").cast("double") * per_host
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Delta between two crawl snapshots keyed by (canonical) URL — the
    CDX-style revisit classification an incremental recrawl pipeline
    runs before spending extraction compute: ``(key, status, old_fp,
    new_fp)`` with status ∈ added / removed / changed / unchanged
    (changed = same URL, different content fingerprint; the md5 here
    plays the role of the WARC revisit record's payload digest,
    RFC-drafted in the WARC 1.1 spec §6.7.2).

    Scale shape — exactly one full-outer shuffle join on the key; the
    fingerprints are computed in the map phase so document text never
    moves through the join.  Callers feed ``dedupe``d snapshots (one
    row per key); duplicate keys would cross-multiply like any join."""
    o = old.select(
        F.col(key_col).alias("_k"),
        F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")).alias(
            "old_fp"
        ),
    )
    n = new.select(
        F.col(key_col).alias("_k"),
        F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")).alias(
            "new_fp"
        ),
    )
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("_k").alias(key_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def recrawl_workset(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``new`` that actually need reprocessing after a recrawl:
    added + changed keys only (the unchanged majority — typically >90%
    of a recrawl — skips extraction entirely).  One left-semi join
    against the delta verdict."""
    need = snapshot_delta(old, new, key_col, text_col).filter(
        F.col("status").isin("added", "changed")
    )
    return new.join(
        need.select(F.col(key_col)), key_col, "left_semi"
    )
