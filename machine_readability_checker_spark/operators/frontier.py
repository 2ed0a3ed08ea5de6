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
) -> DataFrame:
    """frontier(domain, url, priority) → + (host_rank, fetch_wave,
    eta_s): host_rank is the URL's 0-based position within its domain
    (priority desc, url as the deterministic tiebreak), fetch_wave =
    host_rank // slots_per_wave, eta_s = fetch_wave × delay_s."""
    if slots_per_wave < 1:
        raise ValueError("slots_per_wave must be >= 1")
    w = Window.partitionBy(domain_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    out = urls.withColumn("host_rank", F.row_number().over(w) - 1)
    return out.withColumn(
        "fetch_wave", (F.col("host_rank") / slots_per_wave).cast("int")
    ).withColumn(
        "eta_s", F.col("fetch_wave").cast("double") * float(delay_s)
    )
