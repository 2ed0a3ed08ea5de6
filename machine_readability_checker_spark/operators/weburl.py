"""URL / domain quality operators (the RefinedWeb curation steps).

Web-scale corpora carry a source URL per document; curation needs
hostname parsing, per-domain statistics, domain blocklists, and
per-domain caps.  Everything here is pure JVM expression work
(regexp + array ops — codegen, no Python, no shuffle except the one
aggregate that *is* the statistic):

- ``parse_url``       : scheme/host/registered_domain/tld/path/query
                        struct from one URL column
- ``domain_stats``    : one aggregate scan → per-registered-domain
                        doc counts / char totals / language breadth
- ``apply_blocklist`` : broadcast LEFT ANTI join on registered domain —
                        the corpus is never shuffled, the (small)
                        blocklist ships to executors
- ``cap_per_domain``  : parse + the skew-aware ``sampling.cap_per_key``
                        (cold domains bypass the window shuffle)

Registered-domain extraction uses a SMALL embedded sample of the
public suffix list (the two-level suffixes a test corpus exercises);
production swaps in the full publicsuffix.org snapshot — the lookup
is a literal IN list either way, still codegen.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, functions as F

# sample of the public suffix list's two-level entries; the registered
# domain under these is the last THREE labels (bbc.co.uk, not co.uk)
TWO_LEVEL_SUFFIXES: List[str] = [
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "co.in", "co.kr", "com.cn", "com.mx",
]

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#@]*@)?([^/?#:]+)"


def parse_url(col: Column) -> Column:
    """Struct(scheme, host, registered_domain, tld, path, query) from a
    URL string — RFC 3986-shaped regexp extraction, empty strings for
    absent parts.  Hostname is lowercased; userinfo and port are
    stripped."""
    host = F.lower(F.regexp_extract(col, _HOST_RE, 2))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    registered = F.when(n <= 1, host).otherwise(
        F.when(
            last2.isin(TWO_LEVEL_SUFFIXES) & (n >= 3),
            F.concat_ws(".", F.element_at(labels, -3), last2),
        ).otherwise(last2)
    )
    tld = F.element_at(labels, -1)
    return F.struct(
        F.lower(F.regexp_extract(col, r"^([a-z][a-z0-9+.-]*)://", 1)).alias(
            "scheme"
        ),
        host.alias("host"),
        registered.alias("registered_domain"),
        F.when(n >= 1, tld).otherwise(F.lit("")).alias("tld"),
        F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
        .alias("path"),
        F.regexp_extract(col, r"\?([^#]*)", 1).alias("query"),
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach the parsed ``url_parts`` struct — one narrow map."""
    return df.withColumn("url_parts", parse_url(F.col(url_col)))


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-registered-domain corpus statistics: document count, total
    characters, distinct languages, distinct hosts — ONE hash-aggregate
    scan (map-side partial combine; the only shuffle is the aggregate
    itself, keyed on registered domain)."""
    p = parse_url(F.col(url_col))
    return (
        df.select(
            p["registered_domain"].alias("registered_domain"),
            p["tld"].alias("tld"),
            p["host"].alias("host"),
            F.length(F.col(text_col)).alias("_len"),
            F.col(lang_col).alias("_lang"),
        )
        .groupBy("registered_domain", "tld")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").alias("total_chars"),
            F.countDistinct("_lang").alias("n_langs"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def apply_blocklist(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop documents whose registered domain is on the blocklist —
    broadcast LEFT ANTI join, so the corpus side is NEVER shuffled (at
    100 TB the blocklist is the only thing that moves).  ``blocklist``
    is a one-column frame of registered domains (column
    ``registered_domain``)."""
    p = parse_url(F.col(url_col))
    return (
        df.withColumn("_rd", p["registered_domain"])
        .join(
            F.broadcast(
                blocklist.select(
                    F.col("registered_domain").alias("_rd")
                ).distinct()
            ),
            "_rd",
            "left_anti",
        )
        .drop("_rd")
    )


def cap_per_domain(
    df: DataFrame,
    cap: int = 100,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style per-domain cap: parse the registered domain and
    reuse the skew-aware ``sampling.cap_per_key`` (cold domains bypass
    the window shuffle; only over-cap domains sort)."""
    from .sampling import cap_per_key

    p = parse_url(F.col(url_col))
    return cap_per_key(
        df.withColumn("_rd", p["registered_domain"]),
        key_col="_rd",
        cap=cap,
        id_col=id_col,
    ).drop("_rd")
