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

# scheme chars case-insensitive: real crawls carry HTTP:// URIs
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)?([^/?#:]+)"


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
        F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)).alias(
            "scheme"
        ),
        host.alias("host"),
        registered.alias("registered_domain"),
        F.when(n >= 1, tld).otherwise(F.lit("")).alias("tld"),
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
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


# RFC 3986 §2.3 unreserved characters: percent-escapes of these are
# equivalent to the bare character and MUST decode during
# normalization (§6.2.2.2); every other escape keeps its %XX form but
# gets uppercase hex (§6.2.2.1)
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_DECODE = {format(ord(c), "02X"): c for c in _UNRESERVED}


def normalize_percent_encoding(col: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, entirely in JVM
    expressions (one ``split`` + one ``transform`` over the pieces —
    codegen, no Python):

    - ``%6f`` → ``o`` … escapes of UNRESERVED chars decode to the char
    - ``%2f`` → ``%2F`` … all other escapes get uppercase hex digits
    - a ``%`` not followed by two hex digits passes through untouched

    Decoding only unreserved escapes can never introduce a delimiter
    (``/ ? # & =`` are all reserved), so this is safe to apply to the
    WHOLE url string before structural parsing.  The 66-entry
    code→char table ships as a map literal inside the lambda."""
    decode_map = F.create_map(
        *[
            F.lit(x)
            for code, ch in sorted(_PCT_DECODE.items())
            for x in (code, ch)
        ]
    )
    parts = F.split(col, "%", -1)

    def piece(e: Column, idx: Column) -> Column:
        hex2 = F.substring(e, 1, 2)
        up = F.upper(hex2)
        decoded = F.try_element_at(decode_map, up)
        fixed = F.when(
            hex2.rlike("^[0-9A-Fa-f]{2}$"),
            F.concat(
                F.coalesce(decoded, F.concat(F.lit("%"), up)),
                F.substring(e, 3, 2147483647),
            ),
        ).otherwise(F.concat(F.lit("%"), e))
        return F.when(idx == 0, e).otherwise(fixed)

    return F.array_join(F.transform(parts, piece), "")


# tracking parameters stripped by canonicalization (the public
# crawler/analytics-hygiene convention: params that never change the
# resource)
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)(=.*)?$"
)

_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:(\d+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?"


def canonicalize_url(col: Column) -> Column:
    """Crawl-frontier URL canonicalization, entirely in JVM
    expressions (codegen — no Python, no UDF):

    - scheme + host lowercased, userinfo dropped
    - default ports stripped (http:80, https:443)
    - RFC 3986 dot-segment removal on the path (an ``aggregate`` fold
      over the split segments; ``..`` never pops past the root)
    - empty path → ``/``; a trailing ``/``/``/.``/``/..`` keeps its
      trailing slash (RFC 5.2.4 output shapes)
    - fragment dropped; tracking params (utm_*, fbclid, gclid, ...)
      removed; remaining query params SORTED for a stable key; empty
      query dropped
    - percent-encoding normalized first (RFC 3986 §6.2.2): unreserved
      escapes decode (``%6f`` → ``o``), the rest get uppercase hex
      (``%2f`` → ``%2F``) — see ``normalize_percent_encoding``

    Two URLs that differ only in these dimensions map to one frontier
    key — at crawl scale this is the dedup key for the fetch queue, so
    it must be a cheap narrow map, which this is."""
    col = normalize_percent_encoding(col)
    scheme = F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)?([^/?#:]+)", 2)
    )
    port = F.regexp_extract(col, _PORT_RE, 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    raw_path = F.regexp_extract(col, _PATH_RE, 1)

    # dot-segment removal: fold over '/'-split segments; empty
    # segments (the rooted split's leading '', doubled slashes, the
    # trailing '' of a directory path) are dropped — ``ends_dir``
    # restores the trailing slash afterwards
    segs = F.filter(F.split(raw_path, "/"), lambda s: s != "")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    # RFC output keeps a trailing slash when the input ended in
    # '/', '/.' or '/..'; the fold's dropped-segment forms lose it
    ends_dir = (
        raw_path.endswith("/")
        | raw_path.endswith("/.")
        | raw_path.endswith("/..")
    )
    joined = F.array_join(folded, "/")
    path = F.concat(
        F.lit("/"),
        joined,
        F.when(ends_dir & (joined != ""), F.lit("/")).otherwise(F.lit("")),
    )
    # '/..'-to-root collapses to '//' via the branch above — normalize
    path = F.when(path == "//", F.lit("/")).otherwise(path)

    q = F.regexp_extract(col, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))

    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        query,
    )


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach ``canonical_url`` — one narrow map; dedup the frontier
    with a groupBy on it (one exchange keyed on the canonical form)."""
    return df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))


def surt_key(col: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL — the
    canonical CDX index key used by Heritrix / pywb / OpenWayback:
    hostname labels reversed and comma-joined, ``)`` and the lowercased
    path appended, query (sorted) kept after ``?``.  Example:
    ``https://Sub.Example.COM/A/b?x=1`` → ``com,example,sub)/a/b?x=1``.

    Pure JVM expressions (reverse + array_join over the parsed host
    labels) — a narrow map at any scale."""
    parts = parse_url(col)
    host_rev = F.array_join(
        F.reverse(F.split(parts["host"], r"\.")), ","
    )
    path = F.lower(
        F.when(parts["path"] == "", F.lit("/")).otherwise(parts["path"])
    )
    q = F.when(
        parts["query"] == "", F.lit("")
    ).otherwise(
        F.concat(
            F.lit("?"),
            F.array_join(
                F.array_sort(F.split(F.lower(parts["query"]), "&")), "&"
            ),
        )
    )
    return F.concat(host_rev, F.lit(")"), path, q)
