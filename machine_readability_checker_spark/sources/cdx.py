"""CDXJ web-archive index source — capture records → DataFrame.

Web archives (Common Crawl, Internet Archive, any pywb/OpenWayback
deployment) publish their WARC holdings as CDX(J) indexes: one line per
capture, ``<SURT key> <14-digit timestamp> <JSON block>``, e.g.::

    com,example)/page 20240101123000 {"url": "https://example.com/page",
      "mime": "text/html", "status": "200", "digest": "sha1:XYZ...",
      "length": "1234", "offset": "5678", "filename": "crawl-00.warc.gz"}

A curation pipeline reads the INDEX (tiny) before touching the WARCs
(petabytes): pick the captures worth fetching — latest per URL, status
200, target mime — then range-read only those (offset, length) spans.

Engine mapping: ``spark.read.text`` (splittable, trivially parallel),
one ``split(line, ' ', 3)`` and one ``from_json`` — all JVM-side, no
Python anywhere.  Malformed lines survive as rows with NULL ``url``
(from_json returns null on bad JSON) rather than killing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: JSON block schema of a CDXJ capture (all values are strings in the
#: wire format; numeric casts happen after parse).
CDXJ_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def parse_cdxj_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """CDXJ lines → ``(surt, ts, url, mime, status, digest, length,
    offset, filename)``.  ``ts`` stays the raw 14-digit string (the
    CDX collation key — lexicographic == chronological by design);
    numeric fields are cast, bad JSON yields NULL fields."""
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(F.element_at(parts, 3), CDXJ_JSON_SCHEMA)
    return df.select(
        F.element_at(parts, 1).alias("surt"),
        F.element_at(parts, 2).alias("ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("length"),
        j["offset"].cast("long").alias("offset"),
        j["filename"].alias("filename"),
    )


def read_cdxj(spark: SparkSession, path_glob: str) -> DataFrame:
    """CDXJ files matching ``path_glob`` → capture rows (text source:
    line-splittable, so even one huge index file parallelizes)."""
    return parse_cdxj_lines(spark.read.text(path_glob))


def latest_captures(df: DataFrame, ok_status: int = 200) -> DataFrame:
    """One row per SURT key: the LATEST successful capture — the
    standard wayback/recrawl view of an index.  Deterministic: ties on
    ts break by (filename, offset).

    Scale shape — one window over the surt key (single exchange);
    per-key capture counts are small, so no skew handling needed."""
    w = Window.partitionBy("surt").orderBy(
        F.desc("ts"), F.desc("filename"), F.desc("offset")
    )
    return (
        df.filter(F.col("status") == ok_status)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def fetch_plan(df: DataFrame) -> DataFrame:
    """Group the selected captures by WARC file and emit range-read
    work units ``(filename, n_captures, bytes_total, offsets)`` sorted
    by offset within each file — sequential range reads per WARC, the
    access pattern object stores reward.  One aggregate."""
    return (
        df.groupBy("filename")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.sum("length").alias("bytes_total"),
            F.array_sort(F.collect_list("offset")).alias("offsets"),
        )
    )
