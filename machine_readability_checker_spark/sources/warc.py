"""WARC / WET Spark source — web-crawl archives → docs_raw.

The 100 TB story: Common Crawl ships ~90k ``*.warc.gz`` files of ~1 GB
per monthly crawl.  A gzip stream is not splittable mid-member, so the
FILE is the unit of parallelism — exactly what Spark's ``binaryFile``
source provides (one row per file, file-level task scheduling, and
partition pruning over the path glob).  Per-task memory is bounded by
one file plus one record: the member-by-member decoder in
``core/warc.py`` never materializes the decompressed archive.

Flow::

    spark.read.format("binaryFile").load("crawl/segments/*/warc/*")
      → mapInPandas(record splitter)           # Arrow-batched, no per-row Python API
      → WARC_SCHEMA rows (one per record, quarantine rows carry error)
      → warc_to_docs_raw() → the extraction job's RAW_SCHEMA

WET files (``conversion`` records: pre-extracted UTF-8 text) skip the
extraction kernel entirely — ``read_wet`` lands them as a documents-
shaped frame.

No counterpart in the reference repo (it reads local spreadsheet files,
``src/processor/loader.py``); format knowledge is public ISO 28500 +
Common Crawl docs.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..core.warc import decode_warc

WARC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_location", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("charset", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("src_file", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        # declared WARC-Payload-Digest (revisit records reference their
        # original capture by this; responses may carry it too)
        T.StructField("payload_digest", T.StringType(), True),
        # HTTP X-Robots-Tag header value (the response-header form of
        # robots-meta; crawl curation honors it like <meta robots>)
        T.StructField("x_robots", T.StringType(), True),
    ]
)

# MIME → extraction-lane format (anything else quarantines at the
# extension gate, which is the desired fail-soft)
_MIME_FMT = {
    "text/html": "html",
    "application/xhtml+xml": "html",
    "application/pdf": "pdf",
    "text/csv": "csv",
    "application/rtf": "rtf",
    "application/msword": "docx",  # served-as; gate catches real .doc
    "application/vnd.openxmlformats-officedocument"
    ".wordprocessingml.document": "docx",
    "application/vnd.openxmlformats-officedocument"
    ".presentationml.presentation": "pptx",
    "application/vnd.openxmlformats-officedocument"
    ".spreadsheetml.sheet": "xlsx",
    "application/vnd.ms-excel": "xls",
    "text/markdown": "md",
    "application/x-ipynb+json": "ipynb",  # Jupyter's registered type
    "text/vtt": "vtt",  # RFC-registered WebVTT type
    "application/x-subrip": "srt",
    "application/x-tex": "tex",
    "text/x-tex": "tex",
    # sniffed-verdict spellings (operators/mimetype.py) — sniff mode
    # routes on bytes, so the byte-derived MIME must map too
    "text/rtf": "rtf",
    "application/epub+zip": "epub",
    "application/vnd.oasis.opendocument.spreadsheet": "ods",
    "application/vnd.oasis.opendocument.text": "odt",
    "application/x-cfb": "xls",  # BIFF lane; non-Excel CFB quarantines inside
    "application/msword": "doc",  # CFB-subtype-refined verdict
    "application/vnd.ms-powerpoint": "ppt",
    "message/rfc822": "eml",
    # plain text routes to the fixed-width/paragraph lane (fmt=txt)
    # instead of quarantining — the single most common long-tail type
    "text/plain": "txt",
}


def _record_row(rec, rid_fallback: str, path: str) -> tuple:
    rid = rec.record_id or rid_fallback
    return (
        rid.removeprefix("<urn:uuid:").rstrip(">"),
        rec.uri or None,
        rec.warc_type or None,
        rec.http_status,
        rec.http_location or None,
        # response records: the HTTP header; resource/conversion
        # records: the record-level Content-Type (how media blobs
        # carry their sniffed type through the archive)
        rec.http_content_type
        or rec.headers.get("content-type")
        or None,
        rec.charset or None,
        bytearray(rec.body) if rec.body else None,
        len(rec.body),
        path,
        rec.error or None,
        (rec.headers.get("warc-payload-digest") or "").lower() or None,
        rec.x_robots or None,
    )


def _records_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, blob in zip(pdf["path"], pdf["content"]):
            seq = 0
            for rec in decode_warc(bytes(blob)):
                rows.append(_record_row(rec, f"{path}#{seq}", path))
                seq += 1
        yield pd.DataFrame(
            rows, columns=[f.name for f in WARC_SCHEMA.fields]
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All records of every WARC file under ``path`` (glob ok), one row
    per record; malformed records become quarantine rows (``error``
    set) instead of failing the task."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _records_kernel, schema=WARC_SCHEMA
    )


def warc_to_docs_raw(records: DataFrame, sniff: bool = False) -> DataFrame:
    """HTTP 200 ``response`` records → the extraction job's RAW_SCHEMA
    shape.  The MIME type picks the format lane; unknown MIME types
    keep their subtype as ``fmt`` so the extension gate quarantines
    them with a faithful message.  Pure column work — no shuffle.

    ``sniff=True`` stops trusting the server's Content-Type header:
    ``operators.mimetype.sniff_mime`` reads the payload's magic bytes
    (JVM cascade; zip subtypes through the Arrow sliver kernel) and the
    sniffed verdict overrides the header whenever it identifies a
    concrete container.  The header only survives where bytes cannot
    decide — ``text/plain`` (CSV vs prose vs fixed-width is a header
    call) and
    ``application/octet-stream`` (no signature matched).  Mislabeled
    payloads (an HTML error page served as ``application/pdf``) route
    to the lane that can actually parse them."""
    mime = F.lower(
        F.trim(F.element_at(F.split(F.col("content_type"), ";"), 1))
    )
    # filter BEFORE any sniffing: the magic cascade — and especially
    # the zip-sliver Arrow kernel — must only touch kept responses, so
    # the Python surface stays proportional to the corpus, not to the
    # request/metadata/error records riding in the same archives
    kept = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("error").isNull()
        & F.col("content").isNotNull()
    )
    if sniff:
        from ..operators.mimetype import sniff_mime

        kept = sniff_mime(kept, "content", out_col="_sniffed")
        mime = F.when(
            F.col("_sniffed").isin("text/plain", "application/octet-stream")
            & mime.isNotNull(),
            mime,
        ).otherwise(F.col("_sniffed"))
    fmt_map = F.create_map(
        *[F.lit(x) for kv in _MIME_FMT.items() for x in kv]
    )
    return (
        kept
        .select(
            F.col("doc_id"),
            F.coalesce(
                fmt_map[mime],
                F.element_at(F.split(mime, "/"), -1),
                F.lit("<no content-type>"),
            ).alias("fmt"),
            F.col("content"),
            F.col("n_bytes"),
            F.lit(None).cast("int").alias("header_start_row"),
            F.lit(None).cast("int").alias("header_end_row"),
            F.lit(None).cast("int").alias("data_start_row"),
            F.lit(None).cast("int").alias("data_end_row"),
            F.lit(None).cast("int").alias("sheet_idx"),
            F.col("url"),
            F.col("charset"),
        )
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET ``conversion`` records (pre-extracted UTF-8 text) as a
    documents-shaped frame: (doc_id, url, text, n_chars)."""
    recs = read_warc(spark, path)
    return recs.filter(
        (F.col("warc_type") == "conversion") & F.col("error").isNull()
    ).select(
        "doc_id",
        "url",
        F.decode(F.col("content"), "utf-8").alias("text"),
        F.length(F.decode(F.col("content"), "utf-8")).alias("n_chars"),
    )


def read_captures(
    spark: SparkSession, captures: DataFrame, archive_dir: str
) -> DataFrame:
    """Range-read ONLY the indexed captures out of their archives —
    the access pattern a CDX index exists for: pick rows from the
    (tiny) index (``cdx.latest_captures``, a mime/status filter, …),
    then fetch each record via its ``(offset, length)`` byte span
    instead of scanning petabytes of ``*.warc.gz``.

    ``captures`` needs ``(filename, offset, length)`` (the
    ``build_cdxj``/``parse_cdxj_lines`` shape).  Returns the same
    ``WARC_SCHEMA`` frame as :func:`read_warc`, so
    ``warc_to_docs_raw``/``read_wet`` compose unchanged.

    Plan: one aggregate packs the selected spans per archive file
    (span lists are index-sized), then each file is one task that
    ``seek``s to its spans in offset order — sequential forward reads,
    memory bounded by one record.  On object storage the seek+read
    pair becomes a ranged GET; the task shape is identical."""
    import os as _os

    spans = captures.groupBy("filename").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "length"))
        ).alias("spans")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, span_list in zip(pdf["filename"], pdf["spans"]):
                path = _os.path.join(archive_dir, fname)
                try:
                    fh = open(path, "rb")
                except OSError as e:
                    from ..core.warc import WarcRecord

                    rows.append(
                        _record_row(
                            WarcRecord(
                                warc_type="", uri="", record_id="",
                                date="",
                                error=f"archive open failed: {e}",
                            ),
                            f"{fname}#?", path,
                        )
                    )
                    continue
                with fh:
                    for seq, span in enumerate(span_list):
                        fh.seek(int(span["offset"]))
                        data = fh.read(int(span["length"]))
                        got = None
                        for rec in decode_warc(data):
                            got = rec
                            break
                        if got is None:
                            from ..core.warc import WarcRecord

                            got = WarcRecord(
                                warc_type="", uri="", record_id="",
                                date="",
                                error=(
                                    "no decodable record at span "
                                    f"({span['offset']}, {span['length']})"
                                ),
                            )
                        rows.append(
                            _record_row(got, f"{fname}#{seq}", path)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return spans.mapInPandas(kernel, schema=WARC_SCHEMA)
