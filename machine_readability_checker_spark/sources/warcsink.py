"""WARC-family sinks + CDXJ index builder — the WRITE half of the
web-archive loop.

``sources/warc.py`` reads crawl archives; this module closes the loop
the way Common Crawl's own derived datasets do:

- :func:`write_wet` — extracted text → ``*.warc.wet.gz`` shards
  (WARC/1.0 ``conversion`` records behind a ``warcinfo`` header, one
  gzip member per record).  WET is the interchange format most
  LLM-corpus pipelines actually consume (C4, RefinedWeb and CCNet all
  start from WET or rebuild it), so an extraction engine that cannot
  EMIT it strands its output.
- :func:`write_wat` — page metadata (title, outlinks, HTTP fields) →
  ``*.warc.wat.gz`` shards of ``metadata`` records whose payload is
  the JSON envelope WAT consumers expect (link-graph builders read
  WAT, never the raw WARC).
- :func:`build_cdxj` — scan ``*.warc.gz`` files member-by-member and
  emit one capture row per record WITH the member's ``(offset,
  length)`` byte span; :func:`format_cdxj` serializes the rows as
  CDXJ lines that round-trip through ``sources/cdx.parse_cdxj_lines``.
  Per-record gzip members make ``file[offset : offset+length]`` a
  standalone gzip stream, so an indexed consumer range-reads ONE
  document out of a petabyte archive (:func:`read_record_at`).

100 TB design: the writers are per-partition streaming appends with
task-attempt temp files + atomic rename (same determinism contract as
``sampling.write_jsonl_shards``: md5-derived shard/order, gzip
``mtime=0`` / no FNAME, so shard BYTES are reproducible run-to-run);
the index builder is one ``binaryFile`` scan with bounded memory (one
record at a time, never the decompressed file).  Like the other file
sinks, the writers require a shared filesystem (or single node) —
executor-local disks would strand shards.

No counterpart in the reference repo (single-process, local
spreadsheet files only — ``src/processor/loader.py``); format
knowledge is the public ISO 28500 spec, the Common Crawl docs for
WET/WAT, and the pywb CDXJ description.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.warc import (
    WarcRecord,
    decode_warc,
    decode_warc_members,
    encode_warc_gz,
    encode_warc_record,
)

#: pinned WARC-Date for deterministic fixtures/oracles — callers doing
#: real exports pass their crawl timestamp instead.
DEFAULT_WARC_DATE = "2026-01-01T00:00:00Z"

_SOFTWARE = "machine-readability-checker-spark"


# ----------------------------------------------------------- record encoders


def wet_conversion_record(
    doc_id: str, url: str, text: str, date: str = DEFAULT_WARC_DATE
) -> bytes:
    """One WET ``conversion`` record: the payload IS the extracted
    UTF-8 text.  The record id embeds the doc id (``<urn:uuid:wet-X>``)
    so ``read_wet`` lands it back as ``doc_id = "wet-X"`` — the join
    key of every round-trip check."""
    return encode_warc_record(
        "conversion",
        url,
        f"<urn:uuid:wet-{doc_id}>",
        date,
        (text or "").encode("utf-8"),
        content_type="text/plain",
    )


def warcinfo_record(filename: str, date: str = DEFAULT_WARC_DATE) -> bytes:
    """Leading ``warcinfo`` record of a WET/WAT file (the Common Crawl
    layout: file metadata first, then the payload records)."""
    payload = (
        f"software: {_SOFTWARE}\r\n"
        "format: WARC file version 1.0\r\n"
        "conformsTo: ISO 28500\r\n"
    ).encode("ascii")
    return encode_warc_record(
        "warcinfo",
        "",
        f"<urn:uuid:warcinfo-{filename}>",
        date,
        payload,
        content_type="application/warc-fields",
    )


def wat_metadata_record(
    doc_id: str,
    url: str,
    title: Optional[str],
    links: Optional[List[str]],
    date: str = DEFAULT_WARC_DATE,
    http_content_type: str = "text/html",
) -> bytes:
    """One WAT ``metadata`` record: a JSON envelope in the shape WAT
    consumers read (``Envelope → Payload-Metadata →
    HTTP-Response-Metadata → HTML-Metadata`` with ``Head.Title`` and
    ``Links``).  ``sort_keys`` + compact separators pin the bytes."""
    envelope = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Date": date,
                "WARC-Target-URI": url,
                "WARC-Type": "response",
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": {"Title": title or ""},
                        "Links": [{"url": u} for u in (links or [])],
                    },
                    "Headers": {"Content-Type": http_content_type},
                },
            },
        }
    }
    payload = json.dumps(
        envelope, ensure_ascii=False, sort_keys=True, separators=(",", ":")
    ).encode("utf-8")
    return encode_warc_record(
        "metadata",
        url,
        f"<urn:uuid:wat-{doc_id}>",
        date,
        payload,
        content_type="application/json",
    )


# ----------------------------------------------------------------- sharding


def _with_shards(
    df: DataFrame, n_shards: int, id_col: str, shard_by: str
) -> DataFrame:
    """Attach ``(shard, position)``.  ``hash`` (default): the md5-based
    deterministic global shuffle of ``sampling.training_order`` — the
    right layout for training exports.  ``mod``: ``id % n_shards``
    with in-shard order by id — arithmetic, so a SQL oracle can
    regenerate the assignment (the driver-lane mode)."""
    if shard_by == "mod":
        return df.withColumn(
            "shard", F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
            .cast("int"),
        ).withColumn("position", F.col(id_col).cast("long"))
    from ..operators.sampling import training_order

    return training_order(df, n_shards=n_shards, id_col=id_col)


def _shard_writer_kernel(
    path: str,
    suffix: str,
    record_fn,
    date: str,
):
    """Shared per-partition streaming writer: rows arrive clustered and
    ordered by ``(shard, position)``; each shard opens once, leads with
    its ``warcinfo`` member, appends one gzip member per record, and
    atomically renames on close.  Bytes are run-to-run reproducible
    (pinned date, mtime=0 members, attempt-suffixed temp)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        state: dict = {}  # shard -> [fh, count, final_path, tmp]

        def fh_for(shard: int):
            if shard not in state:
                name = f"shard-{shard:05d}.{suffix}"
                p = os.path.join(path, name)
                tmp = f"{p}.attempt-{attempt}"
                fh = open(tmp, "wb")
                fh.write(encode_warc_gz([warcinfo_record(name, date)]))
                state[shard] = [fh, 0, p, tmp]
            return state[shard]

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = fh_for(int(row.shard))
                entry[0].write(encode_warc_gz([record_fn(row)]))
                entry[1] += 1
        rows = []
        for shard, (fh, count, p, tmp) in sorted(state.items()):
            fh.close()
            os.replace(tmp, p)
            rows.append(
                {
                    "shard": shard,
                    "n_docs": count,
                    "n_bytes": os.path.getsize(p),
                    "path": p,
                }
            )
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_bytes", "path"]
        )

    return kernel


_MANIFEST_SCHEMA = "shard int, n_docs long, n_bytes long, path string"


def write_wet(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    url_col: str = "url",
    text_col: str = "text",
    date: str = DEFAULT_WARC_DATE,
    shard_by: str = "hash",
) -> DataFrame:
    """Extracted text → ``shard-NNNNN.warc.wet.gz`` files; returns the
    manifest ``(shard, n_docs, n_bytes, path)``.  Round-trip contract:
    ``read_wet(spark, path)`` lands ``(doc_id="wet-<id>", url, text)``
    with text byte-identical (UTF-8)."""
    # plain (non-underscore) working names: pandas itertuples renames
    # underscore-prefixed columns positionally, which would break the
    # writer kernel's attribute access
    sel = df.select(
        F.col(id_col).alias("rid"),
        F.col(url_col).alias("rurl"),
        F.coalesce(F.col(text_col), F.lit("")).alias("rtext"),
    )
    sharded = _with_shards(sel, n_shards, "rid", shard_by)

    def rec(row) -> bytes:
        return wet_conversion_record(str(row.rid), row.rurl, row.rtext, date)

    return (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .mapInPandas(
            _shard_writer_kernel(path, "warc.wet.gz", rec, date),
            schema=_MANIFEST_SCHEMA,
        )
    )


def write_wat(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    url_col: str = "url",
    title_col: str = "title",
    links_col: str = "links",
    date: str = DEFAULT_WARC_DATE,
    shard_by: str = "hash",
) -> DataFrame:
    """Page metadata → ``shard-NNNNN.warc.wat.gz`` files (JSON envelope
    ``metadata`` records); returns the same manifest shape as
    :func:`write_wet`."""
    sel = df.select(
        F.col(id_col).alias("rid"),
        F.col(url_col).alias("rurl"),
        F.col(title_col).alias("rtitle"),
        F.col(links_col).alias("rlinks"),
    )
    sharded = _with_shards(sel, n_shards, "rid", shard_by)

    def rec(row) -> bytes:
        links = list(row.rlinks) if row.rlinks is not None else []
        return wat_metadata_record(
            str(row.rid), row.rurl, row.rtitle, links, date
        )

    return (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .mapInPandas(
            _shard_writer_kernel(path, "warc.wat.gz", rec, date),
            schema=_MANIFEST_SCHEMA,
        )
    )


def resource_record(
    doc_id: str,
    media_ref: str,
    content: bytes,
    content_type: str,
    date: str = DEFAULT_WARC_DATE,
) -> bytes:
    """One ``resource`` record holding a media blob — how web archives
    store non-HTTP-captured binary objects (ISO 28500 §6.4).  The URI
    is a URN carrying the (doc, ref) identity so an interleaved corpus
    round-trips: span ``media_ref`` → archive URI → range-read."""
    return encode_warc_record(
        "resource",
        f"urn:mrc:media/{doc_id}/{media_ref}",
        f"<urn:uuid:res-{doc_id}-{media_ref}>",
        date,
        content,
        content_type=content_type or "application/octet-stream",
    )


#: the WARC 1.0 revisit profile for "same bytes as an earlier capture"
#: — the vocabulary Heritrix/Common Crawl use for archive-level dedup.
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def revisit_record(
    uri: str,
    record_id: str,
    refers_to_id: str,
    refers_to_uri: str,
    refers_to_date: str,
    payload_digest: str,
    date: str = DEFAULT_WARC_DATE,
    payload: bytes = b"",
    content_type: str = "application/octet-stream",
) -> bytes:
    """One ``revisit`` record (ISO 28500 §6.7.2, identical-payload-
    digest profile): the capture whose payload bytes already live in an
    earlier record.  The payload is NOT stored again — the record
    carries only the declared ``WARC-Payload-Digest`` plus the
    ``WARC-Refers-To*`` pointers a reader resolves through the CDX
    index.  For revisits of HTTP responses pass the response header
    block as ``payload`` (the spec keeps headers, drops the body)."""
    return encode_warc_record(
        "revisit",
        uri,
        record_id,
        date,
        payload,
        content_type=content_type,
        extra_headers={
            "WARC-Profile": REVISIT_PROFILE,
            "WARC-Refers-To": refers_to_id,
            "WARC-Refers-To-Target-URI": refers_to_uri,
            "WARC-Refers-To-Date": refers_to_date,
            "WARC-Payload-Digest": payload_digest,
        },
    )


def write_warc_resources(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    date: str = DEFAULT_WARC_DATE,
    shard_by: str = "hash",
    dedup: bool = False,
) -> DataFrame:
    """Media store rows ``(doc_id, media_ref, content)`` → sharded
    ``*.warc.gz`` of ``resource`` records (one gzip member each, so
    ``build_cdxj``/``read_captures`` range-read single blobs out of the
    archive).  Content types come from the magic-byte sniffer — the
    record must describe the BYTES, not whatever label rode in.
    Returns the usual shard manifest.

    ``dedup=True`` is the Common Crawl storage dedup: per distinct
    payload sha256, the FIRST row (by rid — deterministic) is stored as
    a full ``resource`` record and every other row becomes a
    ``revisit`` record pointing at it (identical-payload-digest
    profile).  A web corpus repeats the same logo/tracking-pixel bytes
    millions of times; at 100 TB this is the difference between
    archiving unique bytes and archiving the crawl.  Cost: one extra
    shuffle, on the digest (high-cardinality, skew-free by
    construction).  Readers resolve revisits via
    :func:`resolve_revisits` over the CDX index."""
    from ..operators.mimetype import sniff_mime

    sel = sniff_mime(
        df.select(
            F.concat_ws("#", "doc_id", "media_ref").alias("rid"),
            F.col("doc_id").cast("string").alias("rdoc"),
            F.col("media_ref").alias("rref"),
            "content",
        ),
        "content",
        out_col="rtype",
    )
    if dedup:
        from pyspark.sql import Window

        w = Window.partitionBy("digest").orderBy("rid")
        sel = (
            sel.withColumn(
                "digest", F.concat(F.lit("sha256:"), F.sha2("content", 256))
            )
            .withColumn("rn", F.row_number().over(w))
            .withColumn("odoc", F.first("rdoc").over(w))
            .withColumn("oref", F.first("rref").over(w))
            .withColumn(
                "content",
                F.when(F.col("rn") == 1, F.col("content")),
            )
        )
    else:
        sel = (
            sel.withColumn("digest", F.lit(None).cast("string"))
            .withColumn("rn", F.lit(1))
            .withColumn("odoc", F.lit(None).cast("string"))
            .withColumn("oref", F.lit(None).cast("string"))
        )
    sharded = _with_shards(sel, n_shards, "rid", shard_by)

    def rec(row) -> bytes:
        if row.rn == 1:
            return resource_record(
                row.rdoc, row.rref, bytes(row.content), row.rtype, date
            )
        return revisit_record(
            f"urn:mrc:media/{row.rdoc}/{row.rref}",
            f"<urn:uuid:res-{row.rdoc}-{row.rref}>",
            f"<urn:uuid:res-{row.odoc}-{row.oref}>",
            f"urn:mrc:media/{row.odoc}/{row.oref}",
            date,
            row.digest,
            date,
            content_type=row.rtype or "application/octet-stream",
        )

    return (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .mapInPandas(
            _shard_writer_kernel(path, "warc.gz", rec, date),
            schema=_MANIFEST_SCHEMA,
        )
    )


def resolve_revisits(index_df: DataFrame) -> DataFrame:
    """Resolve ``revisit`` captures in a CDX index to the byte span of
    the record that actually holds their payload — the wayback-style
    read path for a deduplicated archive.  Concrete captures pass
    through unchanged; each revisit row keeps its own identity columns
    (``surt``/``ts``/``url``) but takes ``(filename, offset, length)``
    from the earliest concrete capture with the same payload digest, so
    :func:`~..sources.warc.read_captures` fetches the stored bytes.

    Plan: both sides are index rows (~0.1% of archive bytes); the
    originals side is ONE aggregate per digest and the join shuffles on
    the digest — never the archives themselves.  A revisit whose digest
    has no concrete capture anywhere (stale index, partial sync) comes
    back with a NULL filename so callers can quarantine it instead of
    silently dropping the capture."""
    cols = index_df.columns
    revisits = index_df.filter(F.col("mime") == "warc/revisit")
    concrete = index_df.filter(
        (F.col("mime") != "warc/revisit") | F.col("mime").isNull()
    )
    originals = concrete.groupBy(F.col("digest").alias("o_digest")).agg(
        F.min(F.struct("filename", "offset", "length")).alias("o_span")
    )
    resolved = (
        revisits.join(
            originals, F.col("digest") == F.col("o_digest"), "left"
        )
        .withColumn("filename", F.col("o_span.filename"))
        .withColumn("offset", F.col("o_span.offset"))
        .withColumn("length", F.col("o_span.length"))
        .select(*cols)
    )
    return concrete.unionByName(resolved)


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT shards → ``(doc_id, url, title, links)`` — the JSON envelope
    parsed back JVM-side (``from_json``; the Python kernel only splits
    records, same as every WARC read)."""
    from .warc import read_warc

    env_schema = (
        "Envelope struct<`Payload-Metadata` struct<"
        "`HTTP-Response-Metadata` struct<`HTML-Metadata` struct<"
        "Head struct<Title string>, "
        "Links array<struct<url string>>>>>>"
    )
    recs = read_warc(spark, path).filter(
        (F.col("warc_type") == "metadata") & F.col("error").isNull()
    )
    j = F.from_json(F.decode(F.col("content"), "utf-8"), env_schema)
    html_meta = j["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["HTML-Metadata"]
    return recs.select(
        "doc_id",
        "url",
        html_meta["Head"]["Title"].alias("title"),
        F.transform(html_meta["Links"], lambda s: s["url"]).alias("links"),
    )


# -------------------------------------------------------------- CDXJ build

_TS_DIGITS = re.compile(r"\D")

#: record types a CDX index covers (warcinfo/request/metadata rows are
#: bookkeeping, not captures).  Revisit records ARE captures — wayback
#: convention indexes them as mime ``warc/revisit`` with the DECLARED
#: payload digest (their stored body is empty by design), which is
#: exactly what lets ``resolve_revisits`` find the stored bytes.
_INDEXED_TYPES = ("response", "conversion", "resource", "revisit")


def _capture_rows(data: bytes, filename: str) -> List[tuple]:
    rows = []
    for offset, length, rec in decode_warc_members(data):
        if rec.error or rec.warc_type not in _INDEXED_TYPES:
            continue
        if rec.warc_type == "revisit":
            mime = "warc/revisit"
            digest = (
                rec.headers.get("warc-payload-digest", "").lower() or None
            )
        elif rec.warc_type == "response":
            mime = (
                rec.http_content_type.split(";", 1)[0].strip().lower()
                or None
            )
            digest = "sha256:" + hashlib.sha256(rec.body).hexdigest()
        else:
            mime = (
                rec.headers.get("content-type", "")
                .split(";", 1)[0]
                .strip()
                .lower()
                or None
            )
            digest = "sha256:" + hashlib.sha256(rec.body).hexdigest()
        rows.append(
            (
                rec.uri or None,
                _TS_DIGITS.sub("", rec.date)[:14] or None,
                mime,
                rec.http_status,
                digest,
                length,
                offset,
                filename,
            )
        )
    return rows


def build_cdxj(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan every ``*.warc(.wet).gz`` under ``path_glob`` and emit one
    capture row per indexed record: ``(surt, ts, url, mime, status,
    digest, length, offset, filename)`` — the column shape
    ``sources/cdx.parse_cdxj_lines`` produces, so downstream planners
    (``latest_captures`` / ``fetch_plan``) run unchanged on a
    just-built index.

    Plan: one ``binaryFile`` scan (file = task granule, memory bounded
    by one record via the member walk) → Arrow kernel → a narrow JVM
    map for the SURT key.  The index is ~0.1% of the archive bytes;
    building it is one pass."""
    from ..operators.weburl import surt_key

    files = spark.read.format("binaryFile").load(path_glob)
    schema = (
        "url string, ts string, mime string, status int, digest string,"
        " length long, offset long, filename string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[tuple] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    _capture_rows(bytes(blob), os.path.basename(path))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "ts", "mime", "status", "digest", "length",
                    "offset", "filename",
                ],
            )

    parsed = files.select("path", "content").mapInPandas(
        kernel, schema=schema
    )
    return parsed.select(
        surt_key(F.col("url")).alias("surt"),
        "ts", "url", "mime", "status", "digest", "length", "offset",
        "filename",
    )


def format_cdxj(df: DataFrame) -> DataFrame:
    """Capture rows → CDXJ ``value`` lines (``<surt> <ts> <json>``),
    pure JVM; ``parse_cdxj_lines(format_cdxj(df))`` round-trips.  Write
    with ``df.sort("surt", "ts").write.text(...)`` for a
    wayback-compatible sorted index."""
    j = F.to_json(
        F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("status").cast("string").alias("status"),
            F.col("digest"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("filename"),
        )
    )
    return df.select(
        F.concat_ws(" ", F.col("surt"), F.col("ts"), j).alias("value")
    )


def audit_cdxj(
    spark: SparkSession, index_df: DataFrame, path_glob: str
) -> DataFrame:
    """Archive-integrity audit (the ``warcio check`` role at corpus
    scale): range-read EVERY indexed capture back out of its archive
    via the ``(offset, length)`` span and verify (a) the slice decodes
    to a standalone record whose ``WARC-Target-URI`` matches the
    indexed ``url`` and (b) the payload sha256 matches ``digest``.
    Returns one row per archive file: ``(filename, n_captures,
    n_uri_ok, n_digest_ok)`` — a healthy index has all three equal.

    Plan: the index is aggregated to one capture-list row per file
    (tiny — the index is ~0.1% of archive bytes), joined to the
    ``binaryFile`` scan on filename, and each file is audited inside
    one Arrow kernel task.  File = task granule, same as the build."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
        "content",
    )
    caps = index_df.groupBy("filename").agg(
        F.collect_list(
            F.struct("offset", "length", "url", "digest")
        ).alias("captures")
    )
    joined = files.join(F.broadcast(caps), "filename")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, blob, captures in zip(
                pdf["filename"], pdf["content"], pdf["captures"]
            ):
                data = bytes(blob)
                n = uri_ok = digest_ok = 0
                for cap in captures:
                    n += 1
                    rec = read_record_at(
                        data, int(cap["offset"]), int(cap["length"])
                    )
                    if not rec.error and rec.uri == cap["url"]:
                        uri_ok += 1
                    if rec.warc_type == "revisit":
                        # revisit bodies are empty by design: the
                        # auditable claim is the DECLARED digest
                        got = rec.headers.get(
                            "warc-payload-digest", ""
                        ).lower()
                    else:
                        got = (
                            "sha256:"
                            + hashlib.sha256(rec.body).hexdigest()
                        )
                    if not rec.error and got == cap["digest"]:
                        digest_ok += 1
                rows.append((fname, n, uri_ok, digest_ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "filename", "n_captures", "n_uri_ok", "n_digest_ok",
                ],
            )

    return joined.mapInPandas(
        kernel,
        schema=(
            "filename string, n_captures long, n_uri_ok long,"
            " n_digest_ok long"
        ),
    )


def read_record_at(data: bytes, offset: int, length: int) -> WarcRecord:
    """Range-read: decode the single record at a CDX ``(offset,
    length)`` span of a ``.warc.gz``.  On a real deployment the slice
    is a ranged GET against object storage; the decode itself is
    identical.  A span that holds no decodable record (stale index,
    rewritten archive) comes back as an error record, not a raise —
    same fail-soft contract as the decoders."""
    for rec in decode_warc(bytes(data[offset : offset + length])):
        return rec
    return WarcRecord(
        warc_type="", uri="", record_id="", date="",
        error="no decodable record at (offset, length) span",
    )
