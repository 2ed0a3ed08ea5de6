"""WARC / WET codec (ISO 28500, the web-crawl archive format).

Common Crawl — the input a real 100 TB extraction run reads — ships as
``*.warc.gz`` files: a CONCATENATION of per-record gzip members, each
member holding exactly one WARC record.  That layout is what makes the
format Spark-friendly at all: a reader can stream members one at a
time with bounded memory, and the per-file unit of work parallelizes
across executors (a gzip stream is not splittable mid-member, so the
file — ~1 GB in Common Crawl — is the task granule).

This module is the dependency-free codec: encode (for fixtures and the
deterministic driver lane) and decode (for ingest).  The Spark wiring
lives in ``sources/warc.py``.

Record grammar (WARC/1.0)::

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length payload bytes>
    \r\n\r\n

For ``WARC-Type: response`` records the payload is a full HTTP
response (status line, headers, blank line, body); the document bytes
are the HTTP body and the charset hint comes from the HTTP
``Content-Type`` header.  ``conversion`` records (WET files) carry
already-extracted UTF-8 text as the payload directly.

No counterpart exists in the reference repo (single-process, local
files only); format knowledge is from the public ISO 28500 spec and
the Common Crawl documentation.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
# per-record decompression cap: a 1 GB warc.gz member expanding past
# this is a zip bomb, not a web page (Common Crawl caps response
# payloads at 1 MiB; we allow 64 MiB headroom for outliers)
MAX_RECORD_BYTES = 64 * 1024 * 1024


@dataclass
class WarcRecord:
    """One decoded record.  ``body`` is the document payload: the HTTP
    body for response records, the raw payload otherwise."""

    warc_type: str
    uri: str
    record_id: str
    date: str
    headers: dict = field(default_factory=dict)
    http_status: Optional[int] = None
    http_content_type: str = ""
    http_location: str = ""
    x_robots: str = ""
    charset: str = ""
    body: bytes = b""
    error: str = ""


# ---------------------------------------------------------------- encode


def encode_warc_record(
    warc_type: str,
    uri: str,
    record_id: str,
    date: str,
    payload: bytes,
    content_type: str = "application/http; msgtype=response",
    extra_headers: Optional[dict] = None,
) -> bytes:
    """Serialize one WARC/1.0 record (uncompressed).  ``extra_headers``
    adds named WARC headers verbatim (``WARC-Payload-Digest``,
    ``WARC-Refers-To``, ``WARC-Profile`` — the revisit-record
    vocabulary)."""
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: " + record_id.encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
    ]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode("ascii"))
    for k, v in (extra_headers or {}).items():
        head.append(f"{k}: {v}".encode("ascii"))
    head.append(b"Content-Type: " + content_type.encode("ascii"))
    head.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF


def encode_http_response(
    body: bytes, content_type: str = "text/html; charset=utf-8",
    status: int = 200,
    content_encoding: str = "",
    chunked: bool = False,
    chunk_size: int = 256,
) -> bytes:
    """Build the HTTP response payload a ``response`` record carries.

    ``content_encoding``/``chunked`` produce the wire shapes real
    crawls archive (Heritrix and wget store the response AS SENT, so
    gzip/deflate bodies and chunked framing survive into the WARC):

    - ``"gzip"`` — gzip-wrapped body (mtime pinned for determinism)
    - ``"deflate"`` — zlib-wrapped per RFC 9110
    - ``"deflate-raw"`` — RAW deflate but LABELED ``deflate``: the
      notorious IE-era server bug; the decoder must cope
    - ``chunked=True`` — Transfer-Encoding chunked framing with
      ``chunk_size``-byte chunks, a chunk extension on the first chunk
      (decoders must ignore them) and no HTTP Content-Length
    """
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "OK"
    )
    hdrs = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    if content_encoding:
        label = (
            "deflate" if content_encoding == "deflate-raw"
            else content_encoding
        )
        hdrs.append(f"Content-Encoding: {label}")
        if content_encoding in ("gzip", "x-gzip"):
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            body = buf.getvalue()
        elif content_encoding == "deflate":
            body = zlib.compress(body)
        elif content_encoding == "deflate-raw":
            co = zlib.compressobj(wbits=-15)
            body = co.compress(body) + co.flush()
        else:
            raise ValueError(
                f"encoder supports gzip/deflate[-raw]: {content_encoding}"
            )
    if chunked:
        hdrs.append("Transfer-Encoding: chunked")
        out = []
        for i in range(0, len(body), chunk_size) or [0]:
            chunk = body[i : i + chunk_size]
            ext = b";x=1" if i == 0 else b""
            out.append(
                format(len(chunk), "x").encode("ascii") + ext + CRLF
                + chunk + CRLF
            )
        out.append(b"0" + CRLF + CRLF)
        body = b"".join(out)
    else:
        hdrs.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(hdrs) + "\r\n\r\n").encode("ascii") + body


def _dechunk(data: bytes) -> Tuple[bytes, str]:
    """Undo Transfer-Encoding chunked framing: ``(body, error)``.
    Chunk extensions (``;name=val``) are ignored per RFC 9112 §7.1.1,
    trailer fields after the 0-chunk are dropped.  Malformed framing
    returns the raw bytes with an error string — fail-soft."""
    out = []
    pos = 0
    total = 0
    while True:
        eol = data.find(CRLF, pos)
        if eol < 0:
            return data, "malformed chunked framing: no size line"
        size_tok = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return data, (
                "malformed chunked framing: bad size "
                f"{size_tok[:16]!r}"
            )
        if size == 0:
            return b"".join(out), ""
        start = eol + 2
        end = start + size
        if end + 2 > len(data) or data[end : end + 2] != CRLF:
            return data, "malformed chunked framing: truncated chunk"
        total += size
        if total > MAX_RECORD_BYTES:
            return data, (
                f"chunked body exceeds cap ({MAX_RECORD_BYTES} bytes)"
            )
        out.append(data[start:end])
        pos = end + 2


def _decode_content_encoding(data: bytes, ce: str) -> Tuple[bytes, str]:
    """Undo HTTP ``Content-Encoding``: ``(body, error)``.  gzip accepts
    zlib-or-gzip wrapping (wbits 47) with a raw-deflate fallback, and
    ``deflate`` accepts both the RFC zlib form and the legacy raw form
    — the real-world server-bug matrix.  Unsupported codings (br, zstd
    — no stdlib decoder) return an error so the record quarantines
    instead of feeding compressed bytes to the text lanes."""
    if ce in ("gzip", "x-gzip", "deflate"):
        # label-vs-reality matrix of real servers: gzip may be raw
        # deflate; "deflate" may be zlib (RFC), raw (IE-era bug), or
        # even gzip — try the labeled form first, then the impostors
        for wbits in ((47, -15) if ce != "deflate" else (15, -15, 47)):
            d = zlib.decompressobj(wbits=wbits)
            try:
                body = d.decompress(data, MAX_RECORD_BYTES)
                if d.unconsumed_tail:
                    return data, (
                        f"{ce} body exceeds decompression cap "
                        f"({MAX_RECORD_BYTES} bytes) — bomb guard"
                    )
                body += d.flush()
            except zlib.error:
                continue
            if d.eof:  # complete stream (truncated → try next / error)
                return body, ""
        return data, f"undecodable {ce} body"
    return data, f"unsupported content-encoding: {ce}"


def encode_warc_gz(records: List[bytes]) -> bytes:
    """Concatenate records as per-record gzip members — the Common
    Crawl ``.warc.gz`` layout.  mtime is pinned to 0 so same input →
    same bytes (fixture and oracle determinism)."""
    out = io.BytesIO()
    for rec in records:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        out.write(buf.getvalue())
    return out.getvalue()


# ---------------------------------------------------------------- decode

_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)\"?", re.I)


def decode_warc_members(
    data: bytes,
) -> Iterator[Tuple[int, int, WarcRecord]]:
    """``(offset, compressed_length, record)`` per gzip member of a
    ``.warc.gz`` — the member walk behind :func:`decode_warc`, exposed
    with byte spans because they are what a CDX index records: with
    per-record gzip members, ``data[offset : offset + length]`` is a
    standalone gzip stream holding exactly one record, so an index
    consumer can range-read a single document out of a petabyte
    archive (the Common Crawl / pywb access pattern).

    Error records (corrupt/truncated/bomb members) carry ``length 0``
    and the walk stops at them, mirroring ``decode_warc``'s fail-soft
    contract."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(data[pos:], MAX_RECORD_BYTES)
            if d.unconsumed_tail:
                yield pos, 0, WarcRecord(
                    warc_type="", uri="", record_id="", date="",
                    error=(
                        "record exceeds decompression cap "
                        f"({MAX_RECORD_BYTES} bytes) — bomb guard"
                    ),
                )
                return
            raw += d.flush()
        except zlib.error as e:
            yield pos, 0, WarcRecord(
                warc_type="", uri="", record_id="", date="",
                error=f"gzip member decode failed: {e}",
            )
            return
        if not d.eof:
            yield pos, 0, WarcRecord(
                warc_type="", uri="", record_id="", date="",
                error="truncated gzip member at end of file",
            )
            return
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: no forward progress
            yield pos, 0, _parse_record(raw)
            return
        yield pos, consumed, _parse_record(raw)
        pos += consumed


def _parse_headers(block: bytes) -> Tuple[dict, str]:
    """Parse an RFC-822-style header block; returns ({lower: value},
    first_line)."""
    lines = block.split(CRLF)
    first = lines[0].decode("latin-1", "replace")
    hdrs: dict = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            hdrs[k.decode("latin-1", "replace").strip().lower()] = (
                v.decode("latin-1", "replace").strip()
            )
    return hdrs, first


def _parse_record(raw: bytes) -> WarcRecord:
    sep = raw.find(CRLF + CRLF)
    if sep < 0 or not raw.startswith(b"WARC/"):
        return WarcRecord(
            warc_type="", uri="", record_id="", date="",
            error="malformed record: no WARC header block",
        )
    hdrs, _ = _parse_headers(raw[:sep])
    try:
        length = int(hdrs.get("content-length", ""))
    except ValueError:
        return WarcRecord(
            warc_type=hdrs.get("warc-type", ""), uri="", record_id="",
            date="", error="malformed record: bad Content-Length",
        )
    payload = raw[sep + 4 : sep + 4 + length]
    rec = WarcRecord(
        warc_type=hdrs.get("warc-type", ""),
        uri=hdrs.get("warc-target-uri", ""),
        record_id=hdrs.get("warc-record-id", ""),
        date=hdrs.get("warc-date", ""),
        headers=hdrs,
    )
    if len(payload) < length:
        rec.error = (
            f"truncated record: payload {len(payload)} < "
            f"declared {length}"
        )
        rec.body = payload
        return rec
    if (
        rec.warc_type in ("response", "revisit")
        and payload[:5] in (b"HTTP/",)
    ):
        hsep = payload.find(CRLF + CRLF)
        if hsep < 0:
            rec.error = "malformed HTTP response: no header terminator"
            rec.body = payload
            return rec
        http_hdrs, status_line = _parse_headers(payload[:hsep])
        parts = status_line.split(None, 2)
        try:
            rec.http_status = int(parts[1])
        except (IndexError, ValueError):
            rec.http_status = None
        rec.http_content_type = http_hdrs.get("content-type", "")
        rec.http_location = http_hdrs.get("location", "")
        # the HTTP-header form of robots-meta (indexing opt-out served
        # per-response; REP extension documented by the major engines)
        rec.x_robots = http_hdrs.get("x-robots-tag", "")
        m = _CHARSET_RE.search(rec.http_content_type)
        rec.charset = m.group(1).lower() if m else ""
        rec.body = payload[hsep + 4 :]
        # real crawls archive the response AS SENT: undo the transfer
        # framing first (outermost), then the content coding.  Both
        # fail soft — the raw bytes stay on the record and the error
        # string routes it to quarantine instead of feeding compressed
        # bytes to the text lanes.  Revisit records carry the response
        # HEADERS only (ISO 28500 §6.7.2) — their body is empty by
        # definition, so the wire codings are not undone.
        if rec.warc_type == "revisit":
            return rec
        te = http_hdrs.get("transfer-encoding", "").lower()
        if "chunked" in te:
            rec.body, err = _dechunk(rec.body)
            if err:
                rec.error = err
                return rec
        ce = http_hdrs.get("content-encoding", "").strip().lower()
        codings = [
            c.strip() for c in ce.split(",") if c.strip()
            and c.strip() != "identity"
        ]
        for coding in reversed(codings):  # applied last → undone first
            rec.body, err = _decode_content_encoding(rec.body, coding)
            if err:
                rec.error = err
                return rec
    else:
        rec.body = payload
        m = _CHARSET_RE.search(hdrs.get("content-type", ""))
        rec.charset = m.group(1).lower() if m else ""
    return rec


def decode_warc(data: bytes) -> Iterator[WarcRecord]:
    """Stream records from ``.warc`` or ``.warc.gz`` bytes.

    Gzip input is walked MEMBER BY MEMBER via ``zlib.decompressobj``
    (+``unused_data``) so memory stays bounded by one record, never the
    file: that is the property that lets an executor hold a 1 GB
    Common Crawl file as a single task.  A corrupt member yields one
    error record and decoding stops at it (everything before is kept —
    fail-soft, quarantine-friendly)."""
    if data[:2] == _GZIP_MAGIC:
        for _off, _length, rec in decode_warc_members(data):
            yield rec
    else:
        # uncompressed .warc: records are self-delimiting via
        # Content-Length + the CRLF CRLF trailer
        pos = 0
        while pos < len(data):
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                return
            sep = data.find(CRLF + CRLF, nxt)
            if sep < 0:
                yield WarcRecord(
                    warc_type="", uri="", record_id="", date="",
                    error="truncated record: unterminated header block",
                )
                return
            hdrs, _ = _parse_headers(data[nxt:sep])
            try:
                length = int(hdrs.get("content-length", ""))
            except ValueError:
                length = 0
            end = sep + 4 + length + 4
            yield _parse_record(data[nxt : min(end, len(data))])
            pos = end
