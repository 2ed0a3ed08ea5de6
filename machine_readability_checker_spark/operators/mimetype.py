"""Content-type sniffing over binary payload columns (magic bytes).

A crawl never trusts the declared Content-Type: servers lie, archives
mislabel, and extensions are absent on URL paths.  Every format this
engine parses has an unambiguous leading signature, so routing can be
decided from the first bytes of the payload — and that check is pure
JVM expression work (``substring`` on a binary column compares raw
bytes; ``cast(binary as string)`` is lenient, replacement chars for
malformed sequences, so the HTML/text heuristics are safe on garbage).

Two tiers, mirroring the Bloom design: the cheap JVM cascade
(`detect_mime`) decides the CONTAINER type for every row with zero
Python and zero shuffle; only rows that land on ``application/zip``
— where the subtype lives in the member list, not the header — go
through an Arrow-batched kernel (`refine_zip_subtypes`) that reads
the zip directory with the stdlib and resolves OOXML (docx/xlsx/pptx),
EPUB, and OpenDocument.  At 100 TB the zip sliver is a few percent of
a web crawl, so the Python surface is proportional to that sliver,
not the corpus.

Signatures are the published ones (PNG ISO 15948 §5.2, JPEG/JFIF
FF D8 FF, GIF87a/89a, BMP 'BM', RIFF/WAVE + RIFF/AVI , %PDF-, gzip
RFC 1952 1F 8B, CFB D0CF11E0A1B11AE1, zip local header PK\\x03\\x04,
RTF '{\\rtf', WARC/).  No reference analog (the reference trusts the
upload's file extension, `src/processor/loader.py`); this is the
crawl-routing extension of that gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# container-level signature table: (mime, offset(1-based), bytes)
_MAGIC = [
    ("image/png", 1, b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", 1, b"\xff\xd8\xff"),
    ("image/gif", 1, b"GIF87a"),
    ("image/gif", 1, b"GIF89a"),
    ("image/tiff", 1, b"II*\x00"),
    ("image/tiff", 1, b"MM\x00*"),
    ("application/pdf", 1, b"%PDF-"),
    ("application/gzip", 1, b"\x1f\x8b"),
    ("application/x-cfb", 1, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"),
    ("application/zip", 1, b"PK\x03\x04"),
    ("text/rtf", 1, b"{\\rtf"),
    ("application/warc", 1, b"WARC/"),
    # NB: BMP's 2-byte 'BM' is too weak alone (ordinary text can start
    # 'BM'); detect_mime additionally requires a plausible DIB header
    # size at offset 15 (see the guarded clause there)
]

# BITMAPINFOHEADER-family sizes, little-endian (BMP offset 14..17):
# 12 (CORE), 40 (INFO), 52/56 (V2/V3), 108 (V4), 124 (V5)
_BMP_DIB_SIZES = [
    bytes([n, 0, 0, 0]) for n in (12, 40, 52, 56, 108, 124)
]

OOXML_MIMES = {
    "word/": (
        "application/vnd.openxmlformats-officedocument"
        ".wordprocessingml.document"
    ),
    "xl/": (
        "application/vnd.openxmlformats-officedocument"
        ".spreadsheetml.sheet"
    ),
    "ppt/": (
        "application/vnd.openxmlformats-officedocument"
        ".presentationml.presentation"
    ),
}


def detect_mime(col: Column) -> Column:
    """Binary payload → container-level MIME string, one CASE cascade
    of byte-prefix tests (codegen; CASE branches evaluate lazily per
    row, and the string-path heuristics use the lenient binary→string
    cast, so garbage bytes can never error a row):

    - the magic table above, most-specific first (RIFF splits into
      WAV/AVI/WEBP on the format tag at offset 9)
    - HTML when the payload, BOM/whitespace-trimmed and lowercased,
      starts with ``<!doctype html`` or ``<html``; ``<?xml`` →
      application/xml
    - valid non-empty UTF-8 → text/plain
    - empty → application/x-empty; anything else →
      application/octet-stream
    """
    riff = F.substring(col, 1, 4) == F.lit(b"RIFF")
    fourcc = F.substring(col, 9, 4)
    s = F.lower(
        F.regexp_replace(col.cast("string"), "^[\\s﻿]+", "")
    )
    out = F.when(riff & (fourcc == F.lit(b"WAVE")), F.lit("audio/x-wav"))
    out = out.when(riff & (fourcc == F.lit(b"AVI ")), F.lit("video/x-msvideo"))
    out = out.when(riff & (fourcc == F.lit(b"WEBP")), F.lit("image/webp"))
    for mime, off, sig in _MAGIC:
        out = out.when(
            F.substring(col, off, len(sig)) == F.lit(sig), F.lit(mime)
        )
    dib = F.substring(col, 15, 4)
    dib_ok = F.lit(False)
    for b in _BMP_DIB_SIZES:
        dib_ok = dib_ok | (dib == F.lit(b))
    out = out.when(
        (F.substring(col, 1, 2) == F.lit(b"BM")) & dib_ok,
        F.lit("image/bmp"),
    )
    out = out.when(
        s.startswith("<!doctype html") | s.startswith("<html"),
        F.lit("text/html"),
    )
    out = out.when(s.startswith("<?xml"), F.lit("application/xml"))
    # RFC 822 message: no magic bytes exist, but a real message opens
    # with one of the canonical trace/originator headers AND carries a
    # second well-known header within the head — two independent hits
    # keep "Subject: meeting notes" prose from matching.  Case-blind,
    # evaluated on the (lenient) string cast before the text/plain
    # fallback claims the row.
    raw_s = col.cast("string")
    head = F.substring(raw_s, 1, 2048)
    opens_hdr = raw_s.rlike(
        "^(?i)(Return-Path|Received|Delivered-To|From|Subject|"
        "Message-ID|Date|MIME-Version): "
    )
    second_hdr = head.rlike(
        "(?i)\n(From|To|Subject|Date|Message-ID|MIME-Version|"
        "Content-Type): "
    )
    out = out.when(opens_hdr & second_hdr, F.lit("message/rfc822"))
    out = out.when(
        F.coalesce(F.length(col), F.lit(0)) == 0, F.lit("application/x-empty")
    )
    # UTF-16 BOM: text in a non-UTF-8 encoding — classify text/plain so
    # the declared Content-Type (which carries the charset and subtype)
    # keeps routing authority, mirroring the text/plain rule below
    out = out.when(
        (F.substring(col, 1, 2) == F.lit(b"\xff\xfe"))
        | (F.substring(col, 1, 2) == F.lit(b"\xfe\xff")),
        F.lit("text/plain"),
    )
    out = out.when(
        F.try_validate_utf8(col.cast("string")).isNotNull(),
        F.lit("text/plain"),
    )
    return out.otherwise(F.lit("application/octet-stream"))


def refine_zip_subtypes(
    df: DataFrame, content_col: str = "content", mime_col: str = "mime"
) -> DataFrame:
    """Resolve ``application/zip`` rows to their real subtype by
    reading the zip member directory (stdlib ``zipfile``) in an
    Arrow-batched kernel — ONLY the zip rows enter Python; everything
    else passes through untouched (a filter + union, no shuffle).

    Resolution order: a ``mimetype`` member's CONTENT is authoritative
    (EPUB OCF §3.3 and ODF §17.4 both store the package MIME there,
    uncompressed and first); otherwise the OOXML part roots
    (``word/ xl/ ppt/``, next to ``[Content_Types].xml``) decide;
    otherwise the row stays ``application/zip``.  Unreadable/corrupt
    zips also stay ``application/zip`` — the container verdict stands
    even when the directory doesn't parse."""
    # null-safe split: a NULL mime (possible when callers pass a
    # header-derived column) must stay in `rest`, not vanish from both
    zips = df.filter(F.col(mime_col).eqNullSafe("application/zip"))
    rest = df.filter(~F.col(mime_col).eqNullSafe("application/zip"))
    schema = df.schema
    cols = df.columns
    mime_idx = cols.index(mime_col)

    def kernel(batches):
        import io
        import zipfile

        for pdf in batches:
            mimes = []
            for blob in pdf[content_col]:
                raw = bytes(blob) if blob is not None else b""
                mime = "application/zip"
                try:
                    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
                        names = zf.namelist()
                        if "mimetype" in names:
                            declared = (
                                zf.read("mimetype").decode("ascii", "ignore")
                                .strip()
                            )
                            if declared:
                                mime = declared
                        else:
                            for root, m in OOXML_MIMES.items():
                                if any(n.startswith(root) for n in names):
                                    mime = m
                                    break
                except Exception:
                    pass
                mimes.append(mime)
            pdf = pdf.copy()
            pdf[cols[mime_idx]] = mimes
            yield pdf

    refined = zips.mapInPandas(kernel, schema=schema)
    return rest.unionByName(refined)


# legacy-Office CFB subtypes: the magic is shared, the subtype lives in
# the directory stream names ([MS-CFB]; stream names per [MS-DOC]
# "WordDocument", [MS-XLS] "Workbook"/"Book", [MS-PPT] "PowerPoint
# Document")
_CFB_STREAM_MIMES = [
    ("WordDocument", "application/msword"),
    ("Workbook", "application/vnd.ms-excel"),
    ("Book", "application/vnd.ms-excel"),
    ("PowerPoint Document", "application/vnd.ms-powerpoint"),
]


def refine_cfb_subtypes(
    df: DataFrame, content_col: str = "content", mime_col: str = "mime"
) -> DataFrame:
    """Resolve ``application/x-cfb`` rows to .doc/.xls/.ppt by listing
    the container's directory streams — same filter + union shape as
    the zip refiner, so only the CFB sliver enters Python.  Unreadable
    containers stay ``application/x-cfb``."""
    cfbs = df.filter(F.col(mime_col).eqNullSafe("application/x-cfb"))
    rest = df.filter(~F.col(mime_col).eqNullSafe("application/x-cfb"))
    schema = df.schema
    cols = df.columns
    mime_idx = cols.index(mime_col)

    def kernel(batches):
        from ..core.cfb import list_streams

        for pdf in batches:
            mimes = []
            for blob in pdf[content_col]:
                raw = bytes(blob) if blob is not None else b""
                names = set(list_streams(raw))
                mime = "application/x-cfb"
                for stream, m in _CFB_STREAM_MIMES:
                    if stream in names:
                        mime = m
                        break
                mimes.append(mime)
            pdf = pdf.copy()
            pdf[cols[mime_idx]] = mimes
            yield pdf

    refined = cfbs.mapInPandas(kernel, schema=schema)
    return rest.unionByName(refined)


def sniff_mime(
    df: DataFrame, content_col: str = "content", out_col: str = "mime",
    refine_zip: bool = True,
) -> DataFrame:
    """Attach a sniffed ``mime`` column: the JVM cascade for every row,
    plus (by default) the zip- and CFB-subtype kernels over their
    respective slivers."""
    out = df.withColumn(out_col, detect_mime(F.col(content_col)))
    if refine_zip:
        out = refine_zip_subtypes(out, content_col, out_col)
        out = refine_cfb_subtypes(out, content_col, out_col)
    return out
