"""Content-type sniffing (operators/mimetype.py).

Every payload comes from this repo's own REAL writers/encoders (PNG,
JPEG, GIF, BMP, WAV, AVI, xlsx, docx, epub, ods, gzip, warc), so a
signature regression in any codec shows up here as a wrong MIME, not
a hand-rolled byte string agreeing with itself.  Plan contract: the
container cascade is pure JVM; only zip rows enter the Arrow kernel.
"""

from __future__ import annotations

import gzip as _gzip

from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import mimetype as M
from machine_readability_checker_spark.core.png import encode_png
from machine_readability_checker_spark.core.jpeg import encode_jpeg
from machine_readability_checker_spark.core.gif import encode_gif
from machine_readability_checker_spark.core.bmp import encode_bmp
from machine_readability_checker_spark.core.wav import encode_wav
from machine_readability_checker_spark.core.avi import encode_avi
from machine_readability_checker_spark.core.xlsx import write_xlsx
from machine_readability_checker_spark.core.docx import write_docx
from machine_readability_checker_spark.core.epub import write_epub
from machine_readability_checker_spark.core.odf import write_ods


def _payloads():
    px = bytes([10, 20, 30, 40])  # 2x2 gray
    jpg = encode_jpeg(2, 2, 1, px)
    sheet = {"name": "S", "rows": [["a", "b"], ["1", "2"]]}
    return [
        ("png", encode_png(2, 2, 1, px), "image/png"),
        ("jpeg", jpg, "image/jpeg"),
        ("gif", encode_gif(2, 2, 1, px), "image/gif"),
        ("bmp", encode_bmp(2, 2, 1, px), "image/bmp"),
        ("wav", encode_wav(8000, 1, 16, b"\x00\x01" * 8), "audio/x-wav"),
        ("avi", encode_avi(2, 2, 5.0, [jpg]), "video/x-msvideo"),
        ("pdf", b"%PDF-1.4\n1 0 obj\n<<>>\nendobj\n", "application/pdf"),
        ("gzip", _gzip.compress(b"hello"), "application/gzip"),
        (
            "xlsx",
            write_xlsx([sheet]),
            "application/vnd.openxmlformats-officedocument"
            ".spreadsheetml.sheet",
        ),
        (
            "docx",
            write_docx([("Title", "T"), ("", "body")]),
            "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document",
        ),
        (
            "epub",
            write_epub([b"<html><body><p>c</p></body></html>"]),
            "application/epub+zip",
        ),
        (
            "ods",
            write_ods([sheet]),
            "application/vnd.oasis.opendocument.spreadsheet",
        ),
        ("rtf", b"{\\rtf1\\ansi Hello}", "text/rtf"),
        ("warc", b"WARC/1.0\r\nWARC-Type: response\r\n", "application/warc"),
        ("html", b"\n  <!DOCTYPE HTML><html><body>x", "text/html"),
        ("html2", b"<HTML><head></head>", "text/html"),
        ("xml", b'<?xml version="1.0"?><urlset/>', "application/xml"),
        ("text", "plain prose éあ".encode("utf-8"), "text/plain"),
        # UTF-16 BOM classifies as text; the header keeps subtype authority
        ("utf16", "プレーン prose".encode("utf-16"), "text/plain"),
        ("empty", b"", "application/x-empty"),
        ("binary", b"\xff\x00\xfe\x01garbage", "application/octet-stream"),
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        [(name, bytearray(blob)) for name, blob, _ in rows],
        "name string, content binary",
    )


def test_sniff_all_real_payloads(spark):
    rows = _payloads()
    out = {
        r.name: r.mime
        for r in M.sniff_mime(_df(spark, rows), "content").collect()
    }
    for name, _, want in rows:
        assert out[name] == want, (name, out[name], want)


def test_container_pass_is_jvm_only(spark):
    rows = _payloads()
    df = _df(spark, rows).withColumn(
        "mime", M.detect_mime(F.col("content"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # unrefined verdict: all four zip packages read application/zip
    got = {r.name: r.mime for r in df.collect()}
    for name in ("xlsx", "docx", "epub", "ods"):
        assert got[name] == "application/zip"


def test_zip_kernel_only_touches_zip_rows(spark):
    rows = _payloads()
    sniffed = M.sniff_mime(_df(spark, rows), "content")
    plan = sniffed._jdf.queryExecution().executedPlan().toString()
    # the Arrow kernel sits behind the zip filter, not over the corpus
    assert plan.count("ArrowEvalPython") <= 1
    assert "application/zip" in plan  # the zip filter literal is pushed


def test_corrupt_zip_keeps_container_verdict(spark):
    blob = b"PK\x03\x04" + b"\x00" * 16  # valid magic, unreadable zip
    df = spark.createDataFrame(
        [(bytearray(blob),)], "content binary"
    )
    out = M.sniff_mime(df, "content").head()
    assert out.mime == "application/zip"


def test_warc_sniff_routing_overrides_header(spark):
    """warc_to_docs_raw(sniff=True): bytes beat the Content-Type header
    for concrete containers; text/plain keeps the header's CSV call."""
    from machine_readability_checker_spark.sources.warc import (
        warc_to_docs_raw,
    )

    rows = [
        # (doc_id, declared content_type, payload, expected fmt)
        ("a", "text/html", b"%PDF-1.4\nxx", "pdf"),          # lying server
        ("b", "application/pdf", b"<html><p>404", "html"),   # error page
        ("c", "application/octet-stream",
         bytearray(write_docx([("T", "t")])), "docx"),
        ("d", "text/csv", b"a,b\n1,2\n", "csv"),             # header kept
        # no header, no signature: the sniffed subtype reaches the gate
        ("e", None, b"\x00\x01\xfe", "octet-stream"),
    ]
    records = spark.createDataFrame(
        [
            (i, "http://x/" + i, "response", 200, ct, None,
             bytearray(blob), len(blob), "f.warc", None)
            for i, ct, blob, _ in rows
        ],
        "doc_id string, url string, warc_type string, http_status int, "
        "content_type string, charset string, content binary, "
        "n_bytes long, src_file string, error string",
    )
    got = {
        r.doc_id: r.fmt
        for r in warc_to_docs_raw(records, sniff=True).collect()
    }
    for i, _, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_bm_prefixed_text_is_not_bmp(spark):
    """'BM' alone is too weak a signature: text starting with it must
    classify as text, and a truthful text/csv header must survive
    sniff-mode routing (the DIB-size guard makes BMP detection real)."""
    from machine_readability_checker_spark.sources.warc import (
        warc_to_docs_raw,
    )

    blob = b"BMW,price\n320i,45000\nM3,82000\n"
    df = spark.createDataFrame(
        [("x", bytearray(blob))], "name string, content binary"
    )
    assert M.sniff_mime(df, "content").head().mime == "text/plain"

    records = spark.createDataFrame(
        [("d0", "http://x/p.csv", "response", 200, "text/csv", None,
          bytearray(blob), len(blob), "f.warc", None)],
        "doc_id string, url string, warc_type string, http_status int, "
        "content_type string, charset string, content binary, "
        "n_bytes long, src_file string, error string",
    )
    assert warc_to_docs_raw(records, sniff=True).head().fmt == "csv"


def test_refine_zip_keeps_null_mime_rows(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"plain"), None),
         ("b", bytearray(b"plain"), "text/plain")],
        "name string, content binary, mime string",
    )
    out = M.refine_zip_subtypes(df, "content", "mime").collect()
    assert {r.name for r in out} == {"a", "b"}  # NULL row survives


def test_mislabeled_payload_is_caught(spark):
    # a "jpeg" that is actually HTML: the sniffer ignores names/labels
    df = spark.createDataFrame(
        [("photo.jpg", bytearray(b"<html><body>not an image")),],
        "name string, content binary",
    )
    out = M.sniff_mime(df, "content").head()
    assert out.mime == "text/html"


def test_rfc822_detection(spark):
    """Email payloads type message/rfc822 (two independent well-known
    header hits); 'Subject: meeting' prose stays text/plain."""
    from pyspark.sql import types as T

    from machine_readability_checker_spark.core.eml import write_eml

    rows = [
        ("msg", write_eml("S", "a@b.c", "d@e.f", plain="body")),
        ("prose", b"Subject: meeting notes\nwe should talk tomorrow"),
        ("plain", b"ordinary text with no headers at all"),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("tag", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    got = {
        r["tag"]: r["mime"]
        for r in M.sniff_mime(df, "content").collect()
    }
    assert got == {
        "msg": "message/rfc822",
        "prose": "text/plain",
        "plain": "text/plain",
    }
