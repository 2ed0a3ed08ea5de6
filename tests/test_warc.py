"""WARC/WET source (core/warc.py + sources/warc.py) and charset
sniffing (core/html.py).

Fixtures are built with this repo's own encoder — byte-deterministic
(gzip mtime pinned to 0) so the same corpus yields the same archive
bytes on every run.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.core.html import sniff_charset
from machine_readability_checker_spark.core.warc import (
    decode_warc,
    encode_http_response,
    encode_warc_gz,
    encode_warc_record,
)
from machine_readability_checker_spark.sources.warc import (
    read_warc,
    read_wet,
    warc_to_docs_raw,
)

_DATE = "2026-01-01T00:00:00Z"


def _response_record(i: int, body: bytes, ctype="text/html; charset=utf-8"):
    return encode_warc_record(
        "response",
        f"https://example.com/page/{i}",
        f"<urn:uuid:rec-{i:04d}>",
        _DATE,
        encode_http_response(body, content_type=ctype),
    )


def _wet_record(i: int, text: str):
    return encode_warc_record(
        "conversion",
        f"https://example.com/page/{i}",
        f"<urn:uuid:wet-{i:04d}>",
        _DATE,
        text.encode("utf-8"),
        content_type="text/plain",
    )


HTML_BODY = (
    b"<html><head><title>T</title></head><body><p>"
    + b"content sentence long enough to classify as main text. " * 3
    + b"</p></body></html>"
)


def test_roundtrip_gz_and_plain():
    recs = [_response_record(i, HTML_BODY) for i in range(3)]
    for blob in (encode_warc_gz(recs), b"".join(recs)):
        out = list(decode_warc(blob))
        assert len(out) == 3
        for i, r in enumerate(out):
            assert r.error == ""
            assert r.warc_type == "response"
            assert r.uri == f"https://example.com/page/{i}"
            assert r.http_status == 200
            assert r.charset == "utf-8"
            assert r.body == HTML_BODY


def test_roundtrip_is_byte_deterministic():
    recs = [_response_record(i, HTML_BODY) for i in range(3)]
    assert encode_warc_gz(recs) == encode_warc_gz(recs)


def test_wet_conversion_record():
    r = next(iter(decode_warc(encode_warc_gz([_wet_record(0, "héllo")]))))
    assert r.warc_type == "conversion"
    assert r.body.decode("utf-8") == "héllo"


def test_truncated_gzip_member_fail_soft():
    blob = encode_warc_gz([_response_record(i, HTML_BODY) for i in range(3)])
    out = list(decode_warc(blob[: len(blob) - 20]))
    # first two members intact, third yields an error record
    assert [r.error == "" for r in out[:2]] == [True, True]
    assert out[-1].error != ""


def test_corrupt_member_fail_soft():
    good = encode_warc_gz([_response_record(0, HTML_BODY)])
    blob = good + b"\x1f\x8b\x99garbage-not-gzip"
    out = list(decode_warc(blob))
    assert out[0].error == "" and out[-1].error != ""


def test_truncated_payload_marks_record():
    rec = _response_record(0, HTML_BODY)
    # cut into the payload: declared Content-Length exceeds the bytes
    out = list(decode_warc(rec[: len(rec) - 40]))
    assert out and "truncated" in out[0].error


def test_non_http_payload_kept_raw():
    rec = encode_warc_record(
        "warcinfo", "", "<urn:uuid:info>", _DATE, b"robots: classic\r\n",
        content_type="application/warc-fields",
    )
    r = next(iter(decode_warc(rec)))
    assert r.warc_type == "warcinfo" and r.body.startswith(b"robots")


# ------------------------------------------------------------- charset


@pytest.mark.parametrize(
    "content,hint,want",
    [
        (b"\xef\xbb\xbfabc", "", "utf-8-sig"),
        (b"\xff\xfea\x00", "", "utf-16-le"),
        (b"plain ascii", "", "utf-8"),
        (b"caf\xe9 latin", "", "cp1252"),  # invalid utf-8 -> cp1252
        (b"x", "Shift_JIS", "shift_jis"),
        (b"x", "ISO-8859-1", "cp1252"),
        (b'<meta charset="EUC-JP"><p>x</p>', "", "euc_jp"),
        # BOM outranks the transport hint
        (b"\xef\xbb\xbfx", "shift_jis", "utf-8-sig"),
        # hint outranks meta
        (b'<meta charset="euc-jp">', "utf-8", "utf-8"),
    ],
)
def test_sniff_charset(content, hint, want):
    assert sniff_charset(content, hint) == want


def test_charset_hint_reaches_html_extraction():
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )

    body = (
        "<html><body><p>"
        + "日本語の本文テキストが充分に長い文章で続きます。" * 4
        + "</p></body></html>"
    ).encode("shift_jis")
    hit = extract_document("d", "html", body, charset_hint="shift_jis")
    texts = " ".join(s["text"] for s in hit["spans"])
    assert "日本語の本文テキスト" in texts
    miss = extract_document("d", "html", body)
    assert "日本語の本文テキスト" not in " ".join(
        s["text"] for s in miss["spans"]
    )


# ------------------------------------------------------------- spark


@pytest.fixture()
def warc_file(tmp_path):
    recs = []
    for i in range(4):
        recs.append(_response_record(i, HTML_BODY))
    recs.append(_wet_record(9, "pre-extracted text body"))
    recs.append(
        encode_warc_record(
            "response",
            "https://example.com/miss",
            "<urn:uuid:rec-404>",
            _DATE,
            encode_http_response(b"gone", status=404),
        )
    )
    recs.append(
        encode_warc_record(
            "response",
            "https://example.com/bin",
            "<urn:uuid:rec-bin>",
            _DATE,
            encode_http_response(
                b"\x00\x01", content_type="application/octet-stream"
            ),
        )
    )
    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(encode_warc_gz(recs))
    return str(p)


def test_read_warc_spark(spark, warc_file):
    recs = read_warc(spark, warc_file)
    assert recs.count() == 7
    assert recs.filter(F.col("error").isNotNull()).count() == 0
    ids = {r["doc_id"] for r in recs.select("doc_id").collect()}
    assert "rec-0000" in ids  # urn:uuid wrapper stripped


def test_warc_to_docs_raw_and_extract(spark, warc_file):
    from machine_readability_checker_spark.operators.extract import extract

    raw = warc_to_docs_raw(read_warc(spark, warc_file))
    rows = raw.collect()
    # 404 and the WET record are filtered; octet-stream kept for the
    # extension gate to quarantine
    assert {r["fmt"] for r in rows} == {"html", "octet-stream"}
    assert all(r["url"] for r in rows)
    got = extract(raw.filter(F.col("fmt") == "html"))
    out = got.collect()
    assert len(out) == 4
    for r in out:
        kinds = [s["kind"] for s in r["spans"]]
        assert "title" in kinds and "main" in kinds
        assert r["metrics"]["parse_errors"] == 0


def test_read_wet_spark(spark, warc_file):
    wet = read_wet(spark, warc_file).collect()
    assert len(wet) == 1
    assert wet[0]["text"] == "pre-extracted text body"
    assert wet[0]["n_chars"] == len("pre-extracted text body")


# ------------------------- HTTP wire encodings (chunked / gzip / deflate)


def _wire_record(body: bytes, **wire):
    return encode_warc_record(
        "response",
        "https://example.com/wire",
        "<urn:uuid:wire-1>",
        _DATE,
        encode_http_response(body, **wire),
    )


@pytest.mark.parametrize(
    "wire",
    [
        {"content_encoding": "gzip"},
        {"content_encoding": "x-gzip"},
        {"content_encoding": "deflate"},
        {"content_encoding": "deflate-raw"},  # raw labeled "deflate"
        {"chunked": True},
        {"chunked": True, "chunk_size": 7},
        {"content_encoding": "gzip", "chunked": True},
        {"content_encoding": "deflate", "chunked": True, "chunk_size": 11},
    ],
    ids=lambda w: "+".join(
        f"{k}={v}" for k, v in w.items()
    ),
)
def test_http_wire_encodings_restore_bytes(wire):
    body = ("wire body é 日本 " * 40).encode("utf-8")
    rec = next(iter(decode_warc(_wire_record(body, **wire))))
    assert rec.error == ""
    assert rec.http_status == 200
    assert rec.body == body
    assert rec.charset == "utf-8"


def test_identity_and_header_case_insensitive():
    body = b"<html>plain</html>"
    payload = (
        b"HTTP/1.1 200 OK\r\nCONTENT-ENCODING: identity\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    rec = next(
        iter(
            decode_warc(
                encode_warc_record(
                    "response", "https://e.com/x", "<urn:uuid:i>",
                    _DATE, payload,
                )
            )
        )
    )
    assert rec.error == "" and rec.body == body


def test_unsupported_content_coding_quarantines():
    body = b"\x0b\x02\x80hello\x03"  # pretend-brotli
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
        b"Content-Type: text/html\r\n\r\n" + body
    )
    rec = next(
        iter(
            decode_warc(
                encode_warc_record(
                    "response", "https://e.com/br", "<urn:uuid:br>",
                    _DATE, payload,
                )
            )
        )
    )
    assert "unsupported content-encoding: br" in rec.error
    assert rec.body == body  # raw bytes preserved for forensics


def test_malformed_chunked_framing_quarantines():
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/html\r\n\r\nZZZ\r\nnot chunks"
    )
    rec = next(
        iter(
            decode_warc(
                encode_warc_record(
                    "response", "https://e.com/chz", "<urn:uuid:chz>",
                    _DATE, payload,
                )
            )
        )
    )
    assert "malformed chunked framing" in rec.error


def test_truncated_gzip_body_quarantines():
    import io as _io

    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(b"x" * 500)
    cut = buf.getvalue()[:-8]  # drop CRC/ISIZE trailer + tail
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: " + str(len(cut)).encode() + b"\r\n\r\n" + cut
    )
    rec = next(
        iter(
            decode_warc(
                encode_warc_record(
                    "response", "https://e.com/tg", "<urn:uuid:tg>",
                    _DATE, payload,
                )
            )
        )
    )
    assert "undecodable gzip body" in rec.error


def test_wire_encoded_pages_flow_through_extraction(spark, tmp_path):
    """Spark-level: gzip/chunked/deflate pages extract identically to
    their identity twins — the wire shape must be invisible."""
    from machine_readability_checker_spark.operators.extract import extract
    from machine_readability_checker_spark.sources.warc import (
        warc_to_docs_raw,
    )

    wires = [
        {},
        {"content_encoding": "gzip"},
        {"content_encoding": "deflate"},
        {"chunked": True, "chunk_size": 13},
        {"content_encoding": "gzip", "chunked": True},
    ]
    recs = []
    for i, wire in enumerate(wires):
        recs.append(
            encode_warc_record(
                "response",
                f"https://example.com/w/{i}",
                f"<urn:uuid:wire-{i}>",
                _DATE,
                encode_http_response(HTML_BODY, **wire),
            )
        )
    p = tmp_path / "wire-00000.warc.gz"
    p.write_bytes(encode_warc_gz(recs))
    raw = warc_to_docs_raw(read_warc(spark, str(p)))
    out = extract(raw).collect()
    assert len(out) == len(wires)
    span_seqs = {
        tuple((s["kind"], s["text"]) for s in r["spans"]) for r in out
    }
    assert len(span_seqs) == 1  # all five wire shapes → identical spans
    assert all(r["metrics"]["parse_errors"] == 0 for r in out)


def test_gzip_body_mislabeled_deflate():
    """The third real-server bug: a gzip stream under Content-Encoding:
    deflate — zlib(15) and raw(-15) fail, the 47 fallback decodes it."""
    import io as _io

    body = ("mislabeled " * 30).encode()
    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(body)
    wire = buf.getvalue()
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: " + str(len(wire)).encode() + b"\r\n\r\n" + wire
    )
    rec = next(
        iter(
            decode_warc(
                encode_warc_record(
                    "response", "https://e.com/md", "<urn:uuid:md>",
                    _DATE, payload,
                )
            )
        )
    )
    assert rec.error == "" and rec.body == body
