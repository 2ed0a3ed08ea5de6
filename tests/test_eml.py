"""Email lane (.eml) + mbox archive source."""

from __future__ import annotations

import gzip

import pytest

from machine_readability_checker_spark.core.eml import (
    extract_eml_spans,
    write_eml,
)
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.sources.mailbox import (
    read_mbox,
    split_mbox,
    write_mbox,
)

LONG = "This body sentence is long enough to classify as main content."


def test_plain_message_full_vocabulary():
    spans, err = extract_eml_spans(write_eml(
        "Quarterly numbers", "ana@example.com", "team@example.com",
        plain=(f"{LONG}\n\n> quoted question?\nshort ack.\n\n-- \nAna"),
        attachments=[("a.csv", b"x,y\n")],
    ))
    assert err is None
    assert spans == [
        ("title", "Quarterly numbers", ""),
        ("boilerplate",
         "From: ana@example.com | To: team@example.com | "
         "Date: Mon, 17 Aug 2026 10:00:00 +0000", ""),
        ("main", LONG, ""),
        ("boilerplate", "quoted question?", ""),
        ("boilerplate", "short ack.", ""),
        ("boilerplate", "Ana", ""),
        ("media", "", "attachment:a.csv"),
    ]


def test_multipart_alternative_prefers_plain():
    spans, _ = extract_eml_spans(write_eml(
        "S", "a@b.c", "d@e.f",
        plain=LONG,
        html="<html><body><p>html twin must lose</p></body></html>",
    ))
    assert ("main", LONG, "") in spans
    assert not any("lose" in t for _k, t, _m in spans)


def test_html_only_routes_through_html_lane():
    spans, _ = extract_eml_spans(write_eml(
        "S", "a@b.c", "d@e.f",
        html=f"<html><body><h1>Head</h1><p>{LONG}</p></body></html>",
    ))
    assert ("heading", "Head", "") in spans
    assert ("main", LONG, "") in spans


def test_rfc2047_subject_and_transfer_decode():
    spans, _ = extract_eml_spans(write_eml(
        "結果の共有 — final", "k@x.jp", "t@x.jp",
        plain="日本語の本文がそのまま転送符号化を通って届く確認です。",
    ))
    assert spans[0] == ("title", "結果の共有 — final", "")
    assert spans[2][1] == "日本語の本文がそのまま転送符号化を通って届く確認です。"


def test_quarantine_paths():
    spans, err = extract_eml_spans(b"")
    assert spans == [] and err is not None
    out = extract_document("e", "eml", b"")
    assert out["parse_error"] is not None


# --------------------------------------------------------------- mbox


def test_mbox_split_and_from_quoting():
    m1 = write_eml("A", "a@x.co", "b@x.co", plain=LONG)
    m2 = write_eml("B", "c@x.co", "d@x.co",
                   plain="From the start this line is body.\n\n"
                         ">From stays one level down.")
    msgs = split_mbox(write_mbox([m1, m2]))
    assert len(msgs) == 2
    # mboxrd round trip at the BYTES level: body "From " and ">From "
    # lines come back exactly (writer added one ">", split removed it)
    assert b"\nFrom the start this line is body." in msgs[1]
    assert b"\n>From stays one level down." in msgs[1]
    assert b">>From" not in msgs[1]
    s2, err = extract_eml_spans(msgs[1])
    assert err is None
    texts = [t for _k, t, _m in s2]
    assert "From the start this line is body." in texts
    # downstream, the eml lane treats the ">"-line as a quoted reply
    assert "From stays one level down." in texts


def test_mbox_gzip_and_quarantine():
    arc = write_mbox([write_eml("A", "a@x.co", "b@x.co", plain=LONG)])
    assert len(split_mbox(gzip.compress(arc))) == 1
    with pytest.raises(ValueError):
        split_mbox(b"plain text, no envelope")


def test_mbox_source_spark(spark, tmp_path):
    msgs = [
        write_eml(f"T{i}", f"u{i}@x.co", "l@x.co", plain=f"{LONG} #{i}")
        for i in range(3)
    ]
    (tmp_path / "list.mbox.gz").write_bytes(
        gzip.compress(write_mbox(msgs))
    )
    raw = read_mbox(spark, str(tmp_path / "*.mbox.gz"))
    rows = sorted(
        (r["doc_id"], r["fmt"]) for r in raw.collect()
    )
    assert rows == [
        (f"list.mbox.gz!{i}", "eml") for i in range(3)
    ]
    first = raw.filter("doc_id = 'list.mbox.gz!0'").first()
    out = extract_document("x", "eml", bytes(first["content"]))
    assert out["parse_error"] is None
    assert out["spans"][0]["text"] == "T0"

    (tmp_path / "bad.mbox").write_bytes(b"no envelope here")
    bad = read_mbox(spark, str(tmp_path / "bad.mbox")).collect()
    assert len(bad) == 1 and bad[0]["fmt"] == "__mbox_error__"
