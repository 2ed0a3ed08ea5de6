"""WARC-family sinks + CDXJ index builder (sources/warcsink.py).

The write half of the web-archive loop: WET/WAT shard export, the
member-offset walk, CDXJ build/format round-trips, and the range-read
audit.  Fixtures are this repo's own encoders — byte-deterministic
(gzip mtime pinned), so shard bytes are reproducible run-to-run.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.core.warc import (
    decode_warc,
    decode_warc_members,
    encode_warc_gz,
    encode_warc_record,
)
from machine_readability_checker_spark.sources.cdx import (
    fetch_plan,
    latest_captures,
    parse_cdxj_lines,
)
from machine_readability_checker_spark.sources.warc import read_wet
from machine_readability_checker_spark.sources.warcsink import (
    audit_cdxj,
    build_cdxj,
    format_cdxj,
    read_record_at,
    read_wat,
    wet_conversion_record,
    write_wat,
    write_wet,
)

N_DOCS = 40
N_SHARDS = 4


def _docs(spark):
    return spark.range(0, N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://Example.com/p/"), F.col("id")).alias("url"),
        F.when(F.col("id") == 7, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("téxt body\n"), F.col("id")))
        .alias("text"),
    )


@pytest.fixture(scope="module")
def wet_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wet"))
    manifest = write_wet(
        _docs(spark), d, n_shards=N_SHARDS, shard_by="mod"
    ).collect()
    return d, manifest


def _glob(d: str) -> str:
    return os.path.join(d, "*.warc.wet.gz")


# ------------------------------------------------------------------ WET


def test_wet_manifest_shape(wet_dir):
    d, manifest = wet_dir
    assert sorted((r.shard, r.n_docs) for r in manifest) == [
        (s, N_DOCS // N_SHARDS) for s in range(N_SHARDS)
    ]
    for r in manifest:
        assert os.path.getsize(r.path) == r.n_bytes > 0
        assert os.path.basename(r.path) == f"shard-{r.shard:05d}.warc.wet.gz"


def test_wet_roundtrip_text_exact(spark, wet_dir):
    d, _ = wet_dir
    back = read_wet(spark, _glob(d)).withColumn(
        "orig", F.regexp_extract("doc_id", r"wet-(\d+)", 1).cast("long")
    )
    orig = _docs(spark).select(
        F.col("doc_id").alias("orig"),
        F.col("url").alias("u0"),
        F.coalesce("text", F.lit("")).alias("t0"),
    )
    j = back.join(orig, "orig")
    assert j.count() == N_DOCS
    assert j.filter(F.col("text") != F.col("t0")).count() == 0
    assert j.filter(F.col("url") != F.col("u0")).count() == 0


def test_wet_shard_leads_with_warcinfo(wet_dir):
    d, manifest = wet_dir
    recs = list(decode_warc(open(manifest[0].path, "rb").read()))
    assert recs[0].warc_type == "warcinfo"
    assert all(r.warc_type == "conversion" for r in recs[1:])
    assert all(not r.error for r in recs)


def test_wet_mod_sharding_is_arithmetic(spark, wet_dir):
    d, _ = wet_dir
    for shard in range(N_SHARDS):
        p = os.path.join(d, f"shard-{shard:05d}.warc.wet.gz")
        ids = [
            int(r.record_id.split("wet-")[1].rstrip(">"))
            for r in decode_warc(open(p, "rb").read())
            if r.warc_type == "conversion"
        ]
        assert all(i % N_SHARDS == shard for i in ids)
        assert ids == sorted(ids)  # position = id within a mod shard


def test_wet_bytes_deterministic(spark, wet_dir, tmp_path):
    d, _ = wet_dir
    d2 = str(tmp_path / "again")
    write_wet(_docs(spark), d2, n_shards=N_SHARDS, shard_by="mod").collect()
    for f in sorted(os.listdir(d)):
        assert (
            open(os.path.join(d, f), "rb").read()
            == open(os.path.join(d2, f), "rb").read()
        ), f


def test_wet_hash_sharding_matches_training_order(spark, tmp_path):
    from machine_readability_checker_spark.operators.sampling import (
        training_order,
    )

    d = str(tmp_path / "hashed")
    write_wet(_docs(spark), d, n_shards=N_SHARDS, shard_by="hash").collect()
    want = {
        (int(r["rid"]), r["shard"])
        for r in training_order(
            _docs(spark).select(F.col("doc_id").alias("rid")),
            n_shards=N_SHARDS,
            id_col="rid",
        ).collect()
    }
    got = set()
    for shard in range(N_SHARDS):
        p = os.path.join(d, f"shard-{shard:05d}.warc.wet.gz")
        for r in decode_warc(open(p, "rb").read()):
            if r.warc_type == "conversion":
                got.add((int(r.record_id.split("wet-")[1].rstrip(">")), shard))
    assert got == want


# ------------------------------------------------------------------ WAT


def test_wat_roundtrip(spark, tmp_path):
    d = str(tmp_path / "wat")
    pages = _docs(spark).select(
        "doc_id",
        "url",
        F.concat(F.lit("Title "), F.col("doc_id")).alias("title"),
        F.array(
            F.lit("https://a/1"),
            F.concat(F.lit("https://b/"), F.col("doc_id")),
        ).alias("links"),
    )
    write_wat(pages, d, n_shards=2, shard_by="mod").collect()
    back = read_wat(spark, os.path.join(d, "*.warc.wat.gz")).withColumn(
        "orig", F.regexp_extract("doc_id", r"wat-(\d+)", 1).cast("long")
    )
    rows = {r.orig: r for r in back.collect()}
    assert len(rows) == N_DOCS
    assert rows[3].title == "Title 3"
    assert list(rows[3].links) == ["https://a/1", "https://b/3"]


# ------------------------------------------- member offsets / range read


def test_member_offsets_are_standalone_gzip_spans():
    recs = [
        wet_conversion_record(str(i), f"https://x/{i}", f"body {i}")
        for i in range(5)
    ]
    data = encode_warc_gz(recs)
    members = list(decode_warc_members(data))
    assert len(members) == 5
    assert members[0][0] == 0
    assert sum(m[1] for m in members) == len(data)
    for off, length, rec in members:
        alone = read_record_at(data, off, length)
        assert not alone.error
        assert alone.record_id == rec.record_id
        assert alone.body == rec.body


def test_member_walk_fail_soft_spans():
    recs = [wet_conversion_record("1", "https://x/1", "ok")]
    data = encode_warc_gz(recs) + b"\x1f\x8b\x08GARBAGE"
    members = list(decode_warc_members(data))
    assert len(members) == 2
    assert not members[0][2].error
    assert members[1][1] == 0 and members[1][2].error


# ------------------------------------------------------------------ CDXJ


def test_build_cdxj_rows(spark, wet_dir):
    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d))
    rows = idx.collect()
    # warcinfo records are bookkeeping, not captures
    assert len(rows) == N_DOCS
    by_url = {r.url: r for r in rows}
    r3 = by_url["https://Example.com/p/3"]
    assert r3.surt == "com,example)/p/3"
    assert r3.ts == "20260101000000"
    assert r3.mime == "text/plain"
    assert r3.filename == f"shard-{3 % N_SHARDS:05d}.warc.wet.gz"
    body = ("téxt body\n3").encode("utf-8")
    assert r3.digest == "sha256:" + hashlib.sha256(body).hexdigest()


def test_cdxj_format_parse_roundtrip(spark, wet_dir):
    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d))
    cols = [
        "surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "filename",
    ]
    back = parse_cdxj_lines(format_cdxj(idx))
    a = {tuple(r) for r in idx.select(*cols).collect()}
    b = {tuple(r) for r in back.select(*cols).collect()}
    assert a == b


def test_audit_cdxj_all_green(spark, wet_dir):
    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d))
    audit = audit_cdxj(spark, idx, _glob(d)).collect()
    assert len(audit) == N_SHARDS
    for r in audit:
        assert r.n_captures == r.n_uri_ok == r.n_digest_ok == (
            N_DOCS // N_SHARDS
        )


def test_audit_cdxj_catches_stale_index(spark, wet_dir, tmp_path):
    """Rewrite one shard with different text but keep the OLD index —
    the digests no longer match, and the audit must say so."""
    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d)).cache()
    idx.count()
    stale = str(tmp_path / "stale")
    os.makedirs(stale)
    for f in os.listdir(d):
        data = open(os.path.join(d, f), "rb").read()
        if f == "shard-00001.warc.wet.gz":
            recs = [
                r for r in decode_warc(data) if r.warc_type == "conversion"
            ]
            data = encode_warc_gz(
                [
                    wet_conversion_record(
                        r.record_id.split("wet-")[1].rstrip(">"),
                        r.uri,
                        "TAMPERED",
                    )
                    for r in recs
                ]
            )
        open(os.path.join(stale, f), "wb").write(data)
    audit = {
        r.filename: r
        for r in audit_cdxj(
            spark, idx, os.path.join(stale, "*.warc.wet.gz")
        ).collect()
    }
    bad = audit["shard-00001.warc.wet.gz"]
    assert bad.n_digest_ok == 0  # every capture's digest now wrong
    good = audit["shard-00000.warc.wet.gz"]
    assert good.n_digest_ok == good.n_captures


def test_cdxj_feeds_existing_planner(spark, wet_dir):
    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d)).withColumn(
        "status", F.coalesce("status", F.lit(200))
    )
    plan = fetch_plan(latest_captures(idx)).collect()
    assert len(plan) == N_SHARDS
    for r in plan:
        assert r.n_captures == N_DOCS // N_SHARDS
        assert list(r.offsets) == sorted(r.offsets)


def test_cdxj_skips_response_bookkeeping(spark, tmp_path):
    """request/metadata records and error members never index."""
    from machine_readability_checker_spark.core.warc import (
        encode_http_response,
    )

    recs = [
        encode_warc_record(
            "response",
            "https://e.com/a",
            "<urn:uuid:r1>",
            "2026-01-02T03:04:05Z",
            encode_http_response(b"<html>x</html>"),
        ),
        encode_warc_record(
            "request",
            "https://e.com/a",
            "<urn:uuid:q1>",
            "2026-01-02T03:04:05Z",
            b"GET /a HTTP/1.1\r\n\r\n",
            content_type="application/http; msgtype=request",
        ),
        encode_warc_record(
            "metadata",
            "https://e.com/a",
            "<urn:uuid:m1>",
            "2026-01-02T03:04:05Z",
            b"{}",
            content_type="application/json",
        ),
    ]
    p = tmp_path / "mixed-00000.warc.gz"
    p.write_bytes(encode_warc_gz(recs))
    rows = build_cdxj(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].status == 200 and rows[0].mime == "text/html"
    assert rows[0].ts == "20260102030405"


# -------------------------------------------------- range-read source


def test_read_captures_matches_full_read(spark, wet_dir):
    from machine_readability_checker_spark.sources.warc import (
        read_captures,
    )

    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d))
    got = read_captures(spark, idx, d)
    full = read_wet(spark, _glob(d))
    a = {
        (r.doc_id, bytes(r.content or b""))
        for r in got.filter(F.col("error").isNull()).collect()
    }
    b = {
        (r.doc_id, (r.text or "").encode("utf-8"))
        for r in full.collect()
    }
    assert a == b and len(a) == N_DOCS


def test_read_captures_fetches_only_selection(spark, wet_dir):
    from machine_readability_checker_spark.sources.warc import (
        read_captures,
    )

    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d))
    sel = idx.filter(F.col("surt").endswith("/3"))
    rows = read_captures(spark, sel, d).collect()
    assert len(rows) == 1
    assert rows[0].url == "https://Example.com/p/3"
    assert rows[0].error is None


def test_read_captures_missing_archive_fail_soft(spark, wet_dir):
    from machine_readability_checker_spark.sources.warc import (
        read_captures,
    )

    d, _ = wet_dir
    idx = build_cdxj(spark, _glob(d)).withColumn(
        "filename", F.lit("does-not-exist.warc.gz")
    )
    rows = read_captures(spark, idx.limit(3), d).collect()
    assert len(rows) == 1  # one quarantine row per unreadable archive
    assert "archive open failed" in rows[0].error


# -------------------------------------------- media resource archives


def test_warc_resources_roundtrip(spark, tmp_path):
    from machine_readability_checker_spark.sources.warc import read_warc
    from machine_readability_checker_spark.sources.warcsink import (
        write_warc_resources,
    )

    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    pdf = b"%PDF-1.7\n" + b"obj " * 16
    blob = b"\x81\x83\x85\x87" * 20  # invalid UTF-8, no known magic
    df = spark.createDataFrame(
        [("d1", "m1.png", bytearray(png)),
         ("d2", "m2.pdf", bytearray(pdf)),
         ("d2", "m3.bin", bytearray(blob))],
        "doc_id string, media_ref string, content binary",
    )
    d = str(tmp_path / "media_warc")
    manifest = write_warc_resources(df, d, n_shards=2).collect()
    assert sum(r.n_docs for r in manifest) == 3

    back = {
        r.url: r
        for r in read_warc(
            spark, os.path.join(d, "*.warc.gz")
        ).filter(F.col("warc_type") == "resource").collect()
    }
    assert len(back) == 3
    r1 = back["urn:mrc:media/d1/m1.png"]
    assert bytes(r1.content) == png and r1.content_type == "image/png"
    assert (
        back["urn:mrc:media/d2/m2.pdf"].content_type == "application/pdf"
    )
    assert (
        back["urn:mrc:media/d2/m3.bin"].content_type
        == "application/octet-stream"
    )

    # the archive is range-readable: index + audit all green
    idx = build_cdxj(spark, os.path.join(d, "*.warc.gz"))
    audit = audit_cdxj(spark, idx, os.path.join(d, "*.warc.gz")).collect()
    assert sum(r.n_captures for r in audit) == 3
    assert all(r.n_digest_ok == r.n_captures for r in audit)


# ------------------------------------------------------- revisit records


def _dup_media(spark):
    """9 blobs over 3 distinct payloads: group g = id % 3, so each
    payload is stored once and revisited twice."""
    return spark.range(0, 9).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("m0.bin").alias("media_ref"),
        F.encode(
            F.concat(F.lit("%PDF-1.7 payload-"), F.pmod("id", F.lit(3))),
            "utf-8",
        ).alias("content"),
    )


@pytest.fixture(scope="module")
def dedup_dir(spark, tmp_path_factory):
    from machine_readability_checker_spark.sources.warcsink import (
        write_warc_resources,
    )

    d = str(tmp_path_factory.mktemp("dedup_warc"))
    manifest = write_warc_resources(
        _dup_media(spark), d, n_shards=2, dedup=True
    ).collect()
    return d, manifest


def test_revisit_record_parse():
    from machine_readability_checker_spark.sources.warcsink import (
        REVISIT_PROFILE,
        revisit_record,
    )

    raw = revisit_record(
        "urn:mrc:media/d5/m0.bin",
        "<urn:uuid:res-d5-m0.bin>",
        "<urn:uuid:res-d2-m0.bin>",
        "urn:mrc:media/d2/m0.bin",
        "2026-01-01T00:00:00Z",
        "sha256:" + "0" * 64,
    )
    rec = next(decode_warc(raw))
    assert rec.warc_type == "revisit" and not rec.error
    assert rec.body == b""
    assert rec.headers["warc-profile"] == REVISIT_PROFILE
    assert rec.headers["warc-refers-to"] == "<urn:uuid:res-d2-m0.bin>"
    assert (
        rec.headers["warc-refers-to-target-uri"]
        == "urn:mrc:media/d2/m0.bin"
    )
    assert rec.headers["warc-payload-digest"] == "sha256:" + "0" * 64


def test_revisit_of_http_response_keeps_headers_only():
    from machine_readability_checker_spark.sources.warcsink import (
        revisit_record,
    )

    http_heads = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Encoding: gzip\r\n\r\n"
    )
    raw = revisit_record(
        "https://example.com/",
        "<urn:uuid:rv-1>",
        "<urn:uuid:orig-1>",
        "https://example.com/",
        "2026-01-01T00:00:00Z",
        "sha256:" + "f" * 64,
        payload=http_heads,
        content_type="application/http; msgtype=response",
    )
    rec = next(decode_warc(raw))
    # the HTTP block parses (status, type, charset) but the empty body
    # must NOT be fed to the gzip decoder
    assert rec.warc_type == "revisit" and not rec.error
    assert rec.http_status == 200 and rec.charset == "utf-8"
    assert rec.body == b""


def test_dedup_archive_stores_each_payload_once(spark, dedup_dir):
    from machine_readability_checker_spark.sources.warc import read_warc

    d, manifest = dedup_dir
    assert sum(r.n_docs for r in manifest) == 9
    recs = read_warc(spark, os.path.join(d, "*.warc.gz")).filter(
        F.col("warc_type").isin("resource", "revisit")
    ).collect()
    full = [r for r in recs if r.warc_type == "resource"]
    revs = [r for r in recs if r.warc_type == "revisit"]
    assert len(full) == 3 and len(revs) == 6
    # originals are the first rid per payload group (deterministic)
    assert sorted(r.url for r in full) == [
        "urn:mrc:media/d0/m0.bin",
        "urn:mrc:media/d1/m0.bin",
        "urn:mrc:media/d2/m0.bin",
    ]
    by_digest = {
        "sha256:" + hashlib.sha256(bytes(r.content)).hexdigest(): r
        for r in full
    }
    for r in revs:
        assert not bytes(r.content or b"")
        assert r.payload_digest in by_digest


def test_dedup_index_audit_and_resolution(spark, dedup_dir):
    from machine_readability_checker_spark.sources.warc import (
        read_captures,
    )
    from machine_readability_checker_spark.sources.warcsink import (
        resolve_revisits,
    )

    d, _ = dedup_dir
    glob = os.path.join(d, "*.warc.gz")
    idx = build_cdxj(spark, glob)
    rows = idx.collect()
    assert len(rows) == 9
    revs = [r for r in rows if r.mime == "warc/revisit"]
    assert len(revs) == 6
    # declared digests ride into the index, so resolution can join
    digests = {r.digest for r in rows if r.mime != "warc/revisit"}
    assert {r.digest for r in revs} == digests

    audit = audit_cdxj(spark, idx, glob).collect()
    assert sum(r.n_captures for r in audit) == 9
    assert all(
        r.n_digest_ok == r.n_uri_ok == r.n_captures for r in audit
    )

    resolved = resolve_revisits(idx)
    assert resolved.count() == 9
    # every resolved span now yields the stored payload bytes
    got = read_captures(spark, resolved, d).filter(
        F.col("error").isNull()
    ).collect()
    assert len(got) == 9
    for r in got:
        body = bytes(r.content or b"")
        assert body.startswith(b"%PDF-1.7 payload-")
        assert (
            "sha256:" + hashlib.sha256(body).hexdigest()
            in digests
        )
    # exactly 3 distinct payloads, each fetched 3 times
    from collections import Counter

    counts = Counter(bytes(r.content) for r in got)
    assert sorted(counts.values()) == [3, 3, 3]


def test_resolve_revisits_dangling_digest_is_null_span(spark, dedup_dir):
    from machine_readability_checker_spark.sources.warcsink import (
        resolve_revisits,
    )

    d, _ = dedup_dir
    idx = build_cdxj(spark, os.path.join(d, "*.warc.gz"))
    # orphan one revisit: rewrite its digest to something never stored
    orphaned = idx.withColumn(
        "digest",
        F.when(
            (F.col("mime") == "warc/revisit")
            & (F.col("url") == "urn:mrc:media/d3/m0.bin"),
            F.lit("sha256:" + "d" * 64),
        ).otherwise(F.col("digest")),
    )
    bad = (
        resolve_revisits(orphaned)
        .filter(F.col("filename").isNull())
        .collect()
    )
    assert [r.url for r in bad] == ["urn:mrc:media/d3/m0.bin"]
