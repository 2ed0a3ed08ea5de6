"""EXIF codec + scan/scrub operators.

Codec pins: APP1 build → parse round-trip in both byte orders, GPS
sign handling, strip leaves pixels byte-identical (decode equality),
malformed blobs raise.  Operator pins: scan rows match the built
metadata, strip output re-scans clean, quarantine rows instead of
task failures, unknown containers pass through a scrub untouched.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from machine_readability_checker_spark.core.exif import (
    build_exif_app1,
    insert_app1,
    iter_jpeg_segments,
    parse_exif,
    strip_jpeg_metadata,
    strip_png_metadata,
)
from machine_readability_checker_spark.core.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from machine_readability_checker_spark.core.png import decode_png, encode_png
from machine_readability_checker_spark.operators.exifscan import (
    scan_exif,
    strip_metadata,
)


def _base_jpeg() -> bytes:
    px = np.clip(
        np.mgrid[0:8, 0:8].sum(0) * 16, 0, 255
    ).astype(np.uint8)
    return encode_jpeg(8, 8, 1, px.tobytes(), quality=90)


@pytest.mark.parametrize("order", ["II", "MM"])
def test_exif_roundtrip_both_byte_orders(order):
    app1 = build_exif_app1(
        make="ACME", model="Shooter 9", orientation=6,
        datetime="2021:07:04 12:00:00", gps=(35.0, -120.0),
        byte_order=order,
    )
    jpg = insert_app1(_base_jpeg(), app1)
    meta = parse_exif(jpg)
    assert meta is not None
    assert meta["make"] == "ACME"
    assert meta["model"] == "Shooter 9"
    assert meta["orientation"] == 6
    assert meta["datetime"] == "2021:07:04 12:00:00"
    assert meta["has_gps"] is True
    assert meta["gps_lat"] == pytest.approx(35.0, abs=1e-6)
    assert meta["gps_lon"] == pytest.approx(-120.0, abs=1e-6)


def test_gps_fractional_and_signs():
    app1 = build_exif_app1(gps=(-33.8688, 151.2093))
    meta = parse_exif(insert_app1(_base_jpeg(), app1))
    assert meta["gps_lat"] == pytest.approx(-33.8688, abs=1e-4)
    assert meta["gps_lon"] == pytest.approx(151.2093, abs=1e-4)


def test_no_exif_is_none_not_error():
    assert parse_exif(_base_jpeg()) is None


def test_strip_jpeg_preserves_pixels_and_removes_exif():
    base = _base_jpeg()
    jpg = insert_app1(
        base, build_exif_app1(make="X", gps=(1.0, 2.0))
    )
    # also give it a COM segment (free-text comment)
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    jpg = jpg[:2] + com + jpg[2:]
    stripped = strip_jpeg_metadata(jpg)
    assert parse_exif(stripped) is None
    assert b"hello" not in stripped
    assert decode_jpeg(stripped) == decode_jpeg(base)
    # idempotent
    assert strip_jpeg_metadata(stripped) == stripped


def test_strip_png_preserves_pixels():
    px = bytes(range(64))
    png = encode_png(8, 8, 1, px)
    # splice a tEXt chunk after IHDR (sig 8 + IHDR 25 bytes)
    import zlib

    payload = b"Author\x00somebody"
    chunk = (
        struct.pack(">L", len(payload)) + b"tEXt" + payload
        + struct.pack(">L", zlib.crc32(b"tEXt" + payload))
    )
    tagged = png[:33] + chunk + png[33:]
    out = strip_png_metadata(tagged)
    assert b"somebody" not in out
    assert decode_png(out) == decode_png(png)
    assert strip_png_metadata(out) == out


@pytest.mark.parametrize(
    "blob",
    [
        b"\xff\xd8\x00\x00\x00\x00",  # bad marker alignment
        # truncated TIFF header inside the APP1 payload
        insert_app1(b"\xff\xd8\xff\xd9", b"Exif\x00\x00II\x00"),
        # wrong TIFF magic (43, not 42)
        insert_app1(
            b"\xff\xd8\xff\xd9", b"Exif\x00\x00II\x2b\x00\x08\x00\x00\x00"
        ),
        # IFD0 offset pointing past the buffer
        insert_app1(
            b"\xff\xd8\xff\xd9", b"Exif\x00\x00II\x2a\x00\xff\xff\xff\xff"
        ),
    ],
)
def test_malformed_raises(blob):
    with pytest.raises(ValueError):
        parse_exif(blob)


def test_apply_orientation_all_eight():
    from machine_readability_checker_spark.operators.multimodal import (
        DecodedImage,
        apply_orientation,
    )

    # h=2, w=3: [[1,2,3],[4,5,6]] — every expectation hand-derived
    img = DecodedImage("png", 3, 2, 1, bytes([1, 2, 3, 4, 5, 6]))
    expect = {
        1: (3, 2, [1, 2, 3, 4, 5, 6]),
        2: (3, 2, [3, 2, 1, 6, 5, 4]),       # mirror horizontal
        3: (3, 2, [6, 5, 4, 3, 2, 1]),       # rotate 180
        4: (3, 2, [4, 5, 6, 1, 2, 3]),       # mirror vertical
        5: (2, 3, [1, 4, 2, 5, 3, 6]),       # transpose
        6: (2, 3, [4, 1, 5, 2, 6, 3]),       # rotate 90 CW
        7: (2, 3, [6, 3, 5, 2, 4, 1]),       # transverse
        8: (2, 3, [3, 6, 2, 5, 1, 4]),       # rotate 90 CCW
    }
    for o, (w, h, px) in expect.items():
        got = apply_orientation(img, o)
        assert (got.width, got.height, list(got.pixels)) == (w, h, px), o
    with pytest.raises(ValueError):
        apply_orientation(img, 9)


def test_auto_orient_operator(spark):
    from machine_readability_checker_spark.operators.multimodal import (
        auto_orient_images,
        decode_image,
    )

    px = np.clip(
        (np.mgrid[0:8, 0:16][0] * 16 + np.mgrid[0:8, 0:16][1] * 4),
        0, 255,
    ).astype(np.uint8)  # h=8, w=16 asymmetric gradient
    base = encode_jpeg(16, 8, 1, px.tobytes(), quality=95)
    rows = [
        ("d0", "m", bytearray(insert_app1(
            base, build_exif_app1(orientation=6)))),  # rotate CW
        ("d1", "m", bytearray(base)),                 # no EXIF: passthrough
        ("d2", "m", bytearray(encode_png(3, 2, 1, bytes(6)))),  # non-JPEG
        ("d3", "m", bytearray(b"\xff\xd8\x00\x00")),  # malformed
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    out = {r["doc_id"]: r for r in auto_orient_images(df).collect()}
    assert (out["d0"]["width"], out["d0"]["height"]) == (8, 16)
    assert out["d0"]["orientation"] == 6
    got = decode_image(bytes(out["d0"]["content"]))
    assert (got.width, got.height) == (8, 16)
    want = np.rot90(px, k=-1)
    have = np.frombuffer(got.pixels, dtype=np.uint8).reshape(16, 8)
    # geometry exact, samples within JPEG round-trip tolerance
    assert np.abs(have.astype(int) - want.astype(int)).max() <= 8
    assert bytes(out["d1"]["content"]) == base  # byte-identical
    assert out["d1"]["orientation"] is None
    assert bytes(out["d2"]["content"]) == encode_png(3, 2, 1, bytes(6))
    assert out["d3"]["decode_error"] is not None


def test_scan_exif_operator(spark):
    base = _base_jpeg()
    rows = [
        ("d0", bytearray(insert_app1(
            base, build_exif_app1(make="A", orientation=3,
                                  gps=(10.0, -20.0))))),
        ("d1", bytearray(base)),  # no EXIF
        ("d2", bytearray(encode_png(2, 2, 1, bytes(4)))),  # non-JPEG
        ("d3", bytearray(b"\xff\xd8\x00\x00\x00\x00")),  # malformed
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    out = {r["doc_id"]: r for r in scan_exif(df).collect()}
    assert out["d0"]["has_exif"] and out["d0"]["orientation"] == 3
    assert out["d0"]["has_gps"]
    assert out["d0"]["gps_lat"] == pytest.approx(10.0, abs=1e-6)
    assert out["d0"]["gps_lon"] == pytest.approx(-20.0, abs=1e-6)
    assert not out["d1"]["has_exif"] and out["d1"]["parse_error"] is None
    assert not out["d2"]["has_exif"] and out["d2"]["parse_error"] is None
    assert out["d3"]["parse_error"] is not None


def test_strip_metadata_operator(spark):
    base = _base_jpeg()
    tagged = insert_app1(base, build_exif_app1(make="A", gps=(1.0, 2.0)))
    opaque = b"OPAQUE-CONTAINER-BYTES"
    rows = [
        ("d0", "m0", bytearray(tagged)),
        ("d1", "m1", bytearray(opaque)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    out = {r["doc_id"]: r for r in strip_metadata(df).collect()}
    assert bytes(out["d0"]["content"]) == strip_jpeg_metadata(tagged)
    assert out["d0"]["bytes_removed"] == len(tagged) - len(
        strip_jpeg_metadata(tagged)
    )
    assert out["d0"]["strip_error"] is None
    assert out["d0"]["media_ref"] == "m0"  # passthrough columns survive
    # unknown container: byte-identical passthrough, not quarantine
    assert bytes(out["d1"]["content"]) == opaque
    assert out["d1"]["bytes_removed"] == 0
    # scan of the scrubbed store is clean
    clean = scan_exif(strip_metadata(df)).collect()
    assert all(not r["has_exif"] for r in clean)
