"""Baseline JPEG codec: round-trip quality, zigzag/marker structure, and
— the part that keeps it honest — cross-validation of BOTH directions
against the JVM's ``javax.imageio`` through the SparkSession's py4j
gateway, so a shared spec misunderstanding between our encoder and our
decoder cannot cancel out."""

from __future__ import annotations

import numpy as np
import pytest

from machine_readability_checker_spark.core.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _test_image(w: int = 48, h: int = 32) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [80 + c * 40 + 25 * np.sin(xx / 6) + 18 * np.cos(yy / 5) for c in range(3)],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_gray_and_rgb():
    h, w = 24, 40
    gray = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 200).astype(
        np.uint8
    )
    W, H, C, px = decode_jpeg(encode_jpeg(w, h, 1, gray.tobytes(), quality=90))
    assert (W, H, C) == (w, h, 1)
    out = np.frombuffer(px, np.uint8).reshape(h, w)
    assert int(np.max(np.abs(out.astype(int) - gray.astype(int)))) <= 3

    rgb = _test_image()
    for sub in (False, True):
        blob = encode_jpeg(
            48, 32, 3, rgb.tobytes(), quality=90, subsample_420=sub
        )
        W, H, C, px = decode_jpeg(blob)
        assert (W, H, C) == (48, 32, 3)
        out = np.frombuffer(px, np.uint8).reshape(32, 48, 3)
        diff = out.astype(int) - rgb.astype(int)
        assert float(np.sqrt(np.mean(diff**2))) < 3.0  # smooth image, q90


def test_jpeg_non_multiple_of_8_and_solid_block():
    # 10x6: MCU padding must crop back exactly
    img = np.full((6, 10, 3), 77, dtype=np.uint8)
    W, H, C, px = decode_jpeg(encode_jpeg(10, 6, 3, img.tobytes(), quality=75))
    assert (W, H, C) == (10, 6, 3)
    out = np.frombuffer(px, np.uint8).reshape(6, 10, 3)
    # a solid color is DC-only: recovered within DC quantization rounding
    assert int(np.max(np.abs(out.astype(int) - 77))) <= 2


def test_jpeg_quality_knob_and_errors():
    rgb = _test_image()
    small = encode_jpeg(48, 32, 3, rgb.tobytes(), quality=20)
    big = encode_jpeg(48, 32, 3, rgb.tobytes(), quality=95)
    assert len(small) < len(big)
    for bad in [b"", b"\xff\xd8\xff\xe0junk", b"PNG not jpeg"]:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # progressive SOF2 is refused, not misparsed
    blob = bytearray(encode_jpeg(48, 32, 3, rgb.tobytes()))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def _imageio_decode(jvm, blob: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
    img = jvm.javax.imageio.ImageIO.read(bais)
    assert img is not None, "javax.imageio could not parse our bytes"
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            out[y, x] = [(argb >> 16) & 255, (argb >> 8) & 255, argb & 255]
    return out


def test_jpeg_cross_validates_against_javax_imageio(spark):
    """Independent-oracle test: (1) our encoder's bytes must decode
    under javax.imageio to pixels matching our own decoder within ±1
    (both sub-samplings); (2) a javax.imageio-WRITTEN jpeg (its own
    tables, its own subsampling choice) must decode here to within ±1
    of ImageIO's own reading of it."""
    jvm = spark._jvm
    rgb = _test_image(32, 24)

    for sub in (False, True):
        blob = encode_jpeg(
            32, 24, 3, rgb.tobytes(), quality=90, subsample_420=sub
        )
        ref = _imageio_decode(jvm, blob)
        W, H, C, px = decode_jpeg(blob)
        ours = np.frombuffer(px, np.uint8).reshape(H, W, 3)
        assert int(np.max(np.abs(ref.astype(int) - ours.astype(int)))) <= 1
        assert int(np.max(np.abs(ref.astype(int) - rgb.astype(int)))) <= 4

    img = jvm.java.awt.image.BufferedImage(32, 24, 1)  # TYPE_INT_RGB
    for y in range(24):
        for x in range(32):
            r, g, b = (int(v) for v in rgb[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    blob2 = bytes(baos.toByteArray())
    ref2 = _imageio_decode(jvm, blob2)
    W, H, C, px = decode_jpeg(blob2)
    ours2 = np.frombuffer(px, np.uint8).reshape(H, W, 3)
    assert int(np.max(np.abs(ours2.astype(int) - ref2.astype(int)))) <= 1


def test_jpeg_flows_through_media_kernel(spark):
    from machine_readability_checker_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    rgb = _test_image(16, 16)
    rows = [
        (
            "d1",
            "img/a.jpg",
            "image",
            bytearray(encode_jpeg(16, 16, 3, rgb.tobytes())),
        ),
        ("d2", "img/bad.jpg", "image", bytearray(b"\xff\xd8\xffgarbage")),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in extract_media_features(df).collect()}
    a = out["img/a.jpg"]
    assert (a["width"], a["height"], a["channels"]) == (16, 16, 3)
    assert a["decode_error"] is None
    assert out["img/bad.jpg"]["decode_error"] is not None
