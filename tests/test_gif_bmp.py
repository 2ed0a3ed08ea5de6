"""GIF + BMP codec tests: round-trips, interlace/multi-frame/top-down
shapes, malformed-byte quarantine, and — the load-bearing part —
byte-exact cross-validation in BOTH directions against the JVM's
``javax.imageio`` (an independent implementation, so encoder and
decoder errors cannot cancel).  Both formats are lossless, hence exact
equality, unlike the JPEG lane's ±1."""

from __future__ import annotations

import numpy as np
import pytest

from machine_readability_checker_spark.core.bmp import decode_bmp, encode_bmp
from machine_readability_checker_spark.core.gif import decode_gif, encode_gif


def _paletted_rgb(h, w, n_colors=20, seed=11):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.randint(0, n_colors, (h, w))]


def test_gif_roundtrip_rgb_and_gray():
    rgb = _paletted_rgb(24, 32)
    w, h, ch, px, meta = decode_gif(encode_gif(32, 24, 3, rgb.tobytes()))
    assert (w, h, ch) == (32, 24, 3)
    assert meta["frame_count"] == 1
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(24, 32, 3), rgb)

    gray = np.random.RandomState(3).randint(0, 256, (10, 17), dtype=np.uint8)
    w, h, ch, px, _ = decode_gif(encode_gif(17, 10, 1, gray.tobytes()))
    got = np.frombuffer(px, np.uint8).reshape(10, 17, 3)
    assert np.array_equal(got, np.stack([gray] * 3, axis=-1))


def test_gif_interlaced_decodes_identically():
    rgb = _paletted_rgb(21, 13, seed=5)  # odd height exercises pass bounds
    plain = decode_gif(encode_gif(13, 21, 3, rgb.tobytes()))
    inter = decode_gif(encode_gif(13, 21, 3, rgb.tobytes(), interlace=True))
    assert plain[3] == inter[3]


def test_gif_multiframe_counts_frames_decodes_frame0():
    rgb = _paletted_rgb(8, 8, seed=9)
    blob = encode_gif(8, 8, 3, rgb.tobytes(), extra_frames=3)
    w, h, ch, px, meta = decode_gif(blob)
    assert meta["frame_count"] == 4
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(8, 8, 3), rgb)


def test_gif_lzw_large_image_code_growth():
    """Enough distinct 8-bit patterns to push LZW past several width
    increases and a table reset."""
    rng = np.random.RandomState(17)
    gray = rng.randint(0, 256, (64, 211), dtype=np.uint8)
    w, h, ch, px, _ = decode_gif(encode_gif(211, 64, 1, gray.tobytes()))
    got = np.frombuffer(px, np.uint8).reshape(64, 211, 3)
    assert np.array_equal(got[:, :, 0], gray)


def test_gif_malformed_quarantine():
    rgb = _paletted_rgb(6, 6)
    good = encode_gif(6, 6, 3, rgb.tobytes())
    for bad in (
        b"",
        b"GIF89a",                      # truncated header
        good[:20],                      # truncated color table
        good[:-10],                     # truncated raster
        b"NOTGIF" + good[6:],           # bad signature
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError):
        # >256 distinct colors cannot be palettized
        grad = np.arange(18 * 18 * 3, dtype=np.uint8).reshape(18, 18, 3)
        grad = (grad * 7 + np.arange(3)).astype(np.uint8)
        many = np.random.RandomState(0).randint(
            0, 256, (32, 32, 3), dtype=np.uint8
        )
        encode_gif(32, 32, 3, many.tobytes())


def test_bmp_roundtrip_and_gray():
    img = np.random.RandomState(2).randint(0, 256, (9, 13, 3), dtype=np.uint8)
    w, h, ch, px = decode_bmp(encode_bmp(13, 9, 3, img.tobytes()))
    assert (w, h, ch) == (13, 9, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(9, 13, 3), img)

    gray = np.random.RandomState(4).randint(0, 256, (5, 7), dtype=np.uint8)
    w, h, ch, px = decode_bmp(encode_bmp(7, 5, 1, gray.tobytes()))
    got = np.frombuffer(px, np.uint8).reshape(5, 7, 3)
    assert np.array_equal(got, np.stack([gray] * 3, axis=-1))


def test_bmp_topdown_32bit_and_palette():
    import struct

    img = np.random.RandomState(6).randint(0, 256, (4, 5, 3), dtype=np.uint8)
    # hand-build a top-down 32-bit BI_RGB file
    body = bytearray()
    for y in range(4):
        for x in range(5):
            r, g, b = img[y, x]
            body += bytes((b, g, r, 0))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 5, -4, 1, 32, 0, len(body),
                       0, 0, 0, 0)
    w, h, ch, px = decode_bmp(hdr + bytes(body))
    assert (w, h) == (5, 4)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(4, 5, 3), img)

    # 8-bit palette file
    pal = np.random.RandomState(8).randint(0, 256, (16, 3), dtype=np.uint8)
    idx = np.random.RandomState(9).randint(0, 16, (6, 6), dtype=np.uint8)
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    stride = (6 + 3) & ~3
    body = b"".join(
        bytes(idx[y]) + b"\x00" * (stride - 6) for y in range(5, -1, -1)
    )
    off = 54 + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, 6, 6, 1, 8, 0, len(body),
                       0, 0, 16, 0)
    w, h, ch, px = decode_bmp(hdr + pal_bytes + body)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(6, 6, 3), pal[idx]
    )


def test_bmp_malformed_quarantine():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_bmp(3, 3, 3, img.tobytes())
    for bad in (b"", b"BMshort", good[:40], b"XX" + good[2:]):
        with pytest.raises(ValueError):
            decode_bmp(bad)
    # RLE8 compression refused, not misparsed
    import struct

    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))


# ------------------------------------------------- JVM cross-validation


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


def _imageio_encode(jvm, arr: np.ndarray, fmt: str) -> bytes:
    h, w, _ = arr.shape
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, fmt, baos)
    return bytes(baos.toByteArray())


def test_gif_cross_validates_against_javax_imageio(spark):
    jvm = spark._jvm
    rgb = _paletted_rgb(18, 25)
    # our encoder → independent decoder, exact
    assert np.array_equal(
        _imageio_decode(jvm, encode_gif(25, 18, 3, rgb.tobytes())), rgb
    )
    # independent encoder (its own palette/LZW choices) → our decoder,
    # exact vs ITS OWN reading (ImageIO may quantize on write)
    blob = _imageio_encode(jvm, rgb, "gif")
    ref = _imageio_decode(jvm, blob)
    w, h, ch, px, _ = decode_gif(blob)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), ref)


def test_bmp_cross_validates_against_javax_imageio(spark):
    jvm = spark._jvm
    img = np.random.RandomState(12).randint(
        0, 256, (18, 25, 3), dtype=np.uint8
    )
    assert np.array_equal(
        _imageio_decode(jvm, encode_bmp(25, 18, 3, img.tobytes())), img
    )
    blob = _imageio_encode(jvm, img, "bmp")
    w, h, ch, px = decode_bmp(blob)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(18, 25, 3), img
    )


def test_gif_bmp_flow_through_media_kernel(spark):
    """Both containers through the Arrow feature kernel: geometry and
    container surfaced, no quarantine."""
    import pandas as pd

    from machine_readability_checker_spark.operators.multimodal import (
        extract_media_features,
    )

    rgb = _paletted_rgb(16, 16, seed=21)
    rows = [
        ("d1", "g1.gif", encode_gif(16, 16, 3, rgb.tobytes())),
        ("d1", "b1.bmp", encode_bmp(16, 16, 3, rgb.tobytes())),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    out = {r["media_ref"]: r for r in extract_media_features(df).collect()}
    assert len(out) == 2
    for k in ("g1.gif", "b1.bmp"):
        r = out[k]
        assert r["decode_error"] is None, r["decode_error"]
        assert (r["width"], r["height"]) == (16, 16)
    del pd
