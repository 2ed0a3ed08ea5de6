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
from machine_readability_checker_spark.core.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)


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


# ------------------------------------------------------- animation decode


def test_gif_animation_disposal_compositing():
    """Constructive disposal-method matrix: keep (1), restore-background
    (2), restore-previous (3), local color tables, transparency."""
    red = b"\xff\x00\x00" * 16
    blue = b"\x00\x00\xff" * 4
    green = b"\x00\xff\x00"
    anim = encode_gif_animation(
        4,
        4,
        [
            dict(left=0, top=0, w=4, h=4, rgb=red, disposal=1),
            dict(left=1, top=1, w=2, h=2, rgb=blue, disposal=2),
            dict(left=0, top=0, w=1, h=1, rgb=green, disposal=0),
        ],
        bg_rgb=b"\x20\x20\x20",
    )
    sw, sh, frames, metas = decode_gif_frames(anim)
    assert (sw, sh, len(frames)) == (4, 4, 3)
    f0 = np.frombuffer(frames[0], np.uint8).reshape(4, 4, 3)
    f1 = np.frombuffer(frames[1], np.uint8).reshape(4, 4, 3)
    f2 = np.frombuffer(frames[2], np.uint8).reshape(4, 4, 3)
    assert (f0 == [255, 0, 0]).all()
    # frame 1 drew a blue rect over the kept red canvas
    assert (f1[1:3, 1:3] == [0, 0, 255]).all()
    assert (f1[0, 0] == [255, 0, 0]).all()
    # disposal 2 restored the RECT to the background color before frame 2
    assert (f2[1:3, 1:3] == [32, 32, 32]).all()
    assert (f2[0, 0] == [0, 255, 0]).all()
    assert (f2[3, 3] == [255, 0, 0]).all()
    assert [m["disposal"] for m in metas] == [1, 2, 0]


def test_gif_animation_restore_previous_and_transparency():
    t = b"\x01\x02\x03"
    anim = encode_gif_animation(
        3,
        3,
        [
            dict(left=0, top=0, w=3, h=3, rgb=b"\x10\x10\x10" * 9, disposal=1),
            dict(
                left=0, top=0, w=2, h=2,
                rgb=t + b"\xaa\xbb\xcc" + t + t,
                disposal=3, transparent=t,
            ),
            dict(left=2, top=2, w=1, h=1, rgb=b"\x00\xff\x00", disposal=0),
        ],
    )
    sw, sh, frames, metas = decode_gif_frames(anim)
    g1 = np.frombuffer(frames[1], np.uint8).reshape(3, 3, 3)
    g2 = np.frombuffer(frames[2], np.uint8).reshape(3, 3, 3)
    # transparent pixels let the prior canvas through
    assert (g1[0, 1] == [0xAA, 0xBB, 0xCC]).all()
    assert (g1[0, 0] == [16, 16, 16]).all()
    # disposal 3 rewound frame 1 entirely before frame 2 drew
    assert (g2[0, 1] == [16, 16, 16]).all()
    assert (g2[2, 2] == [0, 255, 0]).all()
    assert metas[1]["has_transparency"] == 1

    # sampling returns selected canvases but composites the full chain
    sw, sh, frames_s, metas_s = decode_gif_frames(anim, sample=[2])
    assert len(frames_s) == 1 and frames_s[0] == g2.tobytes()
    assert metas_s[0]["frame"] == 2


def test_gif_animation_frame0_matches_decode_gif():
    rgb = _paletted_rgb(9, 11, seed=31)
    blob = encode_gif(11, 9, 3, rgb.tobytes(), extra_frames=2)
    _, _, _, px, _ = decode_gif(blob)
    _, _, frames, _ = decode_gif_frames(blob)
    assert frames[0] == px and len(frames) == 3


def test_gif_animation_cross_validates_per_frame_against_imageio(spark):
    """Full-screen frames with disposal=keep: composited canvas k ==
    raw frame k, so every frame's LZW + palette decode cross-checks
    byte-exactly against javax.imageio's per-frame read."""
    jvm = spark._jvm
    rngs = [_paletted_rgb(10, 14, seed=s) for s in (41, 42, 43)]
    anim = encode_gif_animation(
        14,
        10,
        [
            dict(left=0, top=0, w=14, h=10, rgb=r.tobytes(), disposal=1)
            for r in rngs
        ],
    )
    bais = jvm.java.io.ByteArrayInputStream(bytearray(anim))
    stream = jvm.javax.imageio.ImageIO.createImageInputStream(bais)
    readers = jvm.javax.imageio.ImageIO.getImageReaders(stream)
    assert readers.hasNext()
    reader = readers.next()
    reader.setInput(stream)
    assert reader.getNumImages(True) == 3
    _, _, frames, _ = decode_gif_frames(anim)
    for k, want in enumerate(rngs):
        img = reader.read(k)
        got_ref = np.zeros((10, 14, 3), dtype=np.uint8)
        for y in range(10):
            for x in range(14):
                argb = img.getRGB(x, y)
                got_ref[y, x] = [
                    (argb >> 16) & 255, (argb >> 8) & 255, argb & 255,
                ]
        ours = np.frombuffer(frames[k], np.uint8).reshape(10, 14, 3)
        assert np.array_equal(got_ref, want), f"imageio disagrees at {k}"
        assert np.array_equal(ours, want), f"our decode differs at {k}"


def test_gif_animation_flows_through_frame_sampler(spark):
    from machine_readability_checker_spark.operators.multimodal import (
        decode_video_frames,
    )
    from machine_readability_checker_spark.core.bmp import decode_bmp

    rgb0 = _paletted_rgb(6, 6, seed=51)
    rgb1 = _paletted_rgb(6, 6, seed=52)
    anim = encode_gif_animation(
        6,
        6,
        [
            dict(left=0, top=0, w=6, h=6, rgb=rgb0.tobytes(), disposal=1),
            dict(left=0, top=0, w=6, h=6, rgb=rgb1.tobytes(), disposal=1),
        ],
    )
    frames = decode_video_frames(anim)
    assert len(frames) == 2
    for blob, want in zip(frames, (rgb0, rgb1)):
        w, h, ch, px = decode_bmp(blob)
        assert (w, h, ch) == (6, 6, 3)
        assert np.array_equal(
            np.frombuffer(px, np.uint8).reshape(6, 6, 3), want
        )
