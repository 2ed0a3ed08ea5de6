"""TIFF codec: round-trip matrix, javax.imageio cross-validation in
BOTH directions (lossless → byte-exact), multi-page chains, palette /
WhiteIsZero photometrics, multi-strip layout, quarantine paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from machine_readability_checker_spark.core.tiff import (
    _lzw_decode,
    _lzw_encode,
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
    encode_tiff_pages,
)


def _rgb(h, w, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_round_trip_matrix(ch, comp, bo):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (13, 21, ch), dtype=np.uint8)
    blob = encode_tiff(21, 13, ch, arr.tobytes(), comp, bo)
    assert decode_tiff(blob) == (21, 13, ch, arr.tobytes())


def test_lzw_predictor_round_trip():
    # smooth gradients are the predictor's target case
    arr = np.tile(
        np.arange(64, dtype=np.uint8).reshape(1, 64, 1), (32, 1, 3)
    )
    blob = encode_tiff(64, 32, 3, arr.tobytes(), "lzw", ">", predictor=True)
    assert decode_tiff(blob)[3] == arr.tobytes()
    # predictor actually engaged (tag present)
    assert b"\x01\x3d" in blob or b"\x3d\x01" in blob  # tag 317


def test_lzw_width_transitions_and_clear():
    rng = np.random.RandomState(0)
    # random data crosses 9->10->11->12-bit codes and the clear-on-full
    src = bytes(rng.randint(0, 256, 60000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(src), len(src)) == src
    comp = b"the quick brown fox " * 3000
    assert _lzw_decode(_lzw_encode(comp), len(comp)) == comp


def test_multi_page_chain():
    rng = np.random.RandomState(5)
    pages = [
        (8, 5, 3, rng.randint(0, 256, (5, 8, 3), dtype=np.uint8).tobytes()),
        (6, 4, 1, rng.randint(0, 256, (4, 6, 1), dtype=np.uint8).tobytes()),
        (3, 3, 3, rng.randint(0, 256, (3, 3, 3), dtype=np.uint8).tobytes()),
    ]
    blob = encode_tiff_pages(pages, compression="packbits")
    got = decode_tiff_pages(blob)
    assert [tuple(g) for g in got] == [tuple(p) for p in pages]
    # decode_tiff returns the first page only
    assert decode_tiff(blob) == pages[0]


def test_white_is_zero_inverts():
    """Photometric 0 (bilevel/gray scanners) inverts to BlackIsZero."""
    gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
    blob = bytearray(encode_tiff(6, 4, 1, gray.tobytes(), "none", "<"))
    # flip the PhotometricInterpretation value (tag 262, SHORT 1)
    i = blob.find(struct.pack("<HHIHH", 262, 3, 1, 1, 0))
    assert i > 0
    blob[i : i + 12] = struct.pack("<HHIHH", 262, 3, 1, 0, 0)
    _, _, _, px = decode_tiff(bytes(blob))
    assert px == bytes(255 - b for b in gray.tobytes())


def test_palette_color_expands():
    """Hand-built palette page: indices map through the 16-bit colormap
    (downscaled to 8-bit per the spec's value<<8 convention)."""
    w, h = 4, 2
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    n = 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8 + len(idx))
    strip_off = len(out)
    out += idx
    cmap_off = len(out) + 2 + 12 * 9 + 4  # 9 IFD entries incl. colormap
    reds = [0, 255, 17, 34]
    greens = [255, 0, 51, 68]
    blues = [9, 8, 7, 6]
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 3), (273, 4, 1, strip_off),
        (278, 4, 1, h), (279, 4, 1, len(idx)),
    ]
    ifd = struct.pack("<H", 8 + 1)
    for tag, typ, cnt, val in entries:
        if typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<HHII", 320, 3, 3 * n, cmap_off)
    ifd += struct.pack("<I", 0)
    out += ifd
    for plane in (reds, greens, blues):
        for v in plane:
            out += struct.pack("<H", v << 8)
    ww, hh, ch, px = decode_tiff(bytes(out))
    assert (ww, hh, ch) == (w, h, 3)
    want = b"".join(
        bytes([reds[i], greens[i], blues[i]]) for i in idx
    )
    assert px == want


def test_multi_strip_decode():
    """Real scanners write many strips; the encoder writes one, so a
    two-strip file is assembled by hand from two encoded halves."""
    top = _rgb(2, 5, 1)
    bot = _rgb(2, 5, 2)
    b1 = top.tobytes()
    b2 = bot.tobytes()
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    o1 = len(out)
    out += b1
    o2 = len(out)
    out += b2
    bps_off = len(out)
    out += struct.pack("<3H", 8, 8, 8)
    arr_off = len(out)
    out += struct.pack("<2I", o1, o2)          # strip offsets
    cnt_off = len(out)
    out += struct.pack("<2I", len(b1), len(b2))
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)
    entries = [
        struct.pack("<HHII", 256, 4, 1, 5),
        struct.pack("<HHII", 257, 4, 1, 4),
        struct.pack("<HHII", 258, 3, 3, bps_off),
        struct.pack("<HHIHH", 259, 3, 1, 1, 0),
        struct.pack("<HHIHH", 262, 3, 1, 2, 0),
        struct.pack("<HHII", 273, 4, 2, arr_off),
        struct.pack("<HHIHH", 277, 3, 1, 3, 0),
        struct.pack("<HHII", 278, 4, 1, 2),
        struct.pack("<HHII", 279, 4, 2, cnt_off),
    ]
    out += struct.pack("<H", len(entries)) + b"".join(entries)
    out += struct.pack("<I", 0)
    w, h, ch, px = decode_tiff(bytes(out))
    assert (w, h, ch) == (5, 4, 3)
    assert px == b1 + b2


def test_quarantine_paths():
    good = encode_tiff(4, 4, 3, _rgb(4, 4).tobytes())
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"notatiff")
    # truncated strip
    with pytest.raises(ValueError):
        decode_tiff(good[: len(good) - 40])
    # tiled image refused (tag 322 TileWidth)
    blob = bytearray(good)
    i = blob.find(struct.pack("<HHII", 278, 4, 1, 4))
    assert i > 0
    blob[i : i + 2] = struct.pack("<H", 322)
    with pytest.raises(ValueError, match="tiled"):
        decode_tiff(bytes(blob))
    # 16-bit samples refused: patch BitsPerSample external values
    blob = bytearray(good)
    j = blob.find(struct.pack("<3H", 8, 8, 8))
    assert j > 0
    blob[j : j + 6] = struct.pack("<3H", 16, 16, 16)
    with pytest.raises(ValueError, match="bits per sample"):
        decode_tiff(bytes(blob))
    # cyclic IFD chain refused
    blob = bytearray(good)
    ifd_off = struct.unpack_from("<I", blob, 4)[0]
    nent = struct.unpack_from("<H", blob, ifd_off)[0]
    struct.pack_into("<I", blob, ifd_off + 2 + 12 * nent, ifd_off)
    with pytest.raises(ValueError, match="cyclic"):
        decode_tiff_pages(bytes(blob))


def test_decode_image_and_video_frames_dispatch():
    from machine_readability_checker_spark.operators.multimodal import (
        decode_image,
        decode_video_frames,
        encode_image,
    )

    rgb = _rgb(9, 11)
    d = decode_image(encode_tiff(11, 9, 3, rgb.tobytes(), "lzw", ">"))
    assert (d.container, d.width, d.height, d.channels) == ("tiff", 11, 9, 3)
    assert d.pixels == rgb.tobytes()
    # resize keeps the container
    blob2 = encode_image(d)
    assert blob2[:4] in (b"II*\x00", b"MM\x00*")
    assert decode_image(blob2).pixels == rgb.tobytes()
    # multi-page scan → one BMP frame per page, gray expands to RGB
    g = np.random.RandomState(4).randint(0, 256, (5, 6), dtype=np.uint8)
    frames = decode_video_frames(
        encode_tiff_pages(
            [(6, 5, 1, g.tobytes()), (11, 9, 3, rgb.tobytes())], "packbits"
        )
    )
    assert len(frames) == 2
    f0 = decode_image(frames[0])
    assert (f0.width, f0.height, f0.channels) == (6, 5, 3)
    assert f0.pixels == bytes(b for v in g.tobytes() for b in (v, v, v))


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


def _imageio_encode_tiff(jvm, arr: np.ndarray, compression) -> bytes:
    h, w, _ = arr.shape
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    if compression is None:
        assert jvm.javax.imageio.ImageIO.write(img, "tiff", baos)
    else:
        wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "tiff"
        ).next()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        wr.setOutput(ios)
        par = wr.getDefaultWriteParam()
        par.setCompressionMode(2)  # MODE_EXPLICIT
        par.setCompressionType(compression)
        wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), par)
        ios.flush()
    return bytes(baos.toByteArray())


def test_tiff_cross_validates_against_javax_imageio(spark):
    """Lossless format: BYTE-EXACT both directions, every compression
    and byte order — incl. LZW streams large enough to cross the
    9→10-bit early-change transition."""
    jvm = spark._jvm
    rgb = _rgb(24, 30, 5)
    for comp in ("none", "packbits", "lzw"):
        for bo in ("<", ">"):
            blob = encode_tiff(30, 24, 3, rgb.tobytes(), comp, bo)
            assert np.array_equal(_imageio_decode(jvm, blob), rgb), (
                comp, bo,
            )
    for comp in (None, "PackBits", "LZW"):
        blob = _imageio_encode_tiff(jvm, rgb, comp)
        w, h, ch, px = decode_tiff(blob)
        got = np.frombuffer(px, np.uint8).reshape(h, w, ch)
        if ch == 1:
            got = np.repeat(got[:, :, None], 3, axis=2)
        assert np.array_equal(got, rgb), comp
