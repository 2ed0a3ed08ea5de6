"""Golden-pixel tests for the pure-stdlib PNG codec (core/png.py) and
its wiring into the multimodal kernels (VERDICT r2 "Next round" #2 —
the decode path stops being a fake).

The filter tests do NOT round-trip through our own encoder (which only
emits filter 0): the test applies the PNG spec's forward filters with
its own independent implementation below, builds the chunk stream by
hand, and asserts the decoder inverts it back to the golden pixels."""

from __future__ import annotations

import struct
import zlib

import pytest

from machine_readability_checker_spark.core.png import (
    PNG_SIG,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _ihdr(w, h, depth=8, ctype=0, interlace=0) -> bytes:
    return _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )


def _png(w, h, raw, ctype=0, depth=8, plte=None, interlace=0) -> bytes:
    out = PNG_SIG + _ihdr(w, h, depth, ctype, interlace)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _forward_filter(pixels, w, h, ch, ftypes):
    """Independent spec-forward filter: returns the raw pre-zlib scanline
    stream for per-row filter types ``ftypes``."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    stride = w * ch
    raw = bytearray()
    for y in range(h):
        ft = ftypes[y]
        cur = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(ft)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                raw.append(cur[x])
            elif ft == 1:
                raw.append((cur[x] - a) & 0xFF)
            elif ft == 2:
                raw.append((cur[x] - b) & 0xFF)
            elif ft == 3:
                raw.append((cur[x] - (a + b) // 2) & 0xFF)
            elif ft == 4:
                raw.append((cur[x] - paeth(a, b, c)) & 0xFF)
    return bytes(raw)


def _golden_pixels(w, h, ch, seed=7):
    return bytes((seed + 31 * i + (i * i) % 97) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("ch,ctype", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_decode_all_filters_against_independent_forward(ch, ctype):
    """5 rows, one per filter type 0..4, every supported color type:
    decoder output must equal the golden pixels the test filtered."""
    w, h = 6, 5
    px = _golden_pixels(w, h, ch)
    raw = _forward_filter(px, w, h, ch, ftypes=[0, 1, 2, 3, 4])
    got = decode_png(_png(w, h, raw, ctype=ctype))
    assert got == (w, h, ch, px)


def test_palette_expansion():
    w, h = 4, 2
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    indices = bytes([0, 1, 2, 0, 2, 1, 0, 1])
    raw = b"".join(
        b"\x00" + indices[y * w : (y + 1) * w] for y in range(h)
    )
    got_w, got_h, ch, px = decode_png(_png(w, h, raw, ctype=3, plte=plte))
    assert (got_w, got_h, ch) == (w, h, 3)
    expect = b"".join(plte[i * 3 : i * 3 + 3] for i in indices)
    assert px == expect


def test_palette_index_out_of_range_rejected():
    plte = bytes([1, 2, 3])  # one entry
    raw = b"\x00" + bytes([0, 1])  # index 1 out of range
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_png(2, 1, raw, ctype=3, plte=plte))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_encode_decode_round_trip(ch):
    w, h = 9, 7
    px = _golden_pixels(w, h, ch, seed=ch)
    assert decode_png(encode_png(w, h, ch, px)) == (w, h, ch, px)


def test_bad_crc_rejected():
    blob = bytearray(encode_png(3, 3, 1, _golden_pixels(3, 3, 1)))
    blob[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(blob))


def test_corrupt_idat_rejected():
    w, h = 3, 2
    blob = (
        PNG_SIG
        + _ihdr(w, h)
        + _chunk(b"IDAT", b"this is not zlib")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(blob)


def test_truncated_rejected():
    blob = encode_png(4, 4, 3, _golden_pixels(4, 4, 3))
    with pytest.raises(ValueError, match="truncated|missing IEND"):
        decode_png(blob[: len(blob) // 2])


def test_unsupported_shapes_precise_errors():
    raw = b"\x00" + bytes(4)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_png(2, 1, raw, ctype=0, depth=16))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_png(2, 1, raw, ctype=0, interlace=1))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")


def test_idat_size_mismatch_rejected():
    # one scanline short
    raw = b"\x00" + bytes(6)
    with pytest.raises(ValueError, match="IDAT inflates"):
        decode_png(_png(6, 2, raw, ctype=0))


def test_multiple_idat_chunks_concatenate():
    w, h, ch = 5, 3, 3
    px = _golden_pixels(w, h, ch)
    raw = b"".join(
        b"\x00" + px[y * w * ch : (y + 1) * w * ch] for y in range(h)
    )
    z = zlib.compress(raw)
    blob = (
        PNG_SIG
        + _ihdr(w, h, ctype=2)
        + _chunk(b"IDAT", z[:7])
        + _chunk(b"IDAT", z[7:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(blob) == (w, h, ch, px)


# ----------------------------------------------------- Spark-side wiring


def test_media_features_on_real_png(spark):
    """The Arrow features kernel over REAL image bytes: golden width/
    height/channels/mean, quarantine row for junk unchanged."""
    from machine_readability_checker_spark.operators import multimodal as M

    w, h, ch = 8, 4, 3
    px = _golden_pixels(w, h, ch)
    rows = [
        ("d1", "img/real.png", "image", bytearray(encode_png(w, h, ch, px))),
        ("d2", "img/junk.png", "image", bytearray(b"not-an-image")),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in M.extract_media_features(df).collect()}
    ok = out["img/real.png"]
    assert (ok["width"], ok["height"], ok["channels"]) == (w, h, ch)
    assert ok["mean_byte"] == pytest.approx(sum(px) / len(px))
    assert ok["decode_error"] is None
    bad = out["img/junk.png"]
    assert bad["decode_error"] is not None and bad["width"] is None


def test_resize_real_png_golden_pixels(spark):
    """Resize over real PNG bytes: output is a valid PNG whose pixels
    are the exact nearest-neighbor picks of the source."""
    from machine_readability_checker_spark.operators import multimodal as M

    w, h, ch = 4, 4, 3
    px = _golden_pixels(w, h, ch)
    df = spark.createDataFrame(
        [("d1", "img/a.png", "image", bytearray(encode_png(w, h, ch, px)))],
        schema=M.MEDIA_SCHEMA,
    )
    out = M.resize_images(df, 2, 2).collect()[0]
    assert (out["width"], out["height"]) == (2, 2)
    got = decode_png(bytes(out["content"]))
    # NN picks source pixels (0,0),(2,0),(0,2),(2,2)
    pick = lambda x, y: px[(y * w + x) * ch : (y * w + x) * ch + ch]  # noqa: E731
    expect = pick(0, 0) + pick(2, 0) + pick(0, 2) + pick(2, 2)
    assert got == (2, 2, ch, expect)


def test_sample_frames_of_png_video(spark):
    """Video container whose frames are real PNGs: sampled frames decode
    to the exact per-frame golden pixels."""
    from machine_readability_checker_spark.operators import multimodal as M

    frames = [encode_png(2, 1, 1, bytes([i, 255 - i])) for i in range(5)]
    df = spark.createDataFrame(
        [("d1", "vid/a", "video", bytearray(M.encode_fake_video(frames)))],
        schema=M.MEDIA_SCHEMA,
    )
    got = {
        r["frame_idx"]: decode_png(bytes(r["content"]))
        for r in M.sample_frames(df, every_k=2).collect()
    }
    assert sorted(got) == [0, 2, 4]
    for i in (0, 2, 4):
        assert got[i] == (2, 1, 1, bytes([i, 255 - i]))
