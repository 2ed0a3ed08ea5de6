"""Pure-stdlib BMP codec (Windows DIB): the uncompressed shapes a
training-data crawl actually meets — BITMAPINFOHEADER (and the V4/V5
supersets) with 8-bit palette, 24-bit BGR and 32-bit BGRA pixels,
bottom-up or top-down row order, 4-byte row padding.

Same contract as the other codecs behind
``operators.multimodal.decode_image``: 8-bit RGB out, precise
``ValueError`` on malformed or unsupported bytes (RLE, 1/4/16-bit,
BI_BITFIELDS with non-standard masks) so the Arrow kernels quarantine
instead of crashing.  The encoder writes the plain 24-bit BI_RGB form
for fixtures and resize round-trips.
"""

from __future__ import annotations

import struct
from typing import Tuple

BMP_MAGIC = b"BM"


def decode_bmp(data: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, 3, rgb_pixels)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("bmp: bad signature")
    if len(data) < 54:
        raise ValueError("bmp: header truncated")
    _size, _r1, _r2, pix_off = struct.unpack_from("<IHHI", data, 2)
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    clr_used = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise ValueError(f"bmp: planes={planes}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("bmp: non-positive dimensions")
    if compression == 3 and bpp == 32:
        # BI_BITFIELDS: only the standard BGRA masks are accepted
        masks = struct.unpack_from("<III", data, 14 + 40)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError("bmp: non-standard bitfield masks")
    elif compression != 0:
        raise ValueError(f"bmp: unsupported compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"bmp: unsupported bit depth {bpp}")

    palette = []
    if bpp == 8:
        n = clr_used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n > len(data):
            raise ValueError("bmp: palette truncated")
        palette = [
            data[pal_off + 4 * i:pal_off + 4 * i + 3] for i in range(n)
        ]  # BGR(A) entries

    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    if pix_off + stride * h > len(data):
        raise ValueError("bmp: pixel array truncated")

    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        src = pix_off + src_row * stride
        dst = row * w * 3
        if bpp == 24:
            for c in range(w):
                b, g, r = data[src + c * 3:src + c * 3 + 3]
                out[dst + c * 3:dst + c * 3 + 3] = bytes((r, g, b))
        elif bpp == 32:
            for c in range(w):
                b, g, r = data[src + c * 4:src + c * 4 + 3]
                out[dst + c * 3:dst + c * 3 + 3] = bytes((r, g, b))
        else:  # 8-bit palette
            for c in range(w):
                ci = data[src + c]
                if ci >= len(palette):
                    raise ValueError("bmp: pixel index outside palette")
                b, g, r = palette[ci]
                out[dst + c * 3:dst + c * 3 + 3] = bytes((r, g, b))
    return w, h, 3, bytes(out)


def encode_bmp(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """24-bit bottom-up BI_RGB.  Gray input is expanded to RGB."""
    if channels == 1:
        if len(pixels) != w * h:
            raise ValueError("bmp: pixel buffer size mismatch")
        rgb = bytearray()
        for p in pixels:
            rgb += bytes((p, p, p))
        pixels = bytes(rgb)
    elif channels == 3:
        if len(pixels) != w * h * 3:
            raise ValueError("bmp: pixel buffer size mismatch")
    else:
        raise ValueError("bmp: gray or RGB only")

    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = bytearray()
    for row in range(h - 1, -1, -1):
        src = row * w * 3
        line = pixels[src:src + w * 3]
        # RGB → BGR
        bgr = bytearray(len(line))
        bgr[0::3] = line[2::3]
        bgr[1::3] = line[1::3]
        bgr[2::3] = line[0::3]
        body += bgr + pad
    pix_off = 14 + 40
    out = bytearray()
    out += BMP_MAGIC
    out += struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    out += body
    return bytes(out)
