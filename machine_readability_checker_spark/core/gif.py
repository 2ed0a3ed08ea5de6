"""Pure-stdlib GIF codec (GIF87a/89a): LZW decode, global/local color
tables, Adam-style row interlace, multi-frame awareness.

Same contract as the PNG/JPEG codecs behind
``operators.multimodal.decode_image``: 8-bit RGB out, precise
``ValueError`` on malformed bytes (the Arrow kernels convert that into
a quarantine row, never a task failure).  The first frame is decoded
onto the logical screen; later frames are walked (so frame_count is
real and truncated files fail loudly) but not composited — feature
extraction only consumes frame 0 geometry + pixels, like the AVI lane
samples frames explicitly.

The encoder exists for deterministic fixtures and resize round-trips:
single-frame GIF89a, palette built from the image's unique colors
(>256 distinct colors is a fixture bug, not a production path).

Reference parity note: the reference flags embedded media as opaque
objects (L1-10 scan); codecs are this repo's training-pipeline
extension — no reference behavior to mirror beyond fail-soft.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

GIF_MAGICS = (b"GIF87a", b"GIF89a")

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(data: bytes, off: int, n: int) -> Tuple[List[bytes], int]:
    end = off + 3 * n
    if end > len(data):
        raise ValueError("gif: color table truncated")
    return [data[i:i + 3] for i in range(off, end, 3)], end


def _read_subblocks(data: bytes, off: int) -> Tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(data):
            raise ValueError("gif: sub-blocks truncated")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        if off + n > len(data):
            raise ValueError("gif: sub-block overruns file")
        chunks.append(data[off:off + n])
        off += n


def _lzw_decode(code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at code_size+1,
    CLEAR resets the table, codes grow to 12 bits."""
    if not (2 <= code_size <= 8):
        raise ValueError(f"gif: bad LZW min code size {code_size}")
    clear = 1 << code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader (LSB-first)
    acc = 0
    nbits = 0
    pos = 0

    def init_table() -> List[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = init_table()
    width = code_size + 1
    prev: bytes = b""
    while True:
        while nbits < width:
            if pos >= len(data):
                # stream may legally end right after the last code
                if prev and len(out) >= expected:
                    return bytes(out[:expected])
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = init_table()
            width = code_size + 1
            prev = b""
            continue
        if code == eoi:
            break
        if prev == b"":
            if code >= len(table):
                raise ValueError("gif: LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # some encoders omit EOI; stop once the raster is full
            break
    return bytes(out[:expected])


def decode_gif(data: bytes) -> Tuple[int, int, int, bytes, Dict[str, int]]:
    """→ (width, height, 3, rgb_pixels_of_frame0, meta) with meta
    ``{"frame_count": n, "loop": bool}``."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("gif: bad signature")
    if len(data) < 13:
        raise ValueError("gif: header truncated")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("gif: zero logical screen")
    off = 13
    gct: List[bytes] = []
    if packed & 0x80:
        gct, off = _read_color_table(data, off, 2 << (packed & 0x07))

    frame0: bytearray | None = None
    frames = 0
    transparent_idx = -1
    while True:
        if off >= len(data):
            raise ValueError("gif: missing trailer")
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if off >= len(data):
                raise ValueError("gif: extension truncated")
            label = data[off]
            off += 1
            if label == 0xF9 and off + 5 <= len(data) and data[off] == 4:
                flags = data[off + 1]
                if flags & 1:
                    transparent_idx = data[off + 4]
            _, off = _read_subblocks(data, off)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        if off + 9 > len(data):
            raise ValueError("gif: image descriptor truncated")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        lct = gct
        if ipacked & 0x80:
            lct, off = _read_color_table(data, off, 2 << (ipacked & 0x07))
        if not lct:
            raise ValueError("gif: no color table")
        if off >= len(data):
            raise ValueError("gif: LZW code size missing")
        code_size = data[off]
        off += 1
        raster, off = _read_subblocks(data, off)
        frames += 1
        if frames > 1:
            transparent_idx = -1
            continue  # walk (validates framing) but only decode frame 0

        idx = _lzw_decode(code_size, raster, w * h)
        if ipacked & 0x40:  # interlaced: reorder rows
            rows = [idx[r * w:(r + 1) * w] for r in range(h)]
            src = iter(rows)
            ordered: List[bytes] = [b""] * h
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    ordered[r] = next(src)
            idx = b"".join(ordered)

        # composite frame 0 onto the logical screen
        bg = lct[bg_idx] if bg_idx < len(lct) else b"\x00\x00\x00"
        canvas = bytearray(bg * (sw * sh))
        n_colors = len(lct)
        for r in range(h):
            if top + r >= sh:
                break
            row_off = ((top + r) * sw + left) * 3
            for c in range(w):
                if left + c >= sw:
                    break
                ci = idx[r * w + c]
                if ci == transparent_idx:
                    continue
                if ci >= n_colors:
                    raise ValueError("gif: pixel index outside color table")
                canvas[row_off + c * 3:row_off + c * 3 + 3] = lct[ci]
        frame0 = canvas
        transparent_idx = -1

    if frame0 is None:
        raise ValueError("gif: no image data")
    return sw, sh, 3, bytes(frame0), {"frame_count": frames, "loop": False}


# --------------------------------------------------------------- encoder


def _lzw_encode(code_size: int, indices: bytes) -> bytes:
    clear = 1 << code_size
    eoi = clear + 1
    table: Dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for b in indices:
        probe = prefix + bytes([b])
        if probe in table:
            prefix = probe
            continue
        emit(table[prefix])
        if next_code < 4096:
            table[probe] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    w: int,
    h: int,
    channels: int,
    pixels: bytes,
    interlace: bool = False,
    extra_frames: int = 0,
) -> bytes:
    """Single-frame GIF89a (plus ``extra_frames`` repeats of the same
    raster for multi-frame decode tests).  Gray input is expanded
    through a 256-gray palette; RGB input builds a palette from its
    distinct colors."""
    if channels == 1:
        if len(pixels) != w * h:
            raise ValueError("gif: pixel buffer size mismatch")
        palette = [bytes([g, g, g]) for g in range(256)]
        indices = pixels
    elif channels == 3:
        if len(pixels) != w * h * 3:
            raise ValueError("gif: pixel buffer size mismatch")
        color_to_idx: Dict[bytes, int] = {}
        idx = bytearray()
        for i in range(0, len(pixels), 3):
            c = pixels[i:i + 3]
            ci = color_to_idx.get(c)
            if ci is None:
                ci = len(color_to_idx)
                if ci >= 256:
                    raise ValueError("gif: more than 256 distinct colors")
                color_to_idx[c] = ci
            idx.append(ci)
        palette = list(color_to_idx)
        palette += [b"\x00\x00\x00"] * (256 - len(palette))
        indices = bytes(idx)
    else:
        raise ValueError("gif: gray or RGB only")

    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        indices = b"".join(indices[r * w:(r + 1) * w] for r in order)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += b"".join(palette)
    for _ in range(1 + max(0, extra_frames)):
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
        )
        code_size = 8
        out.append(code_size)
        stream = _lzw_encode(code_size, indices)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
