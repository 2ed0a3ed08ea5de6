"""Pure-stdlib GIF codec (GIF87a/89a): LZW decode, global/local color
tables, Adam-style row interlace, multi-frame awareness.

Same contract as the PNG/JPEG codecs behind
``operators.multimodal.decode_image``: 8-bit RGB out, precise
``ValueError`` on malformed bytes (the Arrow kernels convert that into
a quarantine row, never a task failure).  ``decode_gif`` decodes the
first frame onto the logical screen and cheaply walks the rest (so
frame_count is real and truncated files fail loudly);
``decode_gif_frames`` is the full animation path — every frame
LZW-decoded and composited with GIF89a disposal methods (none/keep,
restore-background, restore-previous), local color tables, and
per-frame transparency, with AVI-style frame sampling.

The encoder exists for deterministic fixtures and resize round-trips:
single-frame GIF89a, palette built from the image's unique colors
(>256 distinct colors is a fixture bug, not a production path).

Reference parity note: the reference flags embedded media as opaque
objects (L1-10 scan); codecs are this repo's training-pipeline
extension — no reference behavior to mirror beyond fail-soft.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

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


def _walk_frames(data: bytes):
    """Validated block walk: → (sw, sh, bg_idx, raw_frames) where each
    raw frame is (left, top, w, h, lct, interlaced, code_size, raster,
    transparent_idx, disposal) with the LZW raster still UNDECODED (so
    frame-count probes stay cheap).  Raises the same precise
    ``ValueError``s the decoder always has on malformed bytes."""
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

    raw_frames = []
    transparent_idx = -1
    disposal = 0
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
                disposal = (flags >> 2) & 0x07
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
        raw_frames.append(
            (
                left, top, w, h, lct, bool(ipacked & 0x40), code_size,
                raster, transparent_idx, disposal,
            )
        )
        # a GCE applies to exactly one following image (GIF89a spec)
        transparent_idx = -1
        disposal = 0

    if not raw_frames:
        raise ValueError("gif: no image data")
    return sw, sh, bg_idx, gct, raw_frames


def _frame_indices(raw) -> bytes:
    """LZW-decode one raw frame to row-major palette indices."""
    left, top, w, h, lct, interlaced, code_size, raster, _t, _d = raw
    idx = _lzw_decode(code_size, raster, w * h)
    if interlaced:
        rows = [idx[r * w:(r + 1) * w] for r in range(h)]
        src = iter(rows)
        ordered: List[bytes] = [b""] * h
        for start, step in _INTERLACE_PASSES:
            for r in range(start, h, step):
                ordered[r] = next(src)
        idx = b"".join(ordered)
    return idx


def _blit(canvas: bytearray, sw: int, sh: int, raw, idx: bytes) -> None:
    """Draw one frame rect onto the logical-screen canvas, honoring the
    frame's transparent index."""
    left, top, w, h, lct, _i, _c, _r, transparent_idx, _d = raw
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


def decode_gif(data: bytes) -> Tuple[int, int, int, bytes, Dict[str, int]]:
    """→ (width, height, 3, rgb_pixels_of_frame0, meta) with meta
    ``{"frame_count": n, "loop": bool}``.  Only frame 0's raster is
    LZW-decoded; the rest are walked (validating framing) — the cheap
    probe the media feature kernel wants."""
    sw, sh, bg_idx, _gct, raw_frames = _walk_frames(data)
    raw0 = raw_frames[0]
    lct0 = raw0[4]
    bg = lct0[bg_idx] if bg_idx < len(lct0) else b"\x00\x00\x00"
    canvas = bytearray(bg * (sw * sh))
    _blit(canvas, sw, sh, raw0, _frame_indices(raw0))
    return sw, sh, 3, bytes(canvas), {
        "frame_count": len(raw_frames), "loop": False,
    }


def decode_gif_frames(
    data: bytes, sample: Optional[List[int]] = None
) -> Tuple[int, int, List[bytes], List[Dict[str, int]]]:
    """Full animation decode with disposal-method compositing:
    → (width, height, [rgb canvas per frame], [per-frame meta]).

    Compositing follows the GIF89a spec + browser consensus: the canvas
    starts as the background color; each frame's rect is drawn over it
    (transparent pixels leave the canvas through); after emitting a
    frame, disposal 0/1 leaves the canvas, 2 restores the frame RECT to
    the background color, 3 restores the canvas as it was before the
    frame was drawn.  Every frame's raster is LZW-decoded and every
    canvas is composited IN SEQUENCE (disposal state is cumulative);
    ``sample`` — like the AVI lane's frame sampling — selects which
    composited canvases are RETURNED, not which are computed.

    Per-frame meta: left/top/width/height of the frame rect, disposal,
    and whether the frame carried a transparent index."""
    sw, sh, bg_idx, gct, raw_frames = _walk_frames(data)
    # background comes from the GLOBAL color table (the spec's rule);
    # fall back to frame 0's table only when no GCT exists
    tbl = gct if gct else raw_frames[0][4]
    bg = tbl[bg_idx] if bg_idx < len(tbl) else b"\x00\x00\x00"
    canvas = bytearray(bg * (sw * sh))
    want = set(range(len(raw_frames))) if sample is None else set(sample)
    out: List[bytes] = []
    metas: List[Dict[str, int]] = []
    for k, raw in enumerate(raw_frames):
        left, top, w, h, _lct, _i, _c, _r, tidx, disposal = raw
        if disposal == 3:
            saved = bytes(canvas)
        _blit(canvas, sw, sh, raw, _frame_indices(raw))
        if k in want:
            out.append(bytes(canvas))
            metas.append(
                {
                    "frame": k, "left": left, "top": top,
                    "width": w, "height": h, "disposal": disposal,
                    "has_transparency": int(tidx >= 0),
                }
            )
        if disposal == 2:  # restore rect to background color
            for r in range(h):
                if top + r >= sh:
                    break
                row_off = ((top + r) * sw + left) * 3
                for c in range(w):
                    if left + c >= sw:
                        break
                    canvas[row_off + c * 3:row_off + c * 3 + 3] = bg
        elif disposal == 3:  # restore to previous canvas
            canvas = bytearray(saved)
    return sw, sh, out, metas


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


def encode_gif_animation(
    sw: int,
    sh: int,
    frames: List[Dict],
    bg_rgb: bytes = b"\x00\x00\x00",
) -> bytes:
    """Multi-frame GIF89a 'fixture' encoder for the animation decoder's
    tests: each frame dict carries ``left, top, w, h, rgb`` (rect
    pixels), optional ``disposal`` (0-3), and optional ``transparent``
    (an RGB triple — rect pixels equal to it are encoded as the
    transparent palette index).  Every frame gets a LOCAL color table
    (exercising the per-frame palette path); the 2-entry global table
    holds only the background color."""
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 0x00, 0, 0)  # GCT: 2 entries
    out += bytes(bg_rgb) + b"\xff\xff\xff"
    for f in frames:
        left, top, w, h = f["left"], f["top"], f["w"], f["h"]
        rgb = f["rgb"]
        if len(rgb) != w * h * 3:
            raise ValueError("gif: frame pixel buffer size mismatch")
        transparent = f.get("transparent")
        color_to_idx: Dict[bytes, int] = {}
        if transparent is not None:
            color_to_idx[bytes(transparent)] = 0  # reserve index 0
        idx = bytearray()
        for i in range(0, len(rgb), 3):
            c = bytes(rgb[i:i + 3])
            ci = color_to_idx.get(c)
            if ci is None:
                ci = len(color_to_idx)
                if ci >= 256:
                    raise ValueError("gif: more than 256 distinct colors")
                color_to_idx[c] = ci
            idx.append(ci)
        # local table padded to a power-of-two size ≥ 2
        n = max(2, 1 << (max(1, len(color_to_idx) - 1)).bit_length())
        palette = list(color_to_idx) + [b"\x00\x00\x00"] * (
            n - len(color_to_idx)
        )
        size_bits = n.bit_length() - 2  # 2<<size_bits == n
        # graphic control extension: disposal + transparency
        disposal = int(f.get("disposal", 0)) & 0x07
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, 0, 0, 0)
        out += struct.pack(
            "<BHHHHB", 0x2C, left, top, w, h, 0x80 | size_bits
        )
        out += b"".join(palette)
        code_size = max(2, (n - 1).bit_length())
        out.append(code_size)
        stream = _lzw_encode(code_size, bytes(idx))
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
