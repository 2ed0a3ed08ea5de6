"""Pure-stdlib TIFF codec (TIFF 6.0 baseline): the shapes a scanned-
document crawl actually meets — both byte orders, strip-organized
8-bit grayscale / RGB / palette-color pages, Compression 1 (none),
32773 (PackBits) and 5 (TIFF LZW with the early-change code-width rule
and horizontal Predictor 2), WhiteIsZero inversion, multi-page IFD
chains (scanned books ship one page per IFD).

Same contract as the other codecs behind
``operators.multimodal.decode_image``: 8-bit pixels out, precise
``ValueError`` on malformed or unsupported bytes (tiled images,
16-bit samples, planar config 2, JPEG-in-TIFF …) so the Arrow kernels
quarantine instead of crashing.  The encoder writes single-strip
baseline pages (none/PackBits/LZW, optional predictor, either byte
order, optional multi-page) for fixtures and resize round-trips.

Spec: the published TIFF 6.0 specification (Adobe, 1992) — IFD layout
§2, PackBits §9, LZW §13 (including the "early change" convention:
the code width bumps one code EARLIER than GIF's LZW, at 511/1023/
2047, which every real writer follows).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

# tags
_W, _H = 256, 257
_BPS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SPP = 277
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279
_PLANAR = 284
_PREDICTOR = 317
_COLORMAP = 320

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}


def _read_ifd(data: bytes, bo: str, off: int) -> Tuple[Dict[int, List[int]], int]:
    """One IFD at ``off`` → ({tag: [values]}, next_ifd_offset)."""
    if off + 2 > len(data):
        raise ValueError("tiff: IFD offset out of range")
    n = struct.unpack_from(bo + "H", data, off)[0]
    if off + 2 + 12 * n + 4 > len(data):
        raise ValueError("tiff: IFD truncated")
    tags: Dict[int, List[int]] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * count
        voff = e + 8 if total <= 4 else struct.unpack_from(bo + "I", data, e + 8)[0]
        if voff + total > len(data):
            raise ValueError(f"tiff: tag {tag} values out of range")
        if typ in (3, 8):
            vals = list(struct.unpack_from(f"{bo}{count}H", data, voff))
        elif typ in (4, 9):
            vals = list(struct.unpack_from(f"{bo}{count}I", data, voff))
        else:  # byte-ish
            vals = list(data[voff : voff + total])
        tags[tag] = vals
    nxt = struct.unpack_from(bo + "I", data, off + 2 + 12 * n)[0]
    return tags, nxt


# --------------------------------------------------------- decompressors


def _unpackbits(src: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:  # copy n+1 literal bytes
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i < len(src):
                out += bytes([src[i]]) * (257 - n)
                i += 1
        # n == 128: noop
    if len(out) < expect:
        raise ValueError("tiff: packbits strip short")
    return bytes(out[:expect])


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF LZW (§13): MSB-first bit packing, Clear=256, EOI=257,
    early-change code widths (9→10 at code 511, →11 at 1023, →12 at
    2047)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: List[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 clear
        table.append(b"")  # 257 eoi

    reset()
    width = 9
    acc = 0
    nbits = 0
    prev: bytes = b""
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = b""
                continue
            if code == EOI:
                if len(out) < expect:
                    raise ValueError("tiff: lzw strip short")
                return bytes(out[:expect])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev:
                entry = prev + prev[:1]
            else:
                raise ValueError("tiff: lzw bad code")
            out += entry
            if prev:
                table.append(prev + entry[:1])
            prev = entry
            # width transition: the reference decoders (OpenJDK
            # TIFFLZWDecompressor, libtiff) widen when the next free
            # code hits 511/1023/2047 — one entry EARLIER than GIF,
            # the TIFF "early change"
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    if len(out) < expect:
        raise ValueError("tiff: lzw strip short")
    return bytes(out[:expect])


def _lzw_encode(src: bytes) -> bytes:
    """Minimal spec-conforming TIFF LZW encoder (always emits Clear
    first, early-change widths, EOI last)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for b in src:
        c = w + bytes([b])
        if c in table:
            w = c
            continue
        emit(table[w], width)
        table[c] = nxt
        nxt += 1
        # width transition: the decoder's table runs one entry BEHIND
        # at the same stream position and widens at 511/1023/2047, so
        # the encoder widens when its own next free code hits 2^width
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: clear
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undo_predictor(row: bytearray, spp: int) -> None:
    for i in range(spp, len(row)):
        row[i] = (row[i] + row[i - spp]) & 0xFF


# ----------------------------------------------------------------- decode


def _decode_page(
    data: bytes, bo: str, tags: Dict[int, List[int]]
) -> Tuple[int, int, int, bytes]:
    def one(tag: int, default=None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    w = one(_W)
    h = one(_H)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("tiff: bad dimensions")
    spp = one(_SPP, 1)
    bps = tags.get(_BPS, [8])
    if any(b != 8 for b in bps):
        raise ValueError(f"tiff: unsupported bits per sample {bps}")
    comp = one(_COMPRESSION, 1)
    photo = one(_PHOTOMETRIC, 1)
    planar = one(_PLANAR, 1)
    predictor = one(_PREDICTOR, 1)
    if planar != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("tiff: tiled images unsupported")
    if comp not in (1, 5, 32773):
        raise ValueError(f"tiff: unsupported compression {comp}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"tiff: unsupported photometric {photo}")
    if photo == 2 and spp < 3:
        raise ValueError("tiff: RGB needs 3 samples")
    if photo == 3 and (_COLORMAP not in tags or spp != 1):
        raise ValueError("tiff: palette image needs a colormap")

    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: missing strip layout")
    rows_per_strip = one(_ROWS_PER_STRIP, h)
    row_bytes = w * spp

    raw = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("tiff: strip out of range")
        rows = min(rows_per_strip, remaining)
        expect = rows * row_bytes
        chunk = data[off : off + cnt]
        if comp == 1:
            if len(chunk) < expect:
                raise ValueError("tiff: strip short")
            strip = bytes(chunk[:expect])
        elif comp == 32773:
            strip = _unpackbits(chunk, expect)
        else:
            strip = _lzw_decode(chunk, expect)
        if predictor == 2:
            sb = bytearray(strip)
            for r in range(rows):
                rowv = sb[r * row_bytes : (r + 1) * row_bytes]
                _undo_predictor(rowv, spp)
                sb[r * row_bytes : (r + 1) * row_bytes] = rowv
            strip = bytes(sb)
        raw += strip
        remaining -= rows
    if remaining > 0:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")

    if photo == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        raw = bytearray(255 - b for b in raw)
    if photo == 3:
        cmap = tags[_COLORMAP]
        n = len(cmap) // 3
        # 16-bit colormap entries scale down to 8-bit
        lut = [
            bytes(((cmap[p * n + idx] >> 8) & 0xFF for p in range(3)))
            for idx in range(n)
        ]
        px = bytearray()
        for b in raw:
            if b >= n:
                raise ValueError("tiff: palette index out of range")
            px += lut[b]
        return w, h, 3, bytes(px)
    if spp == 1:
        return w, h, 1, bytes(raw)
    if spp >= 3:
        if spp == 3:
            return w, h, 3, bytes(raw)
        # extra samples (alpha …) drop, keeping RGB
        px = bytearray(w * h * 3)
        for i in range(w * h):
            px[3 * i : 3 * i + 3] = raw[spp * i : spp * i + 3]
        return w, h, 3, bytes(px)
    raise ValueError(f"tiff: unsupported samples per pixel {spp}")


def _byte_order(data: bytes) -> str:
    if len(data) < 8:
        raise ValueError("tiff: header truncated")
    if data[:4] == TIFF_MAGIC_LE:
        return "<"
    if data[:4] == TIFF_MAGIC_BE:
        return ">"
    raise ValueError("tiff: bad signature")


def decode_tiff(data: bytes) -> Tuple[int, int, int, bytes]:
    """First page → (width, height, channels, pixels)."""
    return decode_tiff_pages(data, limit=1)[0]


def decode_tiff_pages(
    data: bytes, limit: int = 64
) -> List[Tuple[int, int, int, bytes]]:
    """All pages of a (possibly multi-page) TIFF, in IFD-chain order.
    ``limit`` bounds hostile chains; cyclic chains raise."""
    bo = _byte_order(data)
    off = struct.unpack_from(bo + "I", data, 4)[0]
    pages = []
    seen = set()
    while off and len(pages) < limit:
        if off in seen:
            raise ValueError("tiff: cyclic IFD chain")
        seen.add(off)
        tags, off = _read_ifd(data, bo, off)
        pages.append(_decode_page(data, bo, tags))
    if not pages:
        raise ValueError("tiff: no pages")
    return pages


# ----------------------------------------------------------------- encode


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    compression: str = "none",
    byte_order: str = "<",
    predictor: bool = False,
) -> bytes:
    """Single-page baseline TIFF (single strip)."""
    return encode_tiff_pages(
        [(width, height, channels, pixels)],
        compression=compression,
        byte_order=byte_order,
        predictor=predictor,
    )


def encode_tiff_pages(
    pages: List[Tuple[int, int, int, bytes]],
    compression: str = "none",
    byte_order: str = "<",
    predictor: bool = False,
) -> bytes:
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression}")
    if predictor and comp_id != 5:
        raise ValueError("predictor is an LZW refinement")
    bo = byte_order
    out = bytearray()
    out += TIFF_MAGIC_LE if bo == "<" else TIFF_MAGIC_BE
    out += struct.pack(bo + "I", 0)  # first-IFD offset patched below

    ifd_offsets = []
    for width, height, channels, pixels in pages:
        if channels not in (1, 3):
            raise ValueError("encoder writes gray or RGB")
        if len(pixels) != width * height * channels:
            raise ValueError("pixel buffer size mismatch")
        body = bytes(pixels)
        if predictor:
            buf = bytearray(body)
            row_bytes = width * channels
            for r in range(height):
                row = buf[r * row_bytes : (r + 1) * row_bytes]
                for i in range(len(row) - 1, channels - 1, -1):
                    row[i] = (row[i] - row[i - channels]) & 0xFF
                buf[r * row_bytes : (r + 1) * row_bytes] = row
            body = bytes(buf)
        if comp_id == 32773:
            body = _packbits_encode(body)
        elif comp_id == 5:
            body = _lzw_encode(body)

        strip_off = len(out)
        out += body
        if len(out) % 2:
            out.append(0)  # IFDs are word-aligned

        entries = [
            (_W, 4, 1, width),
            (_H, 4, 1, height),
            (_BPS, 3, channels, None),   # needs external values if ch==3
            (_COMPRESSION, 3, 1, comp_id),
            (_PHOTOMETRIC, 3, 1, 1 if channels == 1 else 2),
            (_STRIP_OFFSETS, 4, 1, strip_off),
            (_SPP, 3, 1, channels),
            (_ROWS_PER_STRIP, 4, 1, height),
            (_STRIP_COUNTS, 4, 1, len(body)),
        ]
        if predictor:
            entries.append((_PREDICTOR, 3, 1, 2))
        entries.sort()

        # external value area: BitsPerSample for RGB (3 shorts > 4 bytes)
        bps_off = None
        if channels == 3:
            bps_off = len(out)
            out += struct.pack(bo + "3H", 8, 8, 8)
            if len(out) % 2:
                out.append(0)

        ifd_offsets.append(len(out))
        out += struct.pack(bo + "H", len(entries))
        for tag, typ, count, val in entries:
            if tag == _BPS:
                if channels == 1:
                    out += struct.pack(bo + "HHIHH", tag, typ, 1, 8, 0)
                else:
                    out += struct.pack(bo + "HHII", tag, typ, 3, bps_off)
                continue
            if typ == 3:
                out += struct.pack(bo + "HHIHH", tag, typ, count, val, 0)
            else:
                out += struct.pack(bo + "HHII", tag, typ, count, val)
        out += struct.pack(bo + "I", 0)  # next-IFD placeholder

    # patch the IFD chain
    struct.pack_into(bo + "I", out, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        # next-IFD field sits right before the following page's data;
        # find it from the entry count at the IFD offset
        o = ifd_offsets[i]
        n = struct.unpack_from(bo + "H", out, o)[0]
        struct.pack_into(bo + "I", out, o + 2 + 12 * n, ifd_offsets[i + 1])
    return bytes(out)


def _packbits_encode(src: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and src[j + 1] == src[i] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out.append(257 - (j - i + 1))
            out.append(src[i])
            i = j + 1
            continue
        # literal stretch until the next run of >=3
        j = i
        while j < n and j - i < 127:
            if j + 2 < n and src[j] == src[j + 1] == src[j + 2]:
                break
            j += 1
        out.append(j - i - 1 if j > i else 0)
        out += src[i : max(j, i + 1)]
        i = max(j, i + 1)
    return bytes(out)
